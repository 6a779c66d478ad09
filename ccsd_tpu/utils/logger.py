"""File + stdout logger and experiment directory layout.

Parity target: ccsd/src/utils/logger.py:18-281 (append-to-file logger with
the logs_train|logs_sample/<dataset>/<name>/ layout and checkpoints/<data>).
"""

from __future__ import annotations

import os
import time
from typing import Optional


class Logger:
    def __init__(self, file_path: Optional[str] = None, verbose: bool = True):
        self.file_path = file_path
        self.verbose = verbose
        if file_path:
            os.makedirs(os.path.dirname(file_path), exist_ok=True)

    def log(self, msg: str, verbose: Optional[bool] = None) -> None:
        if self.file_path:
            with open(self.file_path, "a") as f:
                f.write(msg + "\n")
        if self.verbose if verbose is None else verbose:
            print(msg)


def run_id(timezone: Optional[str] = None) -> str:
    """Timestamp run identifier.  Parity: time_utils.py:12-24."""
    return time.strftime("%b%d-%H-%M-%S")


def set_log(config, is_train: bool = True):
    """Create log/checkpoint dirs, return (folder_name, log_name, ckpt_name).

    Parity: logger.py:68-98.
    """
    data = str(config.data.data)
    exp_name = str(config.train.name)
    ts = run_id()
    config_name = str(config.get("config_name", "config"))
    log_name = f"{config_name}_{ts}"
    root = config.get("folder", "./")
    kind = "logs_train" if is_train else "logs_sample"
    folder = os.path.join(root, kind, data, exp_name)
    os.makedirs(folder, exist_ok=True)
    os.makedirs(os.path.join(root, "checkpoints", data), exist_ok=True)
    return folder, log_name, f"{exp_name}_{ts}"


RULE = "-" * 100


def start_log(logger: Logger, config) -> None:
    """Dataset banner.  Parity: logger.py:115-124, 197-207 (data_log)."""
    logger.log(RULE)
    d = config.data
    logger.log(
        f"[{d.data}]   init={d.init} ({d.max_feat_num})   "
        f"seed={config.get('seed', '?')}   batch_size={d.batch_size}"
    )
    logger.log(RULE)


def sde_log(logger: Logger, config_sde, is_cc: bool = False) -> None:
    """SDE banner.  Parity: logger.py:127-144."""
    parts = []
    names = ("x", "adj", "rank2") if is_cc else ("x", "adj")
    for n in names:
        s = config_sde[n]
        parts.append(
            f"({n}:{s.type})=({s.beta_min:.2f}, {s.beta_max:.2f}) "
            f"N={s.num_scales}"
        )
    logger.log(" ".join(parts))


def model_log(logger: Logger, config, is_cc: bool = False) -> None:
    """Model-architecture banner.  Parity: logger.py:147-169."""
    m = config.model
    head = f"({m.x})+({m.adj}={m.conv},{m.num_heads})"
    if is_cc:
        hm = "hodge mask" if m.get("use_hodge_mask") else "no hodge mask"
        head += f"+({m.rank2}={hm}, {m.num_layers_mlp} {m.cnum})"
    logger.log(
        f"{head}   : depth={m.depth} adim={m.adim} nhid={m.nhid} "
        f"layers={m.num_layers} linears={m.num_linears} "
        f"c=({m.c_init} {m.c_hid} {m.c_final})"
    )


def device_log(logger: Logger) -> None:
    """Device banner (JAX devices replace the CUDA list, logger.py:172-194)."""
    import jax

    devices = jax.devices()
    msg = f"Using devices: {[str(d) for d in devices]}"
    if jax.process_count() > 1:
        msg += (
            f" (process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local)"
        )
    logger.log(msg)


def train_log(logger: Logger, config) -> None:
    """Training-hyperparameter banner.  Parity: logger.py:210-223."""
    t = config.train
    logger.log(
        f"lr={t.lr} schedule={t.lr_schedule} ema={t.ema} "
        f"epochs={t.num_epochs} reduce={t.reduce_mean} eps={t.eps}"
    )
    is_cc = bool(config.get("is_cc", False))
    model_log(logger, config, is_cc)
    sde_log(logger, config.sde, is_cc)
    logger.log(RULE)


def sample_log(logger: Logger, config) -> None:
    """Sampler-settings banner.  Parity: logger.py:226-246."""
    s, sp = config.sampler, config.sample
    msg = (
        f"({s.predictor})+({s.corrector}): eps={sp.eps} "
        f"denoise={sp.noise_removal} ema={sp.use_ema} "
    )
    if s.corrector == "Langevin":
        msg += f"|| snr={s.snr} seps={s.scale_eps} n_steps={s.n_steps} "
    logger.log(msg)
    logger.log(RULE)


def model_parameters_log(logger: Logger, named_params: dict) -> None:
    """Per-model + total parameter counts.  Parity: logger.py:249-269."""
    from ccsd_tpu.utils.models_utils import count_params

    counts = {n: count_params(p) for n, p in named_params.items()}
    logger.log(RULE)
    logger.log("Number of parameters:")
    for n, c in counts.items():
        logger.log(f"\t{n}: {c}")
    logger.log(f"Total: {sum(counts.values())}")
    logger.log(RULE)


def time_log(logger: Logger, time_type: str, elapsed_time: float) -> None:
    """Elapsed-time line.  Parity: logger.py:272-281."""
    if time_type not in ("train", "sample"):
        raise ValueError(
            f"time_type must be in ['train', 'sample'], not {time_type}"
        )
    logger.log(
        f"{'Training' if time_type == 'train' else 'Sampling'} time: "
        f"{round(elapsed_time, 3)} seconds"
    )


def check_log(config, is_train: bool = True) -> bool:
    data = str(config.data.data)
    exp_name = str(config.train.name)
    kind = "logs_train" if is_train else "logs_sample"
    return os.path.isdir(
        os.path.join(config.get("folder", "./"), kind, data, exp_name)
    )
