"""Experiment driver + library API.

Parity targets: main.py:33-106 (train and/or sample flow) and
ccsd/diffusion.py:27-200 (the CCSD class API).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from ccsd_tpu.utils.config import AttrDict, get_config

_BANNER = r"""
  ___ ___ ___ ___     _____ ___ _   _
 / __/ __/ __|   \   |_   _| _ \ | | |
| (_| (__\__ \ |) |    | | |  _/ |_| |
 \___\___|___/___/     |_| |_|  \___/
 score-based diffusion for graphs & combinatorial complexes (TPU-native)
"""


def _initial_print(config) -> None:
    """Experiment banner.  Parity: ccsd/src/utils/print.py:13-72."""
    print(_BANNER)
    print(f"experiment : {config.experiment_type}")
    print(f"config     : {config.config_name}")
    print(f"dataset    : {config.data.data}")
    print(f"seed       : {config.seed}")


def run_experiment(
    experiment_type: str,
    config_name: str,
    folder: str = "./",
    comment: str = "",
    seed: int = 42,
    resume: Optional[str] = None,
) -> Dict[str, Any]:
    """Run a train or sample experiment from a YAML config."""
    config = get_config(config_name, seed, folder)
    config.experiment_type = experiment_type
    config.comment = comment
    try:
        from ccsd_tpu.utils.config import get_general_config

        config.general_config = get_general_config(folder)
    except FileNotFoundError:
        config.general_config = AttrDict({"use_wandb": False,
                                          "print_initial": False})
    if config.general_config.get("print_initial", False):
        _initial_print(config)
    results: Dict[str, Any] = {}

    if experiment_type == "train":
        from ccsd_tpu.training.trainer import get_trainer_from_config

        trainer = get_trainer_from_config(config)
        if resume:
            trainer.load_checkpoint(resume)
        if config.train.get("scan_epochs"):
            ckpt_name = trainer.train_scanned()
        else:
            ckpt_name = trainer.train()
        results["ckpt"] = ckpt_name
        results["trainer"] = trainer
        if "sample" in config:
            # chain into sampling with the fresh checkpoint (main.py:80-85)
            config.ckpt = ckpt_name + "_final"
            from ccsd_tpu.sampling.sampler import get_sampler_from_config

            sampler = get_sampler_from_config(config)
            results["samples"] = sampler.sample()
    elif experiment_type == "sample":
        from ccsd_tpu.sampling.sampler import get_sampler_from_config

        sampler = get_sampler_from_config(config)
        results["samples"] = sampler.sample()
    else:
        raise ValueError(f"Unknown experiment type {experiment_type}")
    return results


class CCSD:
    """Library API mirroring ccsd/diffusion.py:27-200."""

    def __init__(
        self,
        type: str,
        config: str,
        folder: str = "./",
        comment: str = "",
        seed: int = 42,
    ) -> None:
        self.type = type
        self.config_name = config
        self.folder = folder
        self.comment = comment
        self.seed = seed
        self.config: Optional[AttrDict] = None
        self.trainer = None
        self.sampler = None
        self._results: Optional[Dict[str, Any]] = None

    def run(self) -> "CCSD":
        self._results = run_experiment(
            self.type, self.config_name, self.folder, self.comment, self.seed
        )
        self.trainer = self._results.get("trainer")
        return self

    def is_trained(self) -> bool:
        return self._results is not None and "ckpt" in self._results

    def get_results(self) -> Optional[Dict[str, Any]]:
        return self._results

    def __repr__(self) -> str:
        return (
            f"CCSD(type={self.type}, config={self.config_name}, "
            f"seed={self.seed}, trained={self.is_trained()})"
        )
