"""Training orchestration: jitted multi-model train/eval steps + epoch loop.

Parity target: ccsd/src/trainer.py:41-630 (Trainer_Graph / Trainer_CC),
re-designed for TPU:

  * one jitted `train_step` updates all 2-3 models at once (single compiled
    graph: forward + backward + clip + Adam + EMA, zero host round trips);
  * per-epoch EMA-swapped test evaluation is a second jitted function using
    the shadow params directly (no store/copy_to/restore dance);
  * batches are sharded over the mesh 'data' axis (NamedSharding); params
    are replicated; XLA inserts the gradient psums (replaces DataParallel);
  * checkpoints additionally carry optimizer state -> true resume (the
    reference cannot resume training, trainer.py:258-283).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ccsd_tpu.data.loader import load_data
from ccsd_tpu.diffusion.losses import get_sde_loss_fn, get_sde_loss_fn_cc
from ccsd_tpu.diffusion.sde import load_sde
from ccsd_tpu.models.registry import load_model, load_model_params
from ccsd_tpu.ops.cells import get_spec
from ccsd_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from ccsd_tpu.training.checkpoint import ckpt_path, save_ckpt
from ccsd_tpu.training.ema import ema_copy_to, ema_init, ema_update
from ccsd_tpu.training.optim import make_optimizer
from ccsd_tpu.utils.logger import (
    Logger,
    device_log,
    model_parameters_log,
    set_log,
    start_log,
    train_log,
)


@dataclass
class TrainState:
    params: Dict[str, Any]  # name -> param tree
    opt_states: Dict[str, Any]
    emas: Dict[str, Any]
    step: int = 0


class Trainer:
    """Joint score-model trainer (graph: x+adj, CC: x+adj+rank2)."""

    def __init__(self, config, mesh=None, log: bool = True):
        self.config = config
        self.is_cc = bool(config.get("is_cc", False))
        self.names = ["x", "adj", "rank2"] if self.is_cc else ["x", "adj"]
        self.seed = int(config.get("seed", 42))
        # train.mesh: {data: D[, edge: E][, cell: C]} builds a multi-axis
        # mesh; the CC batch's rank-2 tensor is then placed (data, edge,
        # cell)-sharded so the E x E Hodge ops and E x K incidence matmuls
        # partition over ICI (GSPMD inserts the collectives).  Default: all
        # devices on one 'data' axis.  No reference counterpart (the
        # reference is single-process torch, SURVEY.md §2.11).
        mesh_spec = config.get("train", {}).get("mesh") if mesh is None else None
        if mesh is not None:
            self.mesh = mesh
        elif mesh_spec:
            import numpy as _np

            axes = tuple(str(a) for a in mesh_spec.keys())
            shape = tuple(int(v) for v in mesh_spec.values())
            self.mesh = make_mesh(int(_np.prod(shape)), axes, shape)
        else:
            self.mesh = make_mesh()
        from jax.sharding import PartitionSpec as _P

        axn = self.mesh.axis_names
        self._batch_specs = None
        if self.is_cc and ("edge" in axn or "cell" in axn):
            self._batch_specs = [
                _P("data", None, None),
                _P("data", None, None),
                _P("data", "edge" if "edge" in axn else None,
                   "cell" if "cell" in axn else None),
            ]
        self.log_folder_name, self.log_name, self.ckpt_name = (
            set_log(config) if log else ("", "train", "ckpt")
        )
        self.logger = Logger(
            file_path=None if not log else self._log_path(), verbose=True
        )
        from ccsd_tpu.utils.tracking import Tracker

        self.tracker = Tracker(
            config.get("general_config"), run_name=f"{config.data.data}-train",
            config=config.to_dict() if hasattr(config, "to_dict") else None,
        )

        # data
        self.train_loader, self.test_loader = load_data(
            config, is_cc=self.is_cc, seed=self.seed
        )

        # models
        params_defs = list(load_model_params(config, is_cc=self.is_cc))
        if self.is_cc and config.data.get("cell_universe") == "observed":
            from ccsd_tpu.data.loader import resolve_cc_spec

            spec = resolve_cc_spec(config)
            for pd in params_defs:
                if pd["model_type"] in ("ScoreNetworkF", "ScoreNetworkA_CC",
                                        "ScoreNetworkA_Base_CC"):
                    pd["cells"] = spec.custom_cells
        self.models = {
            name: load_model(pd) for name, pd in zip(self.names, params_defs)
        }
        if config.train.get("remat"):
            # rematerialize forwards under grad: trades FLOPs for HBM, the
            # lever for large-E Hodge configs (e.g. grid_small_CC E=1176)
            from ccsd_tpu.models.registry import RematModel

            self.models = {n: RematModel(m) for n, m in self.models.items()}
        self.model_param_defs = dict(zip(self.names, params_defs))

        # sdes + loss
        self.sdes = {name: load_sde(config.sde[name]) for name in self.names}
        if self.is_cc:
            self.spec = self.models["rank2"].spec
            self.loss_fn = get_sde_loss_fn_cc(
                self.sdes["x"], self.sdes["adj"], self.sdes["rank2"],
                self.models["x"], self.models["adj"], self.models["rank2"],
                self.spec, reduce_mean=config.train.reduce_mean,
                eps=config.train.eps,
            )
        else:
            self.spec = None
            self.loss_fn = get_sde_loss_fn(
                self.sdes["x"], self.sdes["adj"],
                self.models["x"], self.models["adj"],
                reduce_mean=config.train.reduce_mean, eps=config.train.eps,
            )

        # optimizers (one per model, reference semantics)
        tc = config.train
        steps_per_epoch = max(1, len(self.train_loader))
        self.optimizers = {
            name: make_optimizer(
                lr=tc.lr, weight_decay=tc.weight_decay, grad_norm=tc.grad_norm,
                lr_schedule=tc.lr_schedule, lr_decay=tc.lr_decay,
                steps_per_epoch=steps_per_epoch,
            )
            for name in self.names
        }

        # init state
        key = jax.random.PRNGKey(self.seed)
        keys = jax.random.split(key, len(self.names))
        params = {
            name: self.models[name].init(k) for name, k in zip(self.names, keys)
        }
        params = {n: replicate_tree(self.mesh, p) for n, p in params.items()}
        opt_states = {
            name: self.optimizers[name].init(params[name]) for name in self.names
        }
        emas = {name: ema_init(params[name], tc.ema) for name in self.names}
        self.state = TrainState(params, opt_states, emas)

        self._train_step = jax.jit(self._make_train_step())
        self._eval_step = jax.jit(self._make_eval_step())

        if log:
            # run-forensics banners (parity: logger.py:115-269)
            start_log(self.logger, config)
            device_log(self.logger)
            train_log(self.logger, config)
            model_parameters_log(self.logger, params)

    # ------------------------------------------------------------------ jit --

    def _log_path(self) -> Optional[str]:
        import os

        cfg = self.config
        return os.path.join(
            cfg.get("folder", "./"), "logs_train", str(cfg.data.data),
            str(cfg.train.name), f"{self.log_name}.log",
        )

    def _split_losses(self, params, batch, key):
        if self.is_cc:
            return self.loss_fn(
                params["x"], params["adj"], params["rank2"], *batch, key
            )
        return self.loss_fn(params["x"], params["adj"], *batch, key)

    def _make_train_step(self):
        names = self.names

        def step(state_params, opt_states, emas, batch, key):
            def total(params):
                losses = self._split_losses(params, batch, key)
                return sum(losses), losses

            (_, losses), grads = jax.value_and_grad(total, has_aux=True)(
                state_params
            )
            new_params, new_opts, new_emas = {}, {}, {}
            for name in names:
                updates, new_opts[name] = self.optimizers[name].update(
                    grads[name], opt_states[name], state_params[name]
                )
                new_params[name] = optax.apply_updates(state_params[name], updates)
                new_emas[name] = ema_update(emas[name], new_params[name])
            return new_params, new_opts, new_emas, losses

        return step

    def _make_eval_step(self):
        def step(emas, batch, key):
            params = {n: ema_copy_to(emas[n]) for n in self.names}
            return self._split_losses(params, batch, key)

        return step

    # ----------------------------------------------------------------- loop --

    def train_scanned(self, epochs_per_call: int = 500) -> str:
        """On-device epoch scanning (see training/scan_train.py).

        Requires the dataset to fit in device memory; identical step math to
        :meth:`train` with jax-PRNG shuffling.  Orders of magnitude faster
        for small datasets over a remote TPU tunnel.
        """
        from ccsd_tpu.training.scan_train import build_epoch_scanner

        cfg = self.config
        tc = cfg.train
        train_arrays = tuple(jnp.asarray(a) for a in self.train_loader.arrays)
        test_arrays = tuple(jnp.asarray(a) for a in self.test_loader.arrays)
        # train.test_eval_max caps the per-epoch monitoring loss to the
        # first M test samples — at grid_small_CC shapes the full test
        # tensor alone is 1.7 GB of HBM (the scanned program round-4 OOMed
        # by 470 MB with it resident)
        te_max = int(tc.get("test_eval_max") or 0)
        if te_max:
            test_arrays = tuple(a[:te_max] for a in test_arrays)
        runner = build_epoch_scanner(
            self.names, self.loss_fn, self.optimizers, train_arrays,
            test_arrays, cfg.data.batch_size,
        )
        key = jax.random.PRNGKey(self.seed)
        history = {"train": [], "test": []}
        t_start = time.perf_counter()
        done = 0
        while done < tc.num_epochs:
            chunk = min(epochs_per_call, tc.num_epochs - done)
            key, sub = jax.random.split(key)
            (params, opts, emas, train_l, test_l) = runner(
                self.state.params, self.state.opt_states, self.state.emas,
                sub, chunk,
            )
            self.state.params, self.state.opt_states, self.state.emas = (
                params, opts, emas,
            )
            history["train"].extend(np.asarray(train_l))
            history["test"].extend(np.asarray(test_l))
            done += chunk
            parts = " | ".join(
                f"test {n}: {v:.3e}"
                for n, v in zip(self.names, np.asarray(test_l)[-1])
            )
            self.logger.log(
                f"[EPOCH {done:04d}] {parts} | "
                f"{time.perf_counter() - t_start:.2f}s cumulative"
            )
            if done % tc.save_interval == 0 or done >= tc.num_epochs:
                self.save_checkpoint(suffix="")
        self.state.step = done * max(
            1, train_arrays[0].shape[0] // min(cfg.data.batch_size,
                                               train_arrays[0].shape[0])
        )
        self.save_checkpoint(suffix="_final")
        self.history = history
        self.logger.log(
            f"Scanned training done in {time.perf_counter() - t_start:.1f}s "
            f"({done} epochs)"
        )
        return self.ckpt_name

    def train(self, ts: Optional[str] = None) -> str:
        cfg = self.config
        tc = cfg.train
        key = jax.random.PRNGKey(self.seed)
        history = {"train": [], "test": []}
        t_start = time.perf_counter()
        # optional device profiling (train.profile_dir): captures an xplane
        # trace of epoch 2 (epoch 1 includes compilation) for xprof /
        # tensorboard.  No reference counterpart (SURVEY.md §5.1).
        profile_dir = tc.get("profile_dir")

        for epoch in range(tc.num_epochs):
            if profile_dir and epoch == 1:
                jax.profiler.start_trace(str(profile_dir))
            train_losses = []
            t0 = time.perf_counter()
            for batch in self.train_loader:
                batch = shard_batch(self.mesh, *batch, specs=self._batch_specs)
                key, sub = jax.random.split(key)
                (self.state.params, self.state.opt_states, self.state.emas,
                 losses) = self._train_step(
                    self.state.params, self.state.opt_states, self.state.emas,
                    batch, sub,
                )
                self.state.step += 1
                train_losses.append(losses)

            test_losses = []
            for batch in self.test_loader:
                batch = shard_batch(self.mesh, *batch, specs=self._batch_specs)
                key, sub = jax.random.split(key)
                test_losses.append(self._eval_step(self.state.emas, batch, sub))

            if profile_dir and epoch == 1:
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
                self.logger.log(f"profiler trace written to {profile_dir}")

            mean_train = np.mean(np.asarray(train_losses), axis=0)
            mean_test = np.mean(np.asarray(test_losses), axis=0)
            history["train"].append(mean_train)
            history["test"].append(mean_test)
            if self.tracker.active:
                self.tracker.log(
                    {
                        **{f"train_{n}_loss": float(v)
                           for n, v in zip(self.names, mean_train)},
                        **{f"test_{n}_loss": float(v)
                           for n, v in zip(self.names, mean_test)},
                    },
                    step=epoch,
                )

            if epoch % tc.print_interval == tc.print_interval - 1 or epoch == 0:
                parts_tr = " | ".join(
                    f"train {n}: {v:.3e}" for n, v in zip(self.names, mean_train)
                )
                parts_te = " | ".join(
                    f"test {n}: {v:.3e}" for n, v in zip(self.names, mean_test)
                )
                dt = time.perf_counter() - t0
                self.logger.log(
                    f"[EPOCH {epoch + 1:04d}] {parts_te} | {parts_tr} | "
                    f"{dt:.2f}s"
                )

            if epoch % tc.save_interval == tc.save_interval - 1:
                self.save_checkpoint(suffix="")
        self.save_checkpoint(suffix="_final")
        self.logger.log(
            f"Training done in {time.perf_counter() - t_start:.1f}s "
            f"({self.state.step} steps)"
        )
        self.history = history
        if self.log_folder_name:
            try:
                from ccsd_tpu.utils.plot import plot_lc

                plot_lc(history, self.names, save_dir=self.log_folder_name)
            except Exception as e:  # plotting must never kill a train run
                self.logger.log(f"learning-curve plot failed: {e}")
        return self.ckpt_name

    # ------------------------------------------------------------ checkpoint --

    def load_checkpoint(self, name: str) -> None:
        """Resume training state (params + optimizer + EMA) from a checkpoint.

        Capability upgrade over the reference, which stores no optimizer
        state and cannot resume (trainer.py:258-283).  Reads either format
        (pickle or orbax), preferring whichever exists.
        """
        from ccsd_tpu.parallel.mesh import replicate_tree
        from ccsd_tpu.training.checkpoint import ckpt_path as _cp, load_ckpt_file

        folder = self.config.get("folder", "./")
        dataset = str(self.config.data.data)
        path = _cp(folder, dataset, name)
        if not os.path.exists(path):
            from ccsd_tpu.training.orbax_ckpt import orbax_dir, restore_orbax

            opath = orbax_dir(folder, dataset, name)
            if os.path.isdir(opath):
                target = {}
                for n in self.names:
                    target[f"{n}_params"] = self.state.params[n]
                    target[f"{n}_opt_state"] = self.state.opt_states[n]
                    target[f"ema_{n}"] = self.state.emas[n]
                ckpt = restore_orbax(opath, target=target)
                for n in self.names:
                    self.state.params[n] = replicate_tree(
                        self.mesh, ckpt[f"{n}_params"]
                    )
                    self.state.opt_states[n] = ckpt[f"{n}_opt_state"]
                    self.state.emas[n] = ckpt[f"ema_{n}"]
                self.logger.log(f"Resumed training state from {opath} (orbax)")
                return
        ckpt = load_ckpt_file(path)
        for n in self.names:
            self.state.params[n] = replicate_tree(self.mesh, ckpt[f"{n}_params"])
            self.state.opt_states[n] = jax.tree.map(
                jnp.asarray, ckpt[f"{n}_opt_state"]
            )
            self.state.emas[n] = jax.tree.map(jnp.asarray, ckpt[f"ema_{n}"])
        self.logger.log(f"Resumed training state from {path}")

    def save_checkpoint(self, suffix: str = "") -> str:
        if jax.process_count() > 1 and jax.process_index() != 0:
            return ""  # one writer per multi-host job
        cfg = self.config
        payload: Dict[str, Any] = {"model_config": cfg.to_dict()
                                   if hasattr(cfg, "to_dict") else dict(cfg)}
        for name in self.names:
            payload[f"params_{name}"] = self.model_param_defs[name]
            payload[f"{name}_params"] = self.state.params[name]
            payload[f"{name}_opt_state"] = self.state.opt_states[name]
            payload[f"ema_{name}"] = self.state.emas[name]
        if str(cfg.train.get("ckpt_format", "pickle")) == "orbax":
            from ccsd_tpu.training.orbax_ckpt import orbax_dir, save_orbax

            return save_orbax(
                orbax_dir(cfg.get("folder", "./"), str(cfg.data.data),
                          f"{self.ckpt_name}{suffix}"),
                payload,
            )
        path = ckpt_path(
            cfg.get("folder", "./"), str(cfg.data.data),
            f"{self.ckpt_name}{suffix}",
        )
        save_ckpt(path, payload)
        return path


def get_trainer_from_config(config, **kwargs):
    """Factory.  Parity: trainer.py:615-630 (one class handles both modes);
    train.two_stage selects the open-universe TwoStageTrainer (new design)."""
    if config.train.get("two_stage"):
        from ccsd_tpu.training.two_stage_trainer import TwoStageTrainer

        return TwoStageTrainer(config, **kwargs)
    return Trainer(config, **kwargs)
