"""Config-driven training for the two-stage open-universe factorization.

p(X, A, F) = p(X, A) · p(F | A): the (X, A) pair trains with the standard
graph DSM loss (the adjacency model is a GRAPH model, e.g. ScoreNetworkA —
unlike the joint CC trainer it never sees F), and the F model trains with
the dynamic-universe DSM loss over candidate cells enumerated from each
training complex's OWN adjacency (diffusion/two_stage.py) — the same bridge
used at sampling time.

Enable with ``train.two_stage: true`` on a CC config whose ``model.adj`` is
a graph model.  Checkpoints use the standard payload layout plus
``two_stage: True`` and the slot budget, so TwoStageSampler can reload
them.  No reference counterpart (SURVEY.md §2.6 "scale cliff").
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ccsd_tpu.data.loader import init_features, load_dataset, _split
from ccsd_tpu.diffusion.losses import (
    get_rank2_dynamic_loss_fn,
    get_sde_loss_fn,
)
from ccsd_tpu.diffusion.sde import load_sde
from ccsd_tpu.diffusion.two_stage import dynamic_batch_from_ccs
from ccsd_tpu.models.registry import load_model, load_model_params
from ccsd_tpu.ops.cells import get_spec
from ccsd_tpu.ops.masks import node_flags
from ccsd_tpu.training.checkpoint import ckpt_path, save_ckpt
from ccsd_tpu.training.ema import ema_copy_to, ema_init, ema_update
from ccsd_tpu.training.optim import make_optimizer
from ccsd_tpu.utils.logger import Logger, set_log


class TwoStageTrainer:
    """Trains (X, A) graph models + a dynamic-universe F model."""

    def __init__(self, config, log: bool = True):
        assert config.get("is_cc"), "two-stage training needs a CC config"
        assert "CC" not in str(config.model.adj), (
            "two-stage: model.adj must be a GRAPH model (e.g. ScoreNetworkA); "
            f"got {config.model.adj}"
        )
        self.config = config
        self.names = ["x", "adj", "rank2"]
        self.seed = int(config.get("seed", 42))
        self.log_folder_name, self.log_name, self.ckpt_name = (
            set_log(config) if log else ("", "train", "ckpt")
        )
        self.logger = Logger(verbose=log)

        dc = config.data
        self.spec = get_spec(dc.max_node_num, dc.d_min, dc.d_max)
        is_mol = str(dc.data) in ("QM9", "ZINC250k")
        mol_xs = None
        if is_mol:
            # molecule path: CCs via the ring-lifting mol loader, and x from
            # the dataset's atom-type one-hots (NOT degree init — the x model
            # must learn atom types; reference data_loader_mol.py:425-546)
            from ccsd_tpu.data.loader import load_data
            from ccsd_tpu.data.mol_loader import (
                _load_split_mols,
                _transform_graph,
            )

            self.train_ccs, self.test_ccs = load_data(
                config, get_list=True, is_cc=True
            )
            train_mols, _ = _load_split_mols(config)
            mol_xs = np.asarray([
                _transform_graph(x, a, str(dc.data))[0] for x, a in train_mols
            ])
        else:
            ccs = load_dataset(dc.dir, dc.data)
            tr, te = _split(len(ccs), dc.test_split)
            self.train_ccs, self.test_ccs = ccs[tr], ccs[te]

        lift = dc.get("lifting_procedure", "cycles")
        lift_kwargs = {}
        if lift == "path_based":
            lift_kwargs["path_length"] = dc.get("path_length", dc.d_max)
        self.k_max = config.train.get("k_max")
        adjs, rank2, dyn = dynamic_batch_from_ccs(
            self.train_ccs, self.spec, dc.d_min, dc.d_max, self.k_max,
            lift, **lift_kwargs,
        )
        self.train_batch = {
            "adj": jnp.asarray(adjs),
            "x": jnp.asarray(
                mol_xs if mol_xs is not None
                else init_features(dc.init, np.asarray(adjs), dc.max_feat_num)
            ),
            "rank2": rank2,
            "dyn": dyn,
        }
        self.k_max = dyn.k_max

        # models: x + adj are GRAPH models; rank2 is ScoreNetworkF
        params_defs = list(load_model_params(config, is_cc=True))
        self.models = {
            n: load_model(pd) for n, pd in zip(self.names, params_defs)
        }
        self.model_param_defs = dict(zip(self.names, params_defs))

        self.sdes = {n: load_sde(config.sde[n]) for n in self.names}
        tc = config.train
        self.loss_ga = get_sde_loss_fn(
            self.sdes["x"], self.sdes["adj"], self.models["x"],
            self.models["adj"], reduce_mean=tc.reduce_mean, eps=tc.eps,
        )
        self.loss_f = get_rank2_dynamic_loss_fn(
            self.sdes["rank2"], self.models["rank2"], self.spec,
            reduce_mean=tc.reduce_mean, eps=tc.eps,
        )

        self.optimizers = {
            n: make_optimizer(lr=tc.lr, weight_decay=tc.weight_decay,
                              grad_norm=tc.grad_norm,
                              lr_schedule=tc.get("lr_schedule", False),
                              lr_decay=tc.get("lr_decay", 0.999))
            for n in self.names
        }
        key = jax.random.PRNGKey(self.seed)
        keys = jax.random.split(key, 3)
        self.params = {
            n: self.models[n].init(k) for n, k in zip(self.names, keys)
        }
        self.opt_states = {
            n: self.optimizers[n].init(self.params[n]) for n in self.names
        }
        self.emas = {n: ema_init(self.params[n], tc.ema) for n in self.names}

        self._step = jax.jit(self._make_step())

    def _make_step(self):
        full = self.train_batch
        # train.minibatch: sample a random subset per step instead of the
        # full-batch gradient.  The round-4 QM9 protocol run showed 5000
        # FULL-batch epochs concentrate modes (unique@10k 0.58 vs the
        # minibatch-trained dense checkpoint's 0.98) — minibatch gradient
        # noise is the standard diversity remedy.
        mb = int(self.config.train.get("minibatch") or 0)
        n_total = int(full["adj"].shape[0])
        if mb >= n_total:
            mb = 0

        def step(params, opts, emas, key):
            if mb:
                kidx, key = jax.random.split(key)
                idx = jax.random.choice(kidx, n_total, (mb,), replace=False)
                batch = {k: full[k][idx] for k in ("x", "adj", "rank2")}
                member = full["dyn"].member[idx]
                valid = full["dyn"].valid[idx]
            else:
                batch = full
                member, valid = full["dyn"].member, full["dyn"].valid
            flags = node_flags(batch["adj"])
            k1, k2 = jax.random.split(key)

            def ga(p_x, p_adj):
                lx, la = self.loss_ga(p_x, p_adj, batch["x"], batch["adj"], k1)
                return lx.mean() + la.mean(), (lx.mean(), la.mean())

            (_, (lx, la)), g_ga = jax.value_and_grad(
                ga, argnums=(0, 1), has_aux=True
            )(params["x"], params["adj"])
            lf, g_f = jax.value_and_grad(self.loss_f)(
                params["rank2"], batch["rank2"], flags,
                member, valid, k2,
            )
            grads = {"x": g_ga[0], "adj": g_ga[1], "rank2": g_f}
            new_p, new_o, new_e = {}, {}, {}
            for n in self.names:
                u, new_o[n] = self.optimizers[n].update(
                    grads[n], opts[n], params[n]
                )
                new_p[n] = optax.apply_updates(params[n], u)
                new_e[n] = ema_update(emas[n], new_p[n])
            return new_p, new_o, new_e, (lx, la, lf)

        return step

    def train(self, ts: Optional[str] = None) -> str:
        tc = self.config.train
        key = jax.random.PRNGKey(self.seed)
        t0 = time.perf_counter()
        for epoch in range(tc.num_epochs):
            key, sub = jax.random.split(key)
            self.params, self.opt_states, self.emas, losses = self._step(
                self.params, self.opt_states, self.emas, sub
            )
            if epoch % tc.print_interval == tc.print_interval - 1 or epoch == 0:
                lx, la, lf = (float(v) for v in losses)
                self.logger.log(
                    f"[TWO-STAGE {epoch + 1:04d}] x {lx:.3e} | adj {la:.3e} "
                    f"| F {lf:.3e} | {time.perf_counter() - t0:.1f}s"
                )
        self.save_checkpoint(suffix="_final")
        return self.ckpt_name

    def save_checkpoint(self, suffix: str = "") -> str:
        cfg = self.config
        payload: Dict[str, Any] = {
            "model_config": cfg.to_dict() if hasattr(cfg, "to_dict")
            else dict(cfg),
            "two_stage": True,
            "k_max": self.k_max,
        }
        for n in self.names:
            payload[f"params_{n}"] = self.model_param_defs[n]
            payload[f"{n}_params"] = self.params[n]
            payload[f"{n}_opt_state"] = self.opt_states[n]
            payload[f"ema_{n}"] = self.emas[n]
        path = ckpt_path(
            cfg.get("folder", "./"), str(cfg.data.data),
            f"{self.ckpt_name}{suffix}",
        )
        save_ckpt(path, payload)
        return path

    def ema_params(self) -> Dict[str, Any]:
        return {n: ema_copy_to(self.emas[n]) for n in self.names}
