"""Molecular sampling orchestration (QM9 / ZINC250k, graph and CC modes).

Parity target: ccsd/src/sampler.py:684-1477 (Sampler_mol_Graph /
Sampler_mol_CC): sample once with n_samples, bond-order quantize, valency
repair, molecule metrics (validity / uniqueness / novelty / FCD / NSPDK),
SMILES dump.  Requires RDKit (gated with a clear error otherwise).
"""

from __future__ import annotations

import math
import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ccsd_tpu.data.loader import load_data
from ccsd_tpu.data.mol_utils import (
    canonicalize_smiles,
    gen_mol,
    has_rdkit,
    load_smiles,
    mols_to_nx,
    mols_to_smiles,
)
from ccsd_tpu.diffusion.losses import get_score_fn, get_score_fn_cc
from ccsd_tpu.diffusion.sde import load_sde
from ccsd_tpu.models.registry import load_model, with_fused
from ccsd_tpu.ops.masks import quantize_mol
from ccsd_tpu.sampling.sampler import Sampler, load_sampling_fn
from ccsd_tpu.utils.logger import Logger


class MolSampler(Sampler):
    """Molecule sampler: graph or CC mode by config.is_cc."""

    def __init__(self, config, log: bool = True):
        if not has_rdkit():
            raise ImportError(
                "RDKit is required for molecular sampling "
                "(QM9/ZINC250k); install rdkit or use a generic-graph config."
            )
        super().__init__(config, log=log)

    def sample(self) -> Dict[str, Any]:
        cfg = self.config
        dataset = str(cfg.data.data)
        t_start = time.perf_counter()
        configt, defs, params = self._load_checkpoint()
        defs = with_fused(defs, bool(cfg.sample.get("fused", True)))
        models = {n: load_model(d) for n, d in defs.items()}

        train_smiles, test_smiles = load_smiles(
            dataset, folder=cfg.get("folder", "./")
        )
        train_smiles = canonicalize_smiles(train_smiles)
        test_smiles = canonicalize_smiles(test_smiles)

        n_samples = int(cfg.sample.n_samples)
        divide = int(cfg.sample.get("divide_batch") or 1)
        batch_size = max(1, n_samples // divide)
        sampling_fn = load_sampling_fn(
            configt, cfg.sampler, cfg.sample, self.is_cc, batch_size
        )
        sdes = {n: load_sde(configt.sde[n]) for n in params}
        if self.is_cc:
            score_fns = [
                get_score_fn_cc(sdes[n], models[n], params[n])
                for n in ("x", "adj", "rank2")
            ]
        else:
            score_fns = [
                get_score_fn(sdes[n], models[n], params[n]) for n in ("x", "adj")
            ]
        jitted = jax.jit(lambda fl, k: sampling_fn(*score_fns, fl, k))

        key = jax.random.PRNGKey(int(cfg.sample.get("seed", 42)))
        xs, adjs = [], []
        n_rounds = math.ceil(n_samples / batch_size)
        for _ in range(n_rounds):
            key, sub = jax.random.split(key)
            flags = np.ones((batch_size, configt.data.max_node_num), np.float32)
            out = jitted(jnp.asarray(flags), sub)
            xs.append(np.asarray(out.x))
            adjs.append(np.asarray(out.adj))
        x = np.concatenate(xs)[:n_samples]
        adj = np.concatenate(adjs)[:n_samples]

        # bond-order rounding -> one-hot channel remap (sampler.py:814-830)
        adj_int = quantize_mol(adj)  # (B, N, N) ints 0..3
        adj_oh = np.zeros((*adj_int.shape, 4), np.float32)
        for b in range(4):
            adj_oh[..., b] = adj_int == (b + 1)
        adj_oh[..., 3] = adj_int == 0  # virtual-bond channel
        adj_ch = np.moveaxis(adj_oh, -1, 1)  # (B, 4, N, N)

        # pad x with the virtual-atom class column (x was trained without it)
        empty = (np.abs(x).sum(-1, keepdims=True) < 1e-8).astype(np.float32)
        x_full = np.concatenate([x, empty], axis=-1)

        mols, num_no_correct = gen_mol(x_full, adj_ch, dataset)
        smiles = mols_to_smiles(mols)
        smiles = [s for s in smiles if s]
        sampling_time = time.perf_counter() - t_start

        from ccsd_tpu.eval.mol_metrics import get_all_metrics

        metrics = get_all_metrics(
            mols, n_samples, train_smiles, test_smiles, num_no_correct
        )

        # NSPDK MMD vs test graphs (sampler.py:858-863)
        if cfg.sample.get("nspdk", False):
            from ccsd_tpu.data.loader import load_dataset
            from ccsd_tpu.eval.mmd import compute_nspdk_mmd

            test_nx = load_dataset(
                os.path.join(cfg.get("folder", "./"), "data"),
                f"{dataset.lower()}_test_nx",
            )
            metrics["nspdk_mmd"] = compute_nspdk_mmd(
                test_nx, mols_to_nx(mols), metric="nspdk"
            )

        out_dir = os.path.join(cfg.get("folder", "./"), "samples", dataset)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "smiles.txt"), "w") as f:
            f.write("\n".join(smiles))

        for k, v in metrics.items():
            if v is not None:
                self.logger.log(f"{k:24s} : {v:.6f}")
        self.logger.log(f"Sampling time: {sampling_time:.1f}s "
                        f"({len(mols)}/{n_samples} valid)")
        return {"mols": mols, "smiles": smiles, "metrics": metrics,
                "sampling_time": sampling_time}
