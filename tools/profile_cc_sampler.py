#!/usr/bin/env python
"""Op-level profile of the CC PC-sampler hot loop (community_small_CC shapes).

Same method as tools/profile_sampler.py but for the 3-model CC loop
(ScoreNetworkX + ScoreNetworkA_CC + ScoreNetworkF, E=190, K=1140) —
BENCH_r02's cc leg at 7.5 ms/step.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, N = 128, 20
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(steps: int, carry_dtype=None, score_dtype=None):
    from ccsd_tpu.diffusion.losses import get_score_fn_cc
    from ccsd_tpu.diffusion.sde import VPSDE
    from ccsd_tpu.diffusion.solvers import get_pc_sampler
    from ccsd_tpu.models.registry import load_model, load_model_params, with_fused
    from ccsd_tpu.ops.cells import ComplexSpec
    from ccsd_tpu.utils.config import get_config

    cfg = get_config("community_small_CC", seed=0, folder=REPO)
    F = cfg.data.max_feat_num
    defs = with_fused(dict(
        zip(("x", "adj", "rank2"), load_model_params(cfg, is_cc=True))))
    models = {n: load_model(d) for n, d in defs.items()}
    key = jax.random.PRNGKey(0)
    params = {n: m.init(jax.random.fold_in(key, i))
              for i, (n, m) in enumerate(models.items())}
    spec = ComplexSpec(N=cfg.data.max_node_num, d_min=cfg.data.d_min,
                       d_max=cfg.data.d_max)
    E, K = spec.num_edges, spec.num_cells
    sdes = {n: VPSDE(N=steps, beta_min=0.1, beta_max=1.0)
            for n in ("x", "adj", "rank2")}
    sampler = get_pc_sampler(
        sdes["x"], sdes["adj"], (B, N, F), (B, N, N), predictor="Euler",
        corrector="Langevin", snr=cfg.sampler.snr,
        scale_eps=cfg.sampler.scale_eps, n_steps=1, denoise=True, eps=1e-4,
        is_cc=True, sde_rank2=sdes["rank2"], shape_rank2=(B, E, K), spec=spec,
        carry_dtype=carry_dtype,
    )
    sd = jnp.bfloat16 if score_dtype in ("bf16", "bfloat16") else None
    sfx = get_score_fn_cc(sdes["x"], models["x"], params["x"], compute_dtype=sd)
    sfa = get_score_fn_cc(sdes["adj"], models["adj"], params["adj"],
                          compute_dtype=sd)
    sfr = get_score_fn_cc(sdes["rank2"], models["rank2"], params["rank2"],
                          compute_dtype=sd)
    return jax.jit(lambda fl, k: sampler(sfx, sfa, sfr, fl, k))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--score-dtype", type=str, default=None)
    ap.add_argument("--rng", type=str, default="threefry2x32",
                    help="PRNG impl for the sampling key (threefry2x32/rbg)")
    ap.add_argument("--time-only", action="store_true",
                    help="just time steps/s (no xplane profile)")
    args = ap.parse_args()
    jitted = build(args.steps, score_dtype=args.score_dtype)
    mk_key = lambda s: jax.random.key(s, impl=args.rng)
    if args.time_only:
        import time as _t

        flags = jnp.ones((B, N))
        jitted(flags, mk_key(2)).adj.block_until_ready()
        best = float("inf")
        for i in range(3):
            t0 = _t.perf_counter()
            jitted(flags, mk_key(3 + i)).adj.block_until_ready()
            best = min(best, _t.perf_counter() - t0)
        print(f"steps/s: {args.steps/best:.2f}  us/step: "
              f"{best/args.steps*1e6:.0f}")
        return
    flags = jnp.ones((B, N))
    jitted(flags, jax.random.PRNGKey(2)).adj.block_until_ready()
    tmp = tempfile.mkdtemp(prefix="cc_prof_")
    with jax.profiler.trace(tmp):
        jitted(flags, jax.random.PRNGKey(3)).adj.block_until_ready()
    path = max(glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True),
               key=os.path.getmtime)
    pd = jax.profiler.ProfileData.from_file(path)
    per_op = collections.Counter()
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                nm = ev.name
                if nm.startswith(("jit_", "jit__")) or nm.startswith("%while"):
                    continue
                per_op[nm] += ev.duration_ns
                total += ev.duration_ns
    kind = collections.Counter()
    for nm, dur in per_op.items():
        m = re.match(r"%([a-zA-Z_\-]+)", nm)
        kind[m.group(1).rstrip("-0123456789") if m else nm.split("(")[0]] += dur
    steps = args.steps
    print(f"total leaf-op device time: {total/1e6:.3f} ms "
          f"({total/1e3/steps:.1f} us/step)")
    print("\n== by op family ==")
    for nm, dur in kind.most_common(20):
        print(f"{dur/1e3/steps:9.2f} us/step  {100*dur/total:5.1f}%  {nm}")
    print("\n== top ops ==")
    for nm, dur in per_op.most_common(30):
        print(f"{dur/1e3/steps:9.2f} us/step  {100*dur/total:5.1f}%  {nm[:120]}")


if __name__ == "__main__":
    main()
