#!/usr/bin/env python
"""Measure fused-path lowering variants of the graph PC sampler on TPU.

The round-3 profile (tools/profile_sampler.py) showed the 908 us/step budget
is dominated by VPU broadcast-multiply-reduce fusions: scores ~313 us (34%),
aggregation ~168 us (18%), channel concat ~73 us (8%).  This probe times the
FULL sampler (bench.py protocol, 100 steps in one lax.scan) for each
combination of scores_impl / agg_impl / final_impl so the winner can become
the sampler default (VERDICT r2 item #1).

Usage: python tools/fastpath_probe.py [--steps 100]
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, N, F = 128, 20, 10


def build(steps: int, scores_impl: str, agg_impl: str, final_impl: str):
    from ccsd_tpu.diffusion.losses import get_score_fn
    from ccsd_tpu.diffusion.sde import VPSDE
    from ccsd_tpu.diffusion.solvers import get_pc_sampler
    from ccsd_tpu.models.registry import load_model

    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F, depth=3,
                         nhid=32, use_bn=False, is_cc=False))
    ma = load_model(dict(model_type="ScoreNetworkA", max_feat_num=F,
                         max_node_num=N, nhid=32, num_layers=5, num_linears=2,
                         c_init=2, c_hid=8, c_final=4, adim=32, num_heads=4,
                         conv="GCN", use_bn=False, is_cc=False, fused=True,
                         scores_impl=scores_impl, agg_impl=agg_impl,
                         final_impl=final_impl))
    px = mx.init(jax.random.PRNGKey(0))
    pa = ma.init(jax.random.PRNGKey(1))
    sde_x = VPSDE(N=steps, beta_min=0.1, beta_max=1.0)
    sde_adj = VPSDE(N=steps, beta_min=0.1, beta_max=1.0)
    sampler = get_pc_sampler(
        sde_x, sde_adj, (B, N, F), (B, N, N), predictor="Euler",
        corrector="Langevin", snr=0.05, scale_eps=0.7, n_steps=1,
        denoise=True, eps=1e-4,
    )
    sfx = get_score_fn(sde_x, mx, px)
    sfa = get_score_fn(sde_adj, ma, pa)
    return jax.jit(lambda fl, k: sampler(sfx, sfa, fl, k))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--rbg", action="store_true",
                    help="use the rbg PRNG for the whole sampler")
    args = ap.parse_args()
    if args.rbg:
        jax.config.update("jax_default_prng_impl", "rbg")
    flags = jnp.ones((B, N))

    combos = [
        ("mulreduce", "mulreduce", "concat"),   # round-2 baseline
        ("mulreduce_h_bf16", "mulreduce", "concat"),
        ("mulreduce_h_bf16", "mulreduce", "blocksum"),
    ]
    results = {}
    ref_out = None
    for s_impl, a_impl, f_impl in combos:
        jitted = build(args.steps, s_impl, a_impl, f_impl)
        out = jitted(flags, jax.random.PRNGKey(2))
        out.adj.block_until_ready()
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            jitted(flags, jax.random.PRNGKey(3 + i)).adj.block_until_ready()
            ts.append(time.perf_counter() - t0)
        us = min(ts) / args.steps * 1e6
        # numerical agreement on the same key (same RNG stream regardless of
        # lowering): compare final adj against the baseline combo
        out_cmp = jitted(flags, jax.random.PRNGKey(99)).adj
        if ref_out is None:
            ref_out = out_cmp
            err = 0.0
        else:
            err = float(jnp.abs(out_cmp - ref_out).max())
        results[(s_impl, a_impl, f_impl)] = (us, err)
        print(f"scores={s_impl:9s} agg={a_impl:9s} final={f_impl:8s}: "
              f"{us:7.1f} us/step  max|adj-ref|={err:.3e}", flush=True)

    best = min(results, key=lambda k: results[k][0])
    print(f"\nbest: {best} at {results[best][0]:.1f} us/step "
          f"(baseline {results[combos[0]][0]:.1f})")


if __name__ == "__main__":
    main()
