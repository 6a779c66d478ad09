#!/usr/bin/env python
"""Batch-amplitude scaling of the graph PC sampler on one chip.

The round-3 kernel probes (tools/pallas_scores_probe.py) close the per-op
story: at B=128, N=20 the scores block is VPU-ALU-bound (register-blocked
Pallas lands 1.26x over XLA, not the projected 4x), and the supertile MXU
formulation pays a P^2 FLOP-padding factor that single-digit-TFLOP/s small
dots never recover.  The remaining structural lever for THROUGHPUT (the
charter metric is sampler edges/s, BASELINE.json north_star) is batch
amplitude: B=128 fills 1 of 8+ lane-tiles and leaves every op at its
latency floor, so edges/s should scale well past B=128 until the VPU
saturates.

This probe times the FULL graph PC sampler (bench.py model shapes) across
B and reports us/step, steps/s, and M edges/s (community_small edge basis:
E = B * 190 wait — edges/s uses generated-graph edges; bench.py uses
B * N^2 / 2 adjacency entries?  We report B-relative throughput:
entries/s = B * N * N per model sweep, matching BENCH_r02's edges/s basis
of 26.0M at B=128 -> scale factor is steps/s * B).

Usage: python tools/batch_scaling_probe.py [--steps 100] [--fast]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N, F = 20, 10


def build(steps: int, B: int, fast: bool):
    from ccsd_tpu.diffusion.losses import get_score_fn
    from ccsd_tpu.diffusion.sde import VPSDE
    from ccsd_tpu.diffusion.solvers import get_pc_sampler
    from ccsd_tpu.models.registry import load_model

    extra = dict(scores_impl="mulreduce_h_bf16", final_impl="blocksum") if fast else {}
    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F, depth=3,
                         nhid=32, use_bn=False, is_cc=False))
    ma = load_model(dict(model_type="ScoreNetworkA", max_feat_num=F,
                         max_node_num=N, nhid=32, num_layers=5, num_linears=2,
                         c_init=2, c_hid=8, c_final=4, adim=32, num_heads=4,
                         conv="GCN", use_bn=False, is_cc=False, fused=True,
                         **extra))
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
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[128, 256, 512, 1024, 2048])
    args = ap.parse_args()

    base = None
    for B in args.batches:
        jitted = build(args.steps, B, args.fast)
        flags = jnp.ones((B, N))
        out = jitted(flags, jax.random.PRNGKey(2))
        out.adj.block_until_ready()
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            jitted(flags, jax.random.PRNGKey(3 + i)).adj.block_until_ready()
            ts.append(time.perf_counter() - t0)
        us = min(ts) / args.steps * 1e6
        sps = 1e6 / us
        # BENCH_r02 edges/s basis: 26.0 M at B=128, 1068 steps/s
        # -> edges-per-graph-step basis = 26.0e6 / (1068 * 128) = 190.2
        medges = sps * B * 190.2 / 1e6
        if base is None:
            base = medges
        print(f"B={B:5d}: {us:8.1f} us/step  {sps:7.1f} steps/s  "
              f"{medges:7.1f} M edges/s  ({medges / base:.2f}x vs B=128)",
              flush=True)


if __name__ == "__main__":
    main()
