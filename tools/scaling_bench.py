#!/usr/bin/env python
"""Multi-device scaling benchmark: sampler + train-step edges/s vs mesh size.

Measures data-parallel throughput of the scanned PC sampler and the joint
train step at n_devices in {1, 2, 4, ...}, reporting efficiency vs linear
scaling (the north-star metric "edges/s efficiency at N hosts").

On a real pod slice this measures ICI scaling.  Without TPUs, run it on the
virtual CPU mesh to validate the harness (throughput numbers then share one
host's cores and efficiency is NOT meaningful):

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py --devices 1 2 4 8 [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (virtual device mesh)")
    p.add_argument("--batch-per-device", type=int, default=64)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--n", type=int, default=20)
    p.add_argument("--feat", type=int, default=10)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ccsd_tpu.diffusion.losses import get_score_fn, get_sde_loss_fn
    from ccsd_tpu.diffusion.sde import VPSDE
    from ccsd_tpu.diffusion.solvers import get_pc_sampler
    from ccsd_tpu.models.registry import load_model

    N, F = args.n, args.feat
    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F, depth=3,
                         nhid=32, use_bn=False, is_cc=False))
    ma = load_model(dict(model_type="ScoreNetworkA", max_feat_num=F,
                         max_node_num=N, nhid=32, num_layers=5, num_linears=2,
                         c_init=2, c_hid=8, c_final=4, adim=32, num_heads=4,
                         conv="GCN", use_bn=False, is_cc=False))
    px = mx.init(jax.random.PRNGKey(0))
    pa = ma.init(jax.random.PRNGKey(1))

    results = []
    base = None
    for n_dev in args.devices:
        if n_dev > len(jax.devices()):
            print(f"[skip] {n_dev} devices requested, "
                  f"{len(jax.devices())} available", file=sys.stderr)
            continue
        B = args.batch_per_device * n_dev
        mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(n_dev), ("data",))
        sde = VPSDE(N=args.steps, beta_min=0.1, beta_max=1.0)
        samp = get_pc_sampler(sde, sde, (B, N, F), (B, N, N),
                              predictor="Euler", corrector="Langevin",
                              snr=0.05, scale_eps=0.7)
        sfx, sfa = get_score_fn(sde, mx, px), get_score_fn(sde, ma, pa)
        # the production sharded path (sampling/sampler.py sample.mesh)
        from ccsd_tpu.parallel.sampling import (
            jit_sharded_sampling,
            shard_sampling_flags,
        )

        jitted = jit_sharded_sampling(mesh, samp, [sfx, sfa], is_cc=False)
        flags = shard_sampling_flags(mesh, jnp.ones((B, N)))
        out = jitted(flags, jax.random.PRNGKey(2))
        out.adj.block_until_ready()
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            jitted(flags, jax.random.PRNGKey(3 + i)).adj.block_until_ready()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        edges_per_s = B * (N * (N - 1) // 2) * args.steps / t
        if base is None:
            base = edges_per_s / n_dev
        eff = edges_per_s / (base * n_dev)
        results.append(dict(devices=n_dev, global_batch=B, wall_s=round(t, 3),
                            edges_per_s=round(edges_per_s, 1),
                            efficiency=round(eff, 3)))
        print(json.dumps(results[-1]))
    print(json.dumps({"scaling": results,
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
