#!/usr/bin/env python
"""Op-level profile of the graph PC-sampler hot loop on TPU.

Runs the bench.py graph protocol (B=128, N=20, fused ScoreNetworkX +
ScoreNetworkA) for a short scan under jax.profiler, parses the xplane with
jax.profiler.ProfileData, and prints the op-duration breakdown.  This is the
ground truth the supertile redesign (VERDICT r2 #1) is built against —
the round-2 probes measured isolated ops whose in-model layouts differ.

Usage: python tools/profile_sampler.py [--steps 100] [--variant fused|unfused]
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

B, N, F, STEPS_DEFAULT = 128, 20, 10, 100


def build_sampler(steps: int, fused: bool, scores_impl="mulreduce",
                  agg_impl="mulreduce", final_impl="concat"):
    from ccsd_tpu.diffusion.losses import get_score_fn
    from ccsd_tpu.diffusion.sde import VPSDE
    from ccsd_tpu.diffusion.solvers import get_pc_sampler
    from ccsd_tpu.models.registry import load_model

    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F, depth=3,
                         nhid=32, use_bn=False, is_cc=False))
    ma = load_model(dict(model_type="ScoreNetworkA", max_feat_num=F,
                         max_node_num=N, nhid=32, num_layers=5, num_linears=2,
                         c_init=2, c_hid=8, c_final=4, adim=32, num_heads=4,
                         conv="GCN", use_bn=False, is_cc=False, fused=fused,
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


def profile(jitted, steps: int, outdir: str | None):
    flags = jnp.ones((B, N))
    jitted(flags, jax.random.PRNGKey(2)).adj.block_until_ready()  # compile
    tmp = outdir or tempfile.mkdtemp(prefix="sampler_prof_")
    with jax.profiler.trace(tmp):
        jitted(flags, jax.random.PRNGKey(3)).adj.block_until_ready()
    paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no xplane under {tmp}")
    return max(paths, key=os.path.getmtime), tmp


def summarize(xplane_path: str, steps: int, top: int = 40):
    pd = jax.profiler.ProfileData.from_file(xplane_path)
    per_op = collections.Counter()
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                # skip wrappers (jit program + while loop) that double-count
                if name.startswith(("jit_", "jit__")) or name.startswith("%while"):
                    continue
                per_op[name] += ev.duration_ns
                total += ev.duration_ns
    # aggregate by op kind: '%opname.123 = TYPE dims OP(...)' -> OP family
    kind = collections.Counter()
    for name, dur in per_op.items():
        m = re.match(r"%([a-zA-Z_\-]+)", name)
        kind[m.group(1).rstrip("-0123456789") if m else name.split("(")[0]] += dur
    print(f"total leaf-op device time: {total/1e6:.3f} ms over {steps} steps "
          f"({total/1e3/steps:.1f} us/step)")
    print("\n== by op family ==")
    for name, dur in kind.most_common(25):
        print(f"{dur/1e3/steps:9.2f} us/step  {100*dur/total:5.1f}%  {name}")
    print("\n== top ops ==")
    for name, dur in per_op.most_common(top):
        print(f"{dur/1e3/steps:9.2f} us/step  {100*dur/total:5.1f}%  {name[:110]}")
    return per_op, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=STEPS_DEFAULT)
    ap.add_argument("--variant", default="fused", choices=["fused", "unfused"])
    ap.add_argument("--scores", default="mulreduce")
    ap.add_argument("--agg", default="mulreduce")
    ap.add_argument("--final", default="concat")
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    jitted = build_sampler(args.steps, fused=args.variant == "fused",
                           scores_impl=args.scores, agg_impl=args.agg,
                           final_impl=args.final)
    xplane, tmp = profile(jitted, args.steps, args.outdir)
    print(f"trace: {xplane}")
    summarize(xplane, args.steps)


if __name__ == "__main__":
    main()
