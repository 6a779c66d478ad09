#!/usr/bin/env python
"""Probe: can Pallas beat the ~125 us XLA floor on the batch-in-lanes
GCN aggregation at sampler shapes?

The contraction nx[c,n,f,b] = sum_m norm[c,n,m,b] * x[m,f,b] is the
XLA-unfriendly op of the fused AttentionLayer (B=128 in lanes, tiny N=20):
measured 128.6 us in-scan via XLA on an early run (0.20 TFLOP/s vs a
~13.5 us VPU floor); the DESIGN_NOTES table's 150 us / 0.18 TFLOP/s row is
a later fresh run of this same probe — run-to-run spread on the tunnel is
~15%, and the conclusion (XLA == Pallas at these shapes) holds at both.
If a VMEM-resident Pallas kernel lands near the floor, the full fused
AttentionLayer kernel (ROADMAP #1) is worth building; if it also sits at
~125 us the overhead is per-instruction issue cost that neither compiler
dodges at these shapes, and that becomes the DESIGN_NOTES analysis.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, N, F, B = 8, 20, 32, 128


def _agg_kernel(norm_ref, x_ref, out_ref):
    acc = jnp.zeros((C, N, F, B), jnp.float32)
    for m in range(N):
        nm = norm_ref[:, :, m, :].reshape(C, N, 1, B)
        xm = x_ref[m, :, :].reshape(1, 1, F, B)
        acc = acc + nm * xm
    out_ref[:] = acc


@jax.jit
def agg_pallas(norm, x):
    return pl.pallas_call(
        _agg_kernel,
        out_shape=jax.ShapeDtypeStruct((C, N, F, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(norm, x)


def _agg_kernel_2d(norm_ref, x_ref, out_ref):
    # 2D-folded: rows = (c, n), lanes = B; per (m, f) rank-1 style updates
    # out[(c,n), f, b] built F-slab at a time with (C*N, B)-shaped FMAs.
    for f in range(F):
        acc = jnp.zeros((C * N, B), jnp.float32)
        for m in range(N):
            acc = acc + norm_ref[:, m, :] * x_ref[m, f, :].reshape(1, B)
        out_ref[:, f, :] = acc


@jax.jit
def agg_pallas_2d(norm, x):
    # norm folded to (C*N, N, B) outside
    return pl.pallas_call(
        _agg_kernel_2d,
        out_shape=jax.ShapeDtypeStruct((C * N, F, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(norm, x)


@jax.jit
def agg_xla(norm, x):
    acc = jnp.zeros((C, N, F, B))
    for m in range(N):
        acc = acc + norm[:, :, m, None, :] * x[None, m, None, :, :]
    return acc


def scan_time(fn, *args, length=200, reps=3):
    @jax.jit
    def run(a0):
        def body(c, _):
            r = fn(c, *args[1:])
            # fold result back into the carry so nothing is DCE'd
            return 0.999 * c + 1e-9 * r.mean(), None
        return jax.lax.scan(body, a0, None, length=length)[0]

    r = run(args[0])
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(args[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts) / length


def main():
    key = jax.random.PRNGKey(0)
    norm = jax.random.normal(key, (C, N, N, B))
    x = jax.random.normal(key, (N, F, B))
    flops = 2 * C * N * N * F * B

    # correctness
    ref = agg_xla(norm, x)
    out = agg_pallas(norm, x)
    print("pallas 4d allclose:", bool(jnp.allclose(ref, out, atol=1e-5)))
    out2 = agg_pallas_2d(norm.reshape(C * N, N, B), x).reshape(C, N, F, B)
    print("pallas 2d allclose:", bool(jnp.allclose(ref, out2, atol=1e-5)))

    t = scan_time(lambda c: agg_xla(c, x), norm)
    print(f"XLA     : {t*1e6:7.1f} us  {flops/t/1e12:.2f} TFLOP/s")
    t = scan_time(lambda c: agg_pallas(c, x), norm)
    print(f"pallas4d: {t*1e6:7.1f} us  {flops/t/1e12:.2f} TFLOP/s")
    n2 = norm.reshape(C * N, N, B)
    t = scan_time(lambda c: agg_pallas_2d(c, x), n2)
    print(f"pallas2d: {t*1e6:7.1f} us  {flops/t/1e12:.2f} TFLOP/s")


if __name__ == "__main__":
    main()
