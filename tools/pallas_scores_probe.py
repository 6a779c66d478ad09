#!/usr/bin/env python
"""Probe: Pallas vs XLA on the GMH scores block at sampler shapes.

The scores block is the largest single cost in the graph PC sampler
(~35 us/layer-eval x 8 instances = ~280 us of the 912 us step,
tools/profile_sampler.py).  Computation per AttentionLayer:

    att[b,c,n,m] = mean_h tanh( sum_d Q[b,c,n,h,d] K[b,c,m,h,d] / sqrt(O) )

This probe times, all with identical (C, A, N, B) operand layouts (B in
lanes, the layout XLA itself picks for these fusions):
  1. jnp head-unrolled mul-reduce (the current model fast path)
  2. Pallas f32 kernel: per (c, n) register-accumulated FMAs on (N, B) tiles
  3. Pallas bf16 kernel: same with 2-per-lane packed bf16 FMAs

If Pallas lands >=1.5x on this block it graduates into the model
(scores_impl="pallas"); if it lands on the XLA time the DESIGN_NOTES
batch-in-lanes conclusion extends to register-tiled kernels and the
supertile projection is closed as refuted.
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, C, N, A, H, O = 128, 8, 20, 32, 4, 32
DS = A // H
INV = 1.0 / math.sqrt(O)


# ---------------------------------------------------------------- jnp ref ---

@jax.jit
def scores_jnp(q, k):
    """q, k: (C, A, N, B) -> att (C, N, N, B); head-unrolled mul-reduce."""
    acc = None
    for h in range(H):
        qh = q[:, h * DS:(h + 1) * DS]  # (C, DS, N, B)
        kh = k[:, h * DS:(h + 1) * DS]
        s = (qh[:, :, :, None, :] * kh[:, :, None, :, :]).sum(1)
        t = jnp.tanh(s * INV)
        acc = t if acc is None else acc + t
    return acc / H


# ------------------------------------------------- pallas: register-blocked ---
#
# The first kernel below (_scores_kernel) re-reads the full K slab for every
# output row n: C*N*A reads of (N, B) = ~51 MB of VMEM traffic for 26 MFLOP.
# The register-blocked kernel inverts the loops: for an NC-row chunk of n it
# streams each (N, B) K slab ONCE per d, holding NC score accumulators AND
# NC tanh accumulators in vector registers (NC=5: ~28 live vregs).  Traffic
# drops to ~C*H*(N/NC)*ds*(N*B*4) ~ 10 MB.

def _scores_reg_kernel(q_ref, k_ref, out_ref, *, dtype, nc):
    for c0 in range(1):  # single block per program (grid over C)
        for n0 in range(0, N, nc):
            att = [jnp.zeros((N, B), jnp.float32) for _ in range(nc)]
            for h in range(H):
                s = [jnp.zeros((N, B), dtype) for _ in range(nc)]
                for d in range(DS):
                    hd = h * DS + d
                    kslab = k_ref[0, hd, :, :].astype(dtype)      # (N, B)
                    qrows = q_ref[0, hd, pl.ds(n0, nc), :].astype(dtype)
                    for i in range(nc):
                        s[i] = s[i] + kslab * qrows[i:i + 1]
                for i in range(nc):
                    att[i] = att[i] + jnp.tanh(
                        s[i].astype(jnp.float32) * INV)
            for i in range(nc):
                out_ref[0, n0 + i, :, :] = att[i] / H


def make_pallas_reg(dtype, nc=5):
    kern = functools.partial(_scores_reg_kernel, dtype=dtype, nc=nc)

    @jax.jit
    def run(q, k):
        return pl.pallas_call(
            kern,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, A, N, B), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, A, N, B), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, N, N, B), lambda c: (c, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, N, N, B), jnp.float32),
        )(q, k)

    return run


# ----------------------------------------------------------------- pallas ---

def _scores_kernel(q_ref, k_ref, out_ref, *, dtype):
    # q_ref, k_ref: (1, A, N, B) block (grid over C); out: (1, N, N, B)
    def n_body(n, _):
        acc = jnp.zeros((N, B), jnp.float32)
        for h in range(H):
            s = jnp.zeros((N, B), dtype)
            for d in range(DS):
                hd = h * DS + d
                kslab = k_ref[0, hd, :, :].astype(dtype)   # (N, B)
                qrow = q_ref[0, hd, pl.ds(n, 1), :].astype(dtype)  # (1, B)
                s = s + kslab * qrow
            acc = acc + jnp.tanh(s.astype(jnp.float32) * INV)
        out_ref[0, pl.ds(n, 1), :, :] = (acc / H)[None]
        return 0

    jax.lax.fori_loop(0, N, n_body, 0)


def make_pallas(dtype):
    kern = functools.partial(_scores_kernel, dtype=dtype)

    @jax.jit
    def run(q, k):
        return pl.pallas_call(
            kern,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, A, N, B), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, A, N, B), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, N, N, B), lambda c: (c, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, N, N, B), jnp.float32),
        )(q, k)

    return run


def scan_time(fn, *args, length=300, reps=3):
    @jax.jit
    def run(a0):
        def body(c, _):
            r = fn(c, *args[1:])
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
    q = jax.random.normal(key, (C, A, N, B)) * 0.5
    k = jax.random.normal(jax.random.fold_in(key, 1), (C, A, N, B)) * 0.5

    ref = scores_jnp(q, k)
    variants = [
        ("pallas f32     ", make_pallas(jnp.float32)),
        ("pallas bf16    ", make_pallas(jnp.bfloat16)),
        ("reg f32 nc=4   ", make_pallas_reg(jnp.float32, 4)),
        ("reg f32 nc=5   ", make_pallas_reg(jnp.float32, 5)),
        ("reg f32 nc=10  ", make_pallas_reg(jnp.float32, 10)),
        ("reg bf16 nc=5  ", make_pallas_reg(jnp.bfloat16, 5)),
        ("reg bf16 nc=10 ", make_pallas_reg(jnp.bfloat16, 10)),
    ]
    for name, fn in variants:
        out = fn(q, k)
        err = float(jnp.abs(out - ref).max())
        print(f"{name}: max|err| = {err:.2e}")

    flops = 2 * C * N * N * A * B  # mul+add over full A per (n, m)
    t = scan_time(scores_jnp, q, k)
    print(f"jnp mulreduce_h : {t*1e6:7.1f} us  {flops/t/1e12:.2f} TFLOP/s")
    for name, fn in variants:
        t = scan_time(fn, q, k)
        print(f"{name} : {t*1e6:7.1f} us  {flops/t/1e12:.2f} TFLOP/s")


if __name__ == "__main__":
    main()
