#!/usr/bin/env python
"""Layout microbenchmarks for the batch-in-lanes sampler kernel design.

Decides how to build the fused AttentionLayer Pallas kernel (ROADMAP #1,
VERDICT round-1 item 2): at community_small sampler shapes (B=128, N=20,
F=32) the tensors pad terribly onto (8,128) tiles, so we measure

  a) VPU multiply-reduce throughput with B in lanes (the batch-in-lanes
     candidate for the per-batch contractions: GCN aggregation, QK^T),
  b) MXU matmul throughput with (B*N) folded into rows (the candidate for
     the weight contractions),
  c) the current fused-XLA AttentionLayer stack per-eval time, and the
     x-model / adj-model split of the sampler step,

all on the real chip.  Results drive DESIGN_NOTES "batch-in-lanes" section.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, N, F, C, H, DS, P = 128, 20, 32, 8, 4, 8, 96


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)
    dev = jax.devices()[0]
    print("device:", dev)

    # (a) VPU multiply-reduce, batch-in-lanes: agg nx[c,n,f,b] = sum_m norm[c,n,m,b] x[m,f,b]
    norm = jax.random.normal(key, (C, N, N, B))
    x_bl = jax.random.normal(key, (N, F, B))

    @jax.jit
    def agg_bl(norm, x):
        # (C,N,N,1,B) * (1,1,N,F,B) summed over m — chunked over m to bound memory
        acc = jnp.zeros((C, N, F, B))
        for m in range(N):
            acc = acc + norm[:, :, m, None, :] * x[None, m, None, :, :]
        return acc

    t = timeit(agg_bl, norm, x_bl)
    flops = 2 * C * N * N * F * B
    print(f"(a1) agg batch-in-lanes VPU: {t*1e6:.1f} us, {flops/t/1e12:.3f} TFLOP/s")

    # scores: s[c,h,n,m,b] = sum_d q[c,h,n,d,b] k[c,h,m,d,b]
    q = jax.random.normal(key, (C, H, N, DS, B))
    k = jax.random.normal(key, (C, H, N, DS, B))

    @jax.jit
    def scores_bl(q, k):
        acc = jnp.zeros((C, H, N, N, B))
        for d in range(DS):
            acc = acc + q[:, :, :, None, d, :] * k[:, :, None, :, d, :]
        return jnp.tanh(acc).mean(axis=1)

    t = timeit(scores_bl, q, k)
    flops = 2 * C * H * N * N * DS * B
    print(f"(a2) QK^T batch-in-lanes VPU: {t*1e6:.1f} us, {flops/t/1e12:.3f} TFLOP/s")

    # (a3) weight contraction on VPU batch-in-lanes: agg[c,n,p,b] = sum_f nx[c,n,f,b] W[c,f,p]
    nx = jax.random.normal(key, (C, N, F, B))
    W = jax.random.normal(key, (C, F, P))

    @jax.jit
    def wmat_bl(nx, W):
        acc = jnp.zeros((C, N, P, B))
        for f in range(F):
            acc = acc + nx[:, :, f, None, :] * W[:, None, f, :, None]
        return acc

    t = timeit(wmat_bl, nx, W)
    flops = 2 * C * N * F * P * B
    print(f"(a3) Wmat batch-in-lanes VPU: {t*1e6:.1f} us, {flops/t/1e12:.3f} TFLOP/s")

    # (b) MXU batch-folded weight matmul: (B*N, C*F) @ (C*F, C*P) block-diag
    lhs = jax.random.normal(key, (B * N, C * F))
    rhs = jax.random.normal(key, (C * F, C * P))

    @jax.jit
    def wmat_mxu(lhs, rhs):
        return lhs @ rhs

    t = timeit(wmat_mxu, lhs, rhs)
    flops = 2 * (B * N) * (C * F) * (C * P)
    print(f"(b1) Wmat MXU block-diag fp32: {t*1e6:.1f} us, {flops/t/1e12:.3f} TFLOP/s"
          f" (useful x{1/C:.3f})")

    lhs16, rhs16 = lhs.astype(jnp.bfloat16), rhs.astype(jnp.bfloat16)
    t = timeit(wmat_mxu, lhs16, rhs16)
    print(f"(b2) Wmat MXU block-diag bf16: {t*1e6:.1f} us, {flops/t/1e12:.3f} TFLOP/s")

    # (b3) per-channel MXU loop
    lhs_c = jax.random.normal(key, (C, B * N, F))
    rhs_c = jax.random.normal(key, (C, F, P))

    @jax.jit
    def wmat_mxu_c(lhs, rhs):
        return jax.lax.dot_general(lhs, rhs, (((2,), (1,)), ((0,), (0,))))

    t = timeit(wmat_mxu_c, lhs_c, rhs_c)
    flops = 2 * C * (B * N) * F * P
    print(f"(b3) Wmat MXU per-channel batched: {t*1e6:.1f} us, {flops/t/1e12:.3f} TFLOP/s")

    # (c) current fused AttentionLayer + model split
    from ccsd_tpu.models.attention import AttentionLayer
    from ccsd_tpu.models.registry import load_model

    layer = AttentionLayer(2, F, 32, 32, 8, 8, num_heads=4, conv="GCN", fused=True)
    p = layer.init(key)
    xx = jax.random.normal(key, (B, N, F))
    aa = jax.random.normal(key, (B, 8, N, N))
    fl = jnp.ones((B, N))
    f_layer = jax.jit(lambda p, x, a: layer.apply(p, x, a, fl))
    t = timeit(f_layer, p, xx, aa)
    print(f"(c1) fused-XLA AttentionLayer (mid, C=8): {t*1e6:.1f} us")

    ma = load_model(dict(model_type="ScoreNetworkA", max_feat_num=10,
                         max_node_num=N, nhid=32, num_layers=5, num_linears=2,
                         c_init=2, c_hid=8, c_final=4, adim=32, num_heads=4,
                         conv="GCN", use_bn=False, is_cc=False, fused=True))
    pa = ma.init(key)
    x10 = jax.random.normal(key, (B, N, 10))
    a1 = jax.random.normal(key, (B, N, N))
    f_adj = jax.jit(lambda p, x, a: ma.apply(p, x, a, None, fl))
    t = timeit(f_adj, pa, x10, a1)
    print(f"(c2) ScoreNetworkA eval (5 layers): {t*1e6:.1f} us")

    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=10, depth=3,
                         nhid=32, use_bn=False, is_cc=False))
    px = mx.init(key)
    f_x = jax.jit(lambda p, x, a: mx.apply(p, x, a, None, fl))
    t = timeit(f_x, px, x10, a1)
    print(f"(c3) ScoreNetworkX eval: {t*1e6:.1f} us")


if __name__ == "__main__":
    main()
