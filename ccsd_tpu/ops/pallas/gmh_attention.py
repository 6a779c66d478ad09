"""Pallas TPU kernel: fully-fused GMH attention (one adjacency channel).

Fuses the whole of ccsd/src/models/attention.py:84-132 for one batch
element into a single VMEM-resident kernel:

    norm = D^-1/2 (A + I) D^-1/2          (computed once, reused 3x)
    Q = norm @ (X Wq) + bq;  K = norm @ (X Wk) + bk;  V = norm @ (X Wv) + bv
    S_h = Q_h K_h^T / sqrt(F_out)         (per head, MXU)
    Attn = sym(mean_h tanh(S_h))

The XLA path materializes Q, K and the (H, N, N) per-head scores through
HBM and re-derives the degree normalization inside each of the three convs;
here everything after loading X, A and the weights stays in VMEM.

Returns (V, Attn) exactly like Attention.apply (GCN conv mode).  Validated
against the reference path in tests/ops/test_pallas_gcn.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gmh_kernel(x_ref, adj_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                bv_ref, v_out_ref, a_out_ref, *, num_heads: int,
                head_dim: int, out_dim: int, loop_val: float):
    adj = adj_ref[0]
    n = adj.shape[0]
    eye = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    adj = jnp.where(eye, loop_val, adj)
    deg = jnp.maximum(jnp.sum(adj, axis=-1, keepdims=True), 1.0)
    dis = jax.lax.rsqrt(deg)
    norm = dis * adj * dis.reshape(1, n)

    x = x_ref[0]
    q = jnp.dot(norm, jnp.dot(x, wq_ref[:], preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32) + bq_ref[:].reshape(1, -1)
    k = jnp.dot(norm, jnp.dot(x, wk_ref[:], preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32) + bk_ref[:].reshape(1, -1)
    v = jnp.dot(norm, jnp.dot(x, wv_ref[:], preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32) + bv_ref[:].reshape(1, -1)
    v_out_ref[0] = v

    scale = 1.0 / math.sqrt(out_dim)
    acc = jnp.zeros((n, n), jnp.float32)
    for h in range(num_heads):
        qh = q[:, h * head_dim:(h + 1) * head_dim]
        kh = k[:, h * head_dim:(h + 1) * head_dim]
        s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32) * scale
        acc = acc + jnp.tanh(s)
    a = acc / num_heads
    a_out_ref[0] = (a + a.T) / 2


@functools.partial(
    jax.jit, static_argnames=("num_heads", "out_dim", "add_loop", "improved")
)
def gmh_attention_pallas(
    x: jnp.ndarray,
    adj: jnp.ndarray,
    wq, bq, wk, bk, wv, bv,
    num_heads: int,
    out_dim: int,
    add_loop: bool = True,
    improved: bool = False,
):
    """x: (B, N, F_in), adj: (B, N, N) -> (V (B, N, F_out), A (B, N, N))."""
    B, N, Fi = x.shape
    attn_dim = wq.shape[1]
    F_out = wv.shape[1]
    head_dim = attn_dim // num_heads
    if head_dim == 0 or attn_dim % head_dim:
        raise ValueError("attn_dim must split into equal head chunks")
    n_heads_eff = attn_dim // head_dim
    loop_val = (2.0 if improved else 1.0) if add_loop else 0.0

    kernel = functools.partial(
        _gmh_kernel, num_heads=n_heads_eff, head_dim=head_dim,
        out_dim=out_dim, loop_val=loop_val,
    )
    vspec = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, N, F_out), jnp.float32),
            jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, Fi), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec(Fi, attn_dim), vspec(attn_dim),
            vspec(Fi, attn_dim), vspec(attn_dim),
            vspec(Fi, F_out), vspec(F_out),
        ],
        out_specs=(
            pl.BlockSpec((1, N, F_out), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, adj, wq, bq, wk, bk, wv, bv)
