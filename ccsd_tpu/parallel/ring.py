"""Explicit edge-partitioned (E-sharded) Hodge collectives: ring matmuls,
distributed transpose, and a shard_map'd Hodge attention forward.

The GSPMD path (parallel/dp.py) lets XLA insert all-gathers for the E x E
Hodge-dual contractions.  This module is the HAND path for pod scale: the
E axis of every Hodge tensor is sharded over the mesh's 'edge' axis and the
contractions run as a ppermute RING — each step multiplies the resident
block while the next block is in flight, and per-chip memory never holds
the full E axis on the K-sized tensors.  This is the scaling-book
ring-matmul recipe applied to the Hodge dual; the reference has no
distributed layer at all (SURVEY.md §2.11).

Overlap status (measured, round 3 — tools/ring_bench.py):
  * XLA:TPU (AOT compile for v5e:2x4): 7 async collective-permute
    start/done pairs (3 ring_gather_matmuls + 4 per-head ring_scores),
    each with 1-2 dot/fusion ops scheduled between the start and its done
    — the compiler does overlap the hop with the block matmul on TPU.
  * XLA:CPU (the virtual 8-device test mesh): NO async pairs are emitted
    (0/0) — the CPU backend serializes ppermute, so CPU-mesh wall-clock
    comparisons vs GSPMD measure correctness, not the ring's ICI win
    (round-2 CPU timings: E=703 dense 54 ms | gspmd 105 | ring 93;
    E=1176 dense 84 | gspmd 107 | ring 140).

All functions here are written to run INSIDE `jax.shard_map` with the edge
axis named `axis_name`; equivalence against the dense single-device path is
asserted in tests/parallel/test_ring.py on the virtual CPU mesh.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _perm(axis_name: str):
    p = jax.lax.axis_size(axis_name)
    return [(i, (i + 1) % p) for i in range(p)]


def ring_gather_matmul(
    x_loc: jnp.ndarray, y_loc: jnp.ndarray, axis_name: str
) -> jnp.ndarray:
    """x @ y with both operands row-sharded on their E axis.

    x_loc: (..., M_loc, E_full) — rows sharded, columns full;
    y_loc: (..., E_loc, K)      — rows sharded.
    Returns x @ y rows for this shard: (..., M_loc, K).

    Ring: with the (i -> i+1) ppermute, after r hops this device holds the
    block originally owned by (idx - r) mod p; multiply the matching column
    slice of x while the next block is in flight (comm overlaps compute).
    """
    p = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    e_loc = y_loc.shape[-2]

    def body(r, carry):
        acc, block = carry
        owner = (idx - r) % p
        x_slice = jax.lax.dynamic_slice_in_dim(
            x_loc, owner * e_loc, e_loc, axis=x_loc.ndim - 1
        )
        nxt = jax.lax.ppermute(block, axis_name, _perm(axis_name))
        acc = acc + x_slice @ block
        return acc, nxt

    acc = jnp.zeros(x_loc.shape[:-1] + (y_loc.shape[-1],), x_loc.dtype)
    acc, _ = jax.lax.fori_loop(0, p, body, (acc, y_loc))
    return acc


def ring_scores(
    q_loc: jnp.ndarray, k_loc: jnp.ndarray, axis_name: str
) -> jnp.ndarray:
    """q @ k^T with q, k row-sharded: (..., E_loc, A) x (..., E_loc, A)
    -> (..., E_loc, E_full) (rows sharded, columns full)."""
    p = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    e_loc = q_loc.shape[-2]

    def body(r, carry):
        out, block = carry
        owner = (idx - r) % p
        nxt = jax.lax.ppermute(block, axis_name, _perm(axis_name))
        s = q_loc @ jnp.swapaxes(block, -1, -2)  # (..., E_loc, E_loc)
        out = jax.lax.dynamic_update_slice_in_dim(
            out, s, owner * e_loc, axis=out.ndim - 1
        )
        return out, nxt

    out = jnp.zeros(q_loc.shape[:-1] + (p * e_loc,), q_loc.dtype)
    out, _ = jax.lax.fori_loop(0, p, body, (out, k_loc))
    return out


def sharded_transpose(a_loc: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Distributed transpose of a row-sharded square matrix.

    a_loc: (..., E_loc, E_full) -> a^T rows for this shard, same layout.
    One all_to_all: device d sends its column block q to device q, receives
    every device's column block d, transposes each received block in place.
    """
    p = jax.lax.axis_size(axis_name)
    e_loc = a_loc.shape[-2]
    blocks = a_loc.reshape(a_loc.shape[:-1] + (p, e_loc))  # (..., El, p, El)
    blocks = jnp.moveaxis(blocks, -2, 0)  # (p, ..., E_loc, E_loc)
    recv = jax.lax.all_to_all(blocks, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)
    recv = jnp.swapaxes(recv, -1, -2)  # transpose each block
    recv = jnp.moveaxis(recv, 0, -2)  # (..., E_loc, p, E_loc)
    return recv.reshape(a_loc.shape)


def _hodge_norm_rows(hodge_adj_loc: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Degree-normalize a row-sharded (..., E_loc, E_full) Hodge adjacency.

    The reference normalizes BOTH sides with the row-degree vector
    (hodge_layers.py:163-180: d = rowsum(A)^-1/2; D A D); the column-side
    factors are therefore the other shards' row degrees — one small
    all_gather of the (B, E_loc) degree vector, not of the matrix.
    """
    row_deg = jnp.clip(hodge_adj_loc.sum(axis=-1), min=1.0) ** -0.5
    all_deg = jax.lax.all_gather(
        row_deg, axis_name, axis=row_deg.ndim - 1, tiled=True
    )  # (..., E_full)
    return row_deg[..., :, None] * hodge_adj_loc * all_deg[..., None, :]


def hodge_attention_sharded(
    params: dict,
    hodge_adj_loc: jnp.ndarray,
    rank2_loc: jnp.ndarray,
    axis_name: str,
    num_heads: int,
    attn_dim: int,
    out_dim: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One HodgeAttention forward with the E axis sharded (HCN conv mode).

    hodge_adj_loc: (B, E_loc, E_full) row-sharded dual adjacency;
    rank2_loc:     (B, E_loc, K) row-sharded incidence.
    Returns (V_loc (B, E_loc, K), att_loc (B, E_loc, E_full)) — the same
    values HodgeAttention.apply produces on the gathered tensors
    (hodge_nn.py:118-149), with every E-contraction running as a ring.
    """
    norm = _hodge_norm_rows(hodge_adj_loc, axis_name)
    qw = rank2_loc @ params["q"]["weight"]  # (B, E_loc, A) local
    kw = rank2_loc @ params["k"]["weight"]
    Q = ring_gather_matmul(norm, qw, axis_name) + params["q"]["bias"]
    K = ring_gather_matmul(norm, kw, axis_name) + params["k"]["bias"]
    V = ring_gather_matmul(hodge_adj_loc, rank2_loc, axis_name)

    ds = attn_dim // num_heads
    H = attn_dim // ds
    att = jnp.zeros(
        (Q.shape[0], Q.shape[1], hodge_adj_loc.shape[-1]), Q.dtype
    )
    for h in range(H):
        s = ring_scores(
            Q[..., h * ds:(h + 1) * ds], K[..., h * ds:(h + 1) * ds],
            axis_name,
        )
        att = att + jnp.tanh(s / math.sqrt(out_dim))
    att = att / H
    att = (att + sharded_transpose(att, axis_name)) / 2
    return V, att


def edge_sharding(mesh: Mesh) -> Tuple[NamedSharding, NamedSharding]:
    """(hodge_adj, rank2) shardings: rows of E on the 'edge' axis."""
    return (
        NamedSharding(mesh, P(None, "edge", None)),
        NamedSharding(mesh, P(None, "edge", None)),
    )
