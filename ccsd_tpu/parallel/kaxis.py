"""K-axis (rank-2 cell) sharding: the missing half of the edge partition.

ScoreNetworkF's (B, C, E, K) tensors are the framework's memory wall
(SURVEY.md §2.6 scale cliff: ego_small_CC K=12444, ZINC-scale two-stage
K_max even larger); parallel/ring.py shards E but keeps K whole.  This
module shards the CELL axis over the mesh's 'cell' axis so per-chip rank-2
memory drops to O(E*K/p):

  * ``hodge_from_ksharded``  — H = F F^T is a contraction OVER K, so the
    local partial product needs exactly one psum; H (B, E, E) then lives
    replicated (it is K-independent and small relative to E*K);
  * ``pow_slabs_ksharded``   — the power slabs H^c F keep K sharded with
    ZERO further communication (H @ F_loc contracts over the full E axis);
  * ``score_f_apply_ksharded`` — the full ScoreNetworkF forward (fused slab
    path, models/score_f.py) with every (B, E, K) slab K-sharded: one psum
    per eval, everything else local;
  * ``hodge_attention_ksharded`` — HodgeAttention (hodge_nn.py:88-150) with
    rank2 K-sharded: Q/K projections contract over K (one psum each, done
    jointly), V = hodge_adj @ rank2 stays K-sharded locally.

All functions run INSIDE ``jax.shard_map`` with the cell axis named
``axis_name``; equivalence against the dense path is asserted at
ego_small_CC scale (K=12444 split 8 ways) in tests/parallel/test_kaxis.py.
Composition with the E-sharded ring (2-D edge x cell meshes) applies these
per-axis primitives to an (E_loc, K_loc) tile; the E x E contractions then
ride the ring while the K contractions psum over 'cell'.

Reference wall being replaced: ScoreNetwork_F.py:24-217 +
cc_utils.py:945-979 (dense, single device, no distribution at all).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ccsd_tpu.models.score_f import linear_slabs, mlp_slabs
from ccsd_tpu.ops.hodge import default_mask


def pad_cells(rank2: jnp.ndarray, parts: int) -> jnp.ndarray:
    """Zero-pad the trailing (cell) axis to a multiple of `parts`."""
    K = rank2.shape[-1]
    pad = (-K) % parts
    if pad == 0:
        return rank2
    widths = [(0, 0)] * (rank2.ndim - 1) + [(0, pad)]
    return jnp.pad(rank2, widths)


def hodge_from_ksharded(rank2_loc: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """H = F F^T with F's K axis sharded: local partial + one psum.

    Zero-padded cell columns contribute nothing to the outer products, so
    the padded and unpadded H agree exactly.
    """
    part = rank2_loc @ jnp.swapaxes(rank2_loc, -1, -2)
    return jax.lax.psum(part, axis_name)


def pow_slabs_ksharded(
    rank2_loc: jnp.ndarray,
    cnum: int,
    axis_name: str,
    hodge_mask: Optional[jnp.ndarray] = None,
) -> list:
    """[F, HF, H^2 F, ...] slabs with K sharded (pow_tensor_cc parity,
    cc_utils.py:945-979).  One psum builds H; each power is then a LOCAL
    (B, E, E) @ (B, E, K_loc) matmul."""
    H = hodge_from_ksharded(rank2_loc, axis_name)
    if hodge_mask is not None:
        H = H * hodge_mask[None] if hodge_mask.ndim == 2 else H * hodge_mask
    slabs = [rank2_loc]
    for _ in range(cnum - 1):
        slabs.append(H @ slabs[-1])
    return slabs


def _local_cell_slice(full: jnp.ndarray, axis_name: str,
                      k_loc: int) -> jnp.ndarray:
    idx = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(
        full, idx * k_loc, k_loc, axis=full.ndim - 1
    )


def score_f_apply_ksharded(
    model,
    params: dict,
    rank2_loc: jnp.ndarray,
    flags: Optional[jnp.ndarray],
    axis_name: str,
) -> jnp.ndarray:
    """Full ScoreNetworkF forward with the cell axis sharded.

    rank2_loc: (B, E, K_loc) — this chip's cell columns (pad_cells when
    K % p != 0; padded columns come back masked to zero when flags are
    given, garbage otherwise — callers slice to the true K).
    Identical math to ScoreNetworkF._apply_fused: the channel slabs are
    column-separable, so sharding K leaves every post-Hodge op local.
    """
    spec = model.spec
    k_loc = rank2_loc.shape[-1]

    if flags is None:
        mask = lambda s: s
    else:
        from ccsd_tpu.ops.masks import rank2_flags

        fl, fr = rank2_flags(spec, flags)
        p = jax.lax.axis_size(axis_name)
        # pad fr to the sharded width (zeros => padded columns mask to 0),
        # then take this chip's columns
        pad = p * k_loc - fr.shape[-1]
        if pad > 0:
            fr = jnp.pad(fr, [(0, 0), (0, pad)])
        fr_loc = _local_cell_slice(fr, axis_name, k_loc)
        mask = lambda s: s * fl[..., :, None] * fr_loc[..., None, :]

    hodge_mask = (
        default_mask(spec.num_edges) if model.use_hodge_mask else None
    )
    slabs = pow_slabs_ksharded(rank2_loc, model.cnum, axis_name, hodge_mask)

    rank2_list = list(slabs)
    h = slabs
    for layer, lp in zip(model.layers, params["layers"]):
        h = mlp_slabs(layer.layer, lp["layer"], h)
        h = [mask(s) for s in h]
        rank2_list.extend(h)

    score = mlp_slabs(model.final, params["final"], rank2_list)[0]
    return mask(score)


def hodge_attention_ksharded(
    params: dict,
    hodge_adj: jnp.ndarray,
    rank2_loc: jnp.ndarray,
    axis_name: str,
    num_heads: int,
    attn_dim: int,
    out_dim: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HodgeAttention forward (HCN conv mode) with rank2's K axis sharded.

    hodge_adj: (B, E, E) replicated; rank2_loc: (B, E, K_loc).
    Q/K = norm(H) @ (F W) contract over K -> the partial (B, E, A)
    projections psum over 'cell' (stacked, so ONE collective); V = H @ F
    is local and returns K-sharded.  Matches HodgeAttention.apply
    (hodge_nn.py:88-150) on the gathered tensors.
    """
    k_loc = rank2_loc.shape[-1]
    idx = jax.lax.axis_index(axis_name)
    wq = jax.lax.dynamic_slice_in_dim(
        params["q"]["weight"], idx * k_loc, k_loc, axis=0
    )
    wk = jax.lax.dynamic_slice_in_dim(
        params["k"]["weight"], idx * k_loc, k_loc, axis=0
    )
    parts = jnp.stack([rank2_loc @ wq, rank2_loc @ wk])
    parts = jax.lax.psum(parts, axis_name)  # one collective for Q and K

    deg = jnp.clip(hodge_adj.sum(axis=-1), min=1.0) ** -0.5
    norm = deg[..., :, None] * hodge_adj * deg[..., None, :]
    Q = norm @ parts[0] + params["q"]["bias"]
    K = norm @ parts[1] + params["k"]["bias"]
    V = hodge_adj @ rank2_loc  # K-sharded, local

    ds = attn_dim // num_heads
    H = attn_dim // ds
    att = jnp.zeros(hodge_adj.shape, Q.dtype)
    for h in range(H):
        s = Q[..., h * ds:(h + 1) * ds] @ jnp.swapaxes(
            K[..., h * ds:(h + 1) * ds], -1, -2
        )
        att = att + jnp.tanh(s / math.sqrt(out_dim))
    att = att / H
    att = (att + jnp.swapaxes(att, -1, -2)) / 2
    return V, att
