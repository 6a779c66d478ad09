"""Flag masking, noise generation and tensor-power ops (pure jnp, jit-safe).

Functional equivalents of the reference's
ccsd/src/utils/graph_utils.py:25-292 and ccsd/src/utils/cc_utils.py:527-979,
re-designed so every op is a gather / matmul / elementwise expression that XLA
can fuse and tile for TPU (the reference masks rank-2 tensors with Python
loops over `torch.nonzero(flags == 0)` — cc_utils.py:549-557 — which is a
per-step host sync; here they are two gathers and one MXU matmul).

All functions accept a leading batch dimension and optionally a channel
dimension, mirroring the reference broadcasting semantics exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ccsd_tpu.ops.cells import ComplexSpec


# ----------------------------------------------------------------- graphs ---

def mask_x(x: jnp.ndarray, flags: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Zero node-feature rows of absent nodes.  (graph_utils.py:25-37)

    x: (B, N, F); flags: (B, N) 0/1.
    """
    if flags is None:
        return x
    return x * flags[:, :, None].astype(x.dtype)


def mask_adjs(adjs: jnp.ndarray, flags: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Zero rows+cols of absent nodes.  (graph_utils.py:40-59)

    adjs: (B, N, N) or (B, C, N, N); flags: (B, N).
    """
    if flags is None:
        return adjs
    f = flags.astype(adjs.dtype)
    if adjs.ndim == 4:
        f = f[:, None, :]  # (B, 1, N)
    return adjs * f[..., :, None] * f[..., None, :]


def node_flags(adj: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Flags from |A| row sums.  (graph_utils.py:62-77)"""
    flags = (jnp.abs(adj).sum(-1) > eps).astype(jnp.float32)
    if flags.ndim == 3:
        flags = flags[:, 0, :]
    return flags


def gen_noise(
    key: jax.Array,
    x: jnp.ndarray,
    flags: Optional[jnp.ndarray],
    sym: bool = True,
) -> jnp.ndarray:
    """Masked Gaussian noise; symmetric-triu variant for adjacency.

    Parity: graph_utils.py:158-178 (torch RNG replaced by a jax PRNG key).
    """
    z = jax.random.normal(key, x.shape, dtype=x.dtype)
    if sym:
        z = jnp.triu(z, k=1)
        z = z + jnp.swapaxes(z, -1, -2)
        return mask_adjs(z, flags)
    return mask_x(z, flags)


def quantize(t: jnp.ndarray, thr: float = 0.5) -> jnp.ndarray:
    """Threshold to {0, 1}.  (graph_utils.py:181-193)"""
    return jnp.where(t < thr, 0.0, 1.0).astype(t.dtype)


def quantize_mol(adjs) -> "np.ndarray":
    """Round bond orders into {0,1,2,3}.  (graph_utils.py:195-213). Host-side."""
    import numpy as np

    a = np.asarray(adjs)
    out = np.zeros_like(a)
    out[a >= 2.5] = 3
    out[(a >= 1.5) & (a < 2.5)] = 2
    out[(a >= 0.5) & (a < 1.5)] = 1
    return out.astype(np.int64)


def pow_tensor(x: jnp.ndarray, cnum: int) -> jnp.ndarray:
    """Stack [A, A^2, ..., A^cnum] as channels.  (graph_utils.py:274-292)

    x: (B, N, N) -> (B, cnum, N, N).
    """
    xc = [x]
    x_ = x
    for _ in range(cnum - 1):
        x_ = jnp.einsum("bij,bjk->bik", x_, x)
        xc.append(x_)
    return jnp.stack(xc, axis=1)


def node_feature_to_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, F) -> (B, N, N, 2F) pairwise concat.  (graph_utils.py:385-399)"""
    B, N, F = x.shape
    x_b = jnp.broadcast_to(x[:, :, None, :], (B, N, N, F))
    return jnp.concatenate([x_b, jnp.swapaxes(x_b, 1, 2)], axis=-1)


# --------------------------------------------------------------- complexes ---

def edge_flags(spec: ComplexSpec, flags: jnp.ndarray) -> jnp.ndarray:
    """(B, E) flag per edge row: 1 iff both endpoints present.

    Replaces the Python loop of cc_utils.py:549-554 with two gathers.
    """
    u = jnp.asarray(spec.edge_u)
    v = jnp.asarray(spec.edge_v)
    return flags[:, u] * flags[:, v]


def cell_flags(spec: ComplexSpec, flags: jnp.ndarray) -> jnp.ndarray:
    """(B, K) flag per rank-2 cell column: 1 iff all member nodes present.

    Replaces the Python loop of cc_utils.py:554-557 with one matmul against
    the static (K, N) membership matrix: a cell is dead iff it contains at
    least one absent node.
    """
    M = jnp.asarray(spec.cell_mask)  # (K, N)
    missing = (1.0 - flags) @ M.T  # (B, K): number of absent member nodes
    return (missing < 0.5).astype(flags.dtype)


def rank2_flags(
    spec: ComplexSpec, flags: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(flags_left (B,E), flags_right (B,K)).  Parity: cc_utils.py:527-557."""
    return edge_flags(spec, flags), cell_flags(spec, flags)


def mask_rank2(
    rank2: jnp.ndarray, spec: ComplexSpec, flags: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Mask a batch of rank-2 incidence matrices.  (cc_utils.py:560-591)

    rank2: (B, E, K) or (B, C, E, K).
    """
    if flags is None:
        return rank2
    fl, fr = rank2_flags(spec, flags)
    fl = fl.astype(rank2.dtype)
    fr = fr.astype(rank2.dtype)
    if rank2.ndim == 4:
        fl = fl[:, None, :]
        fr = fr[:, None, :]
    return rank2 * fl[..., :, None] * fr[..., None, :]


def gen_noise_rank2(
    key: jax.Array,
    x: jnp.ndarray,
    spec: ComplexSpec,
    flags: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Masked Gaussian noise on the rank-2 tensor.  (cc_utils.py:594-615)"""
    z = jax.random.normal(key, x.shape, dtype=x.dtype)
    return mask_rank2(z, spec, flags)


def cell_flags_dynamic(
    member: jnp.ndarray, valid: jnp.ndarray, flags: jnp.ndarray
) -> jnp.ndarray:
    """(B, K) flags for a PER-SAMPLE cell universe.

    member: (B, K, N) 0/1 cell membership; valid: (B, K) 0/1 slot validity
    (padding columns are 0).  A cell is alive iff the slot is valid and all
    member nodes are present.  This is the open-universe generalization of
    :func:`cell_flags` — no reference counterpart (the reference universe is
    global and static, SURVEY.md §2.6).
    """
    missing = jnp.einsum("bn,bkn->bk", 1.0 - flags, member)
    return (missing < 0.5).astype(flags.dtype) * valid


def mask_rank2_dynamic(
    rank2: jnp.ndarray,
    spec: ComplexSpec,
    member: jnp.ndarray,
    valid: jnp.ndarray,
    flags: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Mask (B, E, K) / (B, C, E, K) rank-2 tensors over a per-sample
    candidate-cell universe (edge rows still come from the static spec)."""
    if flags is None:
        fl = jnp.ones_like(rank2[..., :, 0])
        fr = valid
        if rank2.ndim == 4:
            fr = fr[:, None, :]
        return rank2 * fr[..., None, :]
    fl = edge_flags(spec, flags)
    fr = cell_flags_dynamic(member, valid, flags)
    if rank2.ndim == 4:
        fl = fl[:, None, :]
        fr = fr[:, None, :]
    return rank2 * fl[..., :, None] * fr[..., None, :]


def gen_noise_rank2_dynamic(
    key: jax.Array,
    x: jnp.ndarray,
    spec: ComplexSpec,
    member: jnp.ndarray,
    valid: jnp.ndarray,
    flags: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Masked Gaussian noise on a dynamically-masked rank-2 tensor."""
    z = jax.random.normal(key, x.shape, dtype=x.dtype)
    return mask_rank2_dynamic(z, spec, member, valid, flags)


def mask_hodge_adjs(
    hodge_adjs: jnp.ndarray, spec: ComplexSpec, flags: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Mask (B, E, E) / (B, C, E, E) Hodge-dual adjacencies.

    Parity: cc_utils.py:1591-1641 (loop -> gathers).
    """
    if flags is None:
        return hodge_adjs
    f = edge_flags(spec, flags).astype(hodge_adjs.dtype)
    if hodge_adjs.ndim == 4:
        f = f[:, None, :]
    return hodge_adjs * f[..., :, None] * f[..., None, :]
