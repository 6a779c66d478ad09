"""Hodge-dual operators on rank-2 incidence tensors (pure jnp, jit-safe).

Functional equivalents of ccsd/src/utils/cc_utils.py:917-979 and 1503-1588,
written as broadcast/gather expressions (the reference's `diag_embed` /
advanced-indexing round trips become one outer-product with the identity and
two static scatters, which XLA fuses).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ccsd_tpu.ops.cells import ComplexSpec, n_nodes_from_edges, edge_index


def hodge_laplacian(rank2: jnp.ndarray) -> jnp.ndarray:
    """H = F F^T over the last two dims.  (cc_utils.py:917-929)"""
    return rank2 @ jnp.swapaxes(rank2, -1, -2)


def default_mask(n: int) -> jnp.ndarray:
    """All-ones minus identity.  (cc_utils.py:932-942)"""
    return jnp.ones((n, n), dtype=jnp.float32) - jnp.eye(n, dtype=jnp.float32)


def pow_tensor_cc(
    x: jnp.ndarray, cnum: int, hodge_mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Channel stack [F, HF, H^2 F, ...] with H = (FF^T) * mask.

    Parity: cc_utils.py:945-979.  x: (B, E, K) -> (B, cnum, E, K).
    """
    if x.ndim == 2:
        x = x[None]
    H = hodge_laplacian(x)
    if hodge_mask is not None:
        if hodge_mask.ndim == 2:
            hodge_mask = hodge_mask[None]
        H = H * hodge_mask
    xc = [x]
    x_ = x
    for _ in range(cnum - 1):
        x_ = jnp.einsum("bef,bfk->bek", H, x_)
        xc.append(x_)
    return jnp.stack(xc, axis=1)


def adj_to_hodgedual(adj: jnp.ndarray) -> jnp.ndarray:
    """Embed the strict upper triangle of A on the diagonal of an E x E matrix.

    Parity: cc_utils.py:1503-1538.  (..., N, N) -> (..., E, E), E = C(N,2).
    """
    N = adj.shape[-1]
    uv = edge_index(N)
    diag = adj[..., uv[:, 0], uv[:, 1]]  # (..., E)
    eye = jnp.eye(uv.shape[0], dtype=adj.dtype)
    return diag[..., :, None] * eye


def hodgedual_to_adj(hodgedual: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`adj_to_hodgedual` (symmetrized scatter).

    Parity: cc_utils.py:1541-1588.  (..., E, E) -> (..., N, N).
    """
    E = hodgedual.shape[-1]
    N = n_nodes_from_edges(E)
    uv = edge_index(N)
    diag = jnp.diagonal(hodgedual, axis1=-2, axis2=-1)  # (..., E)
    adj = jnp.zeros(hodgedual.shape[:-2] + (N, N), dtype=hodgedual.dtype)
    adj = adj.at[..., uv[:, 0], uv[:, 1]].set(diag)
    adj = adj.at[..., uv[:, 1], uv[:, 0]].set(diag)
    return adj


def hodgedual_mask_from_spec(spec: ComplexSpec) -> jnp.ndarray:
    return default_mask(spec.num_edges)
