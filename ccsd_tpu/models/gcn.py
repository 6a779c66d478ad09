"""Dense GCN convolution (Kipf & Welling) on padded adjacency batches.

Parity target: ccsd/src/models/layers.py:57-158 (DenseGCNConv).  The weight
is stored (in, out) exactly like the reference Parameter, so checkpoint
conversion is a direct copy.

The aggregation `D^-1/2 (A + I) D^-1/2 (X W)` is expressed as two batched
matmuls with a fused degree-normalization epilogue — XLA tiles both onto the
MXU; see ccsd_tpu/ops/pallas for the hand-fused variant used at larger N.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ccsd_tpu.models.nn import glorot_uniform


def gcn_norm(adj: jnp.ndarray, add_loop: bool = True, improved: bool = False) -> jnp.ndarray:
    """Symmetric degree normalization with self-loops set (not added).

    The reference *assigns* the diagonal (`adj[:, idx, idx] = 1`,
    layers.py:139-142) rather than adding to it.
    """
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=adj.dtype)
    if add_loop:
        loop = 2.0 if improved else 1.0
        adj = adj * (1.0 - eye) + loop * eye
    deg_inv_sqrt = jnp.clip(adj.sum(axis=-1), min=1.0) ** -0.5
    return deg_inv_sqrt[..., :, None] * adj * deg_inv_sqrt[..., None, :]


@dataclass(frozen=True)
class DenseGCNConv:
    in_channels: int
    out_channels: int
    improved: bool = False
    bias: bool = True

    def init(self, key: jax.Array) -> dict:
        p = {"weight": glorot_uniform(key, (self.in_channels, self.out_channels))}
        if self.bias:
            p["bias"] = jnp.zeros((self.out_channels,), jnp.float32)
        return p

    def apply(
        self,
        params: dict,
        x: jnp.ndarray,
        adj: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        add_loop: bool = True,
    ) -> jnp.ndarray:
        """x: (B, N, F_in), adj: (B, N, N) -> (B, N, F_out)."""
        out = x @ params["weight"]
        norm = gcn_norm(adj, add_loop=add_loop, improved=self.improved)
        out = jnp.einsum("bij,bjf->bif", norm, out)
        if self.bias:
            out = out + params["bias"]
        if mask is not None:
            out = out * mask[..., :, None].astype(x.dtype)
        return out
