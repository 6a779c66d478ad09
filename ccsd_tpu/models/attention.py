"""Graph multi-head (GMH) attention over adjacency channels.

Parity targets: ccsd/src/models/attention.py:21-183 (Attention) and
:186-304 (AttentionLayer).  The torch head trick
``torch.cat(Q.split(ds, 2), 0)`` + bmm is re-expressed as one einsum over a
head axis — identical numerics, one fused MXU contraction instead of H
strided bmms.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ccsd_tpu.models.gcn import DenseGCNConv
from ccsd_tpu.models.nn import MLP
from ccsd_tpu.ops.masks import mask_adjs, mask_x


@dataclass(frozen=True)
class Attention:
    """Single GMH attention: returns (value, symmetrized attention map)."""

    in_dim: int
    attn_dim: int
    out_dim: int
    num_heads: int = 4
    conv: str = "GCN"

    @property
    def head_dim(self) -> int:
        """torch `Q.split(attn_dim // num_heads, 2)` chunk size; the effective
        head count is attn_dim // head_dim (== num_heads when divisible)."""
        ds = self.attn_dim // self.num_heads
        if ds == 0 or self.attn_dim % ds:
            raise ValueError(
                f"attn_dim={self.attn_dim} not splittable into equal chunks of "
                f"attn_dim // num_heads = {ds}"
            )
        return ds

    def _qkv(self):
        if self.conv == "GCN":
            q = DenseGCNConv(self.in_dim, self.attn_dim)
            k = DenseGCNConv(self.in_dim, self.attn_dim)
        elif self.conv == "MLP":
            q = MLP(2, self.in_dim, 2 * self.attn_dim, self.attn_dim, act="tanh")
            k = MLP(2, self.in_dim, 2 * self.attn_dim, self.attn_dim, act="tanh")
        else:
            raise NotImplementedError(f"Convolution layer {self.conv} not implemented.")
        v = DenseGCNConv(self.in_dim, self.out_dim)
        return q, k, v

    def init(self, key: jax.Array) -> dict:
        q, k, v = self._qkv()
        kq, kk, kv = jax.random.split(key, 3)
        return {"q": q.init(kq), "k": k.init(kk), "v": v.init(kv)}

    def apply(
        self,
        params: dict,
        x: jnp.ndarray,
        adj: jnp.ndarray,
        flags: Optional[jnp.ndarray],
        attention_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        qm, km, vm = self._qkv()
        if self.conv == "GCN":
            Q = qm.apply(params["q"], x, adj)
            K = km.apply(params["k"], x, adj)
        else:
            Q = qm.apply(params["q"], x)
            K = km.apply(params["k"], x)
        V = vm.apply(params["v"], x, adj)

        B, N, _ = Q.shape
        ds = self.head_dim
        H = self.attn_dim // ds
        # (B, N, H*ds) -> (H, B, N, ds); head h = channels [h*ds:(h+1)*ds],
        # matching torch's split/cat along the batch dim (attention.py:112-113).
        Qh = jnp.moveaxis(Q.reshape(B, N, H, ds), 2, 0)
        Kh = jnp.moveaxis(K.reshape(B, N, H, ds), 2, 0)
        scores = jnp.einsum("hbnd,hbmd->hbnm", Qh, Kh) / math.sqrt(self.out_dim)
        if attention_mask is not None:
            scores = attention_mask[None] + scores
        A = jnp.tanh(scores)
        A = A.mean(axis=0)  # head mean  (attention.py:128-129)
        A = (A + jnp.swapaxes(A, -1, -2)) / 2  # symmetrize
        return V, A


@dataclass(frozen=True)
class AttentionLayer:
    """Per-channel GMH attention + node/edge MLP heads.

    Parity: ccsd/src/models/attention.py:186-304.
    """

    num_linears: int
    conv_input_dim: int
    attn_dim: int
    conv_output_dim: int
    input_dim: int  # number of adjacency channels C_i (one Attention each)
    output_dim: int  # C_o
    num_heads: int = 4
    conv: str = "GCN"
    use_bn: bool = False

    @property
    def attn(self) -> Attention:
        return Attention(
            self.conv_input_dim,
            self.attn_dim,
            self.conv_output_dim,
            num_heads=self.num_heads,
            conv=self.conv,
        )

    @property
    def hidden_dim(self) -> int:
        return 2 * max(self.input_dim, self.output_dim)

    @property
    def mlp(self) -> MLP:
        return MLP(
            self.num_linears,
            2 * self.input_dim,
            self.hidden_dim,
            self.output_dim,
            use_bn=self.use_bn,
            act="elu",
        )

    @property
    def multi_channel(self) -> MLP:
        return MLP(
            2,
            self.input_dim * self.conv_output_dim,
            self.hidden_dim,
            self.conv_output_dim,
            use_bn=self.use_bn,
            act="elu",
        )

    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, self.input_dim + 2)
        return {
            "attn": [self.attn.init(k) for k in keys[: self.input_dim]],
            "mlp": self.mlp.init(keys[-2]),
            "multi_channel": self.multi_channel.init(keys[-1]),
        }

    def apply(
        self,
        params: dict,
        x: jnp.ndarray,
        adj: jnp.ndarray,
        flags: Optional[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, N, F_i), adj: (B, C_i, N, N) -> ((B, N, F_o), (B, C_o, N, N)).

        Note: a channel-vmapped variant (stacked params + one batched call)
        was benchmarked and is SLOWER than this unrolled loop at CCSD shapes
        (568 vs 636 sampler steps/s at B=128) — XLA already fuses the
        unrolled channels well; see DESIGN_NOTES.md.
        """
        vs, masks = [], []
        for k in range(self.input_dim):
            v, m = self.attn.apply(params["attn"][k], x, adj[:, k], flags)
            vs.append(v)
            masks.append(m)
        x_out = self.multi_channel.apply(
            params["multi_channel"], jnp.concatenate(vs, axis=-1)
        )
        x_out = jnp.tanh(mask_x(x_out, flags))

        # channels-last concat of [attention maps | input adj channels]
        mlp_in = jnp.concatenate(
            [jnp.stack(masks, axis=-1), jnp.moveaxis(adj, 1, -1)], axis=-1
        )
        adj_out = self.mlp.apply(params["mlp"], mlp_in)
        adj_out = jnp.moveaxis(adj_out, -1, 1)
        adj_out = adj_out + jnp.swapaxes(adj_out, -1, -2)
        return x_out, mask_adjs(adj_out, flags)
