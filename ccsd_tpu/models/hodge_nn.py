"""Hodge-domain layers: HCN convolution and HCCMH attention on the E x E dual.

Parity targets: ccsd/src/models/hodge_layers.py:17-416 and
hodge_attention.py:18-325.  Every layer takes the static
:class:`~ccsd_tpu.ops.cells.ComplexSpec` so flag masking is loop-free.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ccsd_tpu.models.nn import MLP, glorot_uniform
from ccsd_tpu.ops.cells import ComplexSpec
from ccsd_tpu.ops.masks import mask_hodge_adjs, mask_rank2


@dataclass(frozen=True)
class HodgeNetworkLayer:
    """Channels-last MLP over rank-2 channels.  Parity: hodge_layers.py:17-111."""

    num_linears: int
    input_dim: int
    nhid: int
    output_dim: int
    spec: ComplexSpec
    use_bn: bool = False

    @property
    def layer(self) -> MLP:
        return MLP(self.num_linears, self.input_dim, self.nhid, self.output_dim,
                   use_bn=self.use_bn, act="elu")

    def init(self, key: jax.Array) -> dict:
        return {"layer": self.layer.init(key)}

    def apply(
        self, params: dict, rank2: jnp.ndarray, flags: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        """rank2: (B, C_i, E, K) -> (B, C_o, E, K)."""
        h = jnp.moveaxis(rank2, 1, -1)
        h = self.layer.apply(params["layer"], h)
        h = jnp.moveaxis(h, -1, 1)
        return mask_rank2(h, self.spec, flags)


@dataclass(frozen=True)
class DenseHCNConv:
    """Hodge convolution: deg-normalized (E x E) adjacency times (F W).

    Parity: hodge_layers.py:114-199 (weight stored (in, out) like the
    reference Parameter).
    """

    in_channels: int
    out_channels: int
    bias: bool = True

    def init(self, key: jax.Array) -> dict:
        p = {"weight": glorot_uniform(key, (self.in_channels, self.out_channels))}
        if self.bias:
            p["bias"] = jnp.zeros((self.out_channels,), jnp.float32)
        return p

    def apply(
        self,
        params: dict,
        hodge_adj: jnp.ndarray,
        rank2: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """hodge_adj: (B, E, E), rank2: (B, E, K_in) -> (B, E, out)."""
        out = rank2 @ params["weight"]
        deg_inv_sqrt = jnp.clip(hodge_adj.sum(axis=-1), min=1.0) ** -0.5
        norm = deg_inv_sqrt[..., :, None] * hodge_adj * deg_inv_sqrt[..., None, :]
        out = jnp.einsum("bef,bfk->bek", norm, out)
        if self.bias:
            out = out + params["bias"]
        if mask is not None:
            out = out * mask[..., :, None].astype(out.dtype)
        return out


@dataclass(frozen=True)
class HodgeAttention:
    """HCCMH attention on the Hodge dual.  Parity: hodge_attention.py:18-183.

    V = hodge_adj @ rank2 (the reference's ccnn_v is Identity,
    hodge_attention.py:107, 164).
    """

    in_dim: int  # K
    attn_dim: int
    out_dim: int  # K
    num_heads: int = 4
    conv: str = "HCN"

    def _qk(self):
        if self.conv == "HCN":
            q = DenseHCNConv(self.in_dim, self.attn_dim)
            k = DenseHCNConv(self.in_dim, self.attn_dim)
        elif self.conv == "MLP":
            q = MLP(2, self.in_dim, 2 * self.attn_dim, self.attn_dim, act="tanh")
            k = MLP(2, self.in_dim, 2 * self.attn_dim, self.attn_dim, act="tanh")
        else:
            raise NotImplementedError(f"Convolution layer {self.conv} not implemented.")
        return q, k

    def init(self, key: jax.Array) -> dict:
        q, k = self._qk()
        kq, kk = jax.random.split(key)
        return {"q": q.init(kq), "k": k.init(kk)}

    def apply(
        self,
        params: dict,
        hodge_adj: jnp.ndarray,
        rank2: jnp.ndarray,
        flags: Optional[jnp.ndarray],
        attention_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        qm, km = self._qk()
        if self.conv == "HCN":
            Q = qm.apply(params["q"], hodge_adj, rank2)
            K = km.apply(params["k"], hodge_adj, rank2)
        else:
            Q = qm.apply(params["q"], hodge_adj)
            K = km.apply(params["k"], hodge_adj)
        V = jnp.einsum("bef,bfk->bek", hodge_adj, rank2)

        B, E, _ = Q.shape
        ds = self.attn_dim // self.num_heads
        if ds == 0 or self.attn_dim % ds:
            raise ValueError(
                f"attn_dim={self.attn_dim} not splittable into equal chunks"
            )
        H = self.attn_dim // ds
        Qh = jnp.moveaxis(Q.reshape(B, E, H, ds), 2, 0)
        Kh = jnp.moveaxis(K.reshape(B, E, H, ds), 2, 0)
        scores = jnp.einsum("hbnd,hbmd->hbnm", Qh, Kh) / math.sqrt(self.out_dim)
        if attention_mask is not None:
            scores = attention_mask[None] + scores
        A = jnp.tanh(scores).mean(axis=0)
        A = (A + jnp.swapaxes(A, -1, -2)) / 2
        return V, A


@dataclass(frozen=True)
class HodgeAdjAttentionLayer:
    """Per-channel HodgeAttention + channel MLP heads.

    Parity: hodge_attention.py:185-325.
    """

    num_linears: int
    input_dim: int  # C_i
    attn_dim: int
    conv_output_dim: int  # C_o
    spec: ComplexSpec
    num_heads: int = 4
    conv: str = "HCN"
    use_bn: bool = False

    @property
    def attn(self) -> HodgeAttention:
        K = self.spec.num_cells
        return HodgeAttention(K, self.attn_dim, K, num_heads=self.num_heads,
                              conv=self.conv)

    @property
    def hidden_dim(self) -> int:
        return 2 * max(self.input_dim, self.conv_output_dim)

    @property
    def mlp_value(self) -> MLP:
        return MLP(self.num_linears, self.input_dim, self.hidden_dim, 1,
                   use_bn=self.use_bn, act="elu")

    @property
    def mlp_attention(self) -> MLP:
        return MLP(self.num_linears, self.input_dim, self.hidden_dim,
                   self.conv_output_dim, use_bn=self.use_bn, act="elu")

    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, self.input_dim + 2)
        return {
            "attn": [self.attn.init(k) for k in keys[: self.input_dim]],
            "mlp_value": self.mlp_value.init(keys[-2]),
            "mlp_attention": self.mlp_attention.init(keys[-1]),
        }

    def apply(
        self,
        params: dict,
        hodge_adj: jnp.ndarray,
        rank2: jnp.ndarray,
        flags: Optional[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """hodge_adj: (B, C_i, E, E), rank2: (B, E, K) ->
        ((B, C_o, E, E), (B, E, K))."""
        values, attns = [], []
        for k in range(self.input_dim):
            v, a = self.attn.apply(params["attn"][k], hodge_adj[:, k], rank2, flags)
            values.append(v)
            attns.append(a)
        h = self.mlp_attention.apply(params["mlp_attention"], jnp.stack(attns, -1))
        h = mask_hodge_adjs(jnp.moveaxis(h, -1, 1), self.spec, flags)
        h = jnp.tanh(h)
        hodge_adj_out = h + jnp.swapaxes(h, -1, -2)

        r = self.mlp_value.apply(params["mlp_value"], jnp.stack(values, -1))[..., 0]
        rank2_out = mask_rank2(r, self.spec, flags)
        return hodge_adj_out, rank2_out


@dataclass(frozen=True)
class BaselineBlock:
    """MLP over Hodge-adjacency rows, bmm'd with rank2.

    Parity: hodge_layers.py:202-284.
    """

    in_dim: int
    hidden_dim: int
    out_dim: int

    @property
    def mlp_layer(self) -> MLP:
        return MLP(2, self.in_dim, self.hidden_dim, self.out_dim, act="elu")

    def init(self, key: jax.Array) -> dict:
        return {"mlp_layer": self.mlp_layer.init(key)}

    def apply(
        self,
        params: dict,
        hodge_adj: jnp.ndarray,
        rank2: jnp.ndarray,
        flags: Optional[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = jnp.tanh(self.mlp_layer.apply(params["mlp_layer"], hodge_adj))
        rank2_out = jnp.einsum("bef,bfk->bek", h, rank2)
        hodge_adj_out = (h + jnp.swapaxes(h, -1, -2)) / 2
        return rank2_out, hodge_adj_out


@dataclass(frozen=True)
class HodgeBaselineLayer:
    """Ablation layer for ScoreNetworkA_Base_CC.  Parity: hodge_layers.py:287-416."""

    num_linears: int
    input_dim: int  # C_i, one BaselineBlock each
    hidden_dim: int
    conv_output_dim: int  # C_o
    spec: ComplexSpec
    use_bn: bool = False

    @property
    def block(self) -> BaselineBlock:
        E = self.spec.num_edges
        return BaselineBlock(E, self.hidden_dim, E)

    @property
    def hidden_dim_mlp(self) -> int:
        return 2 * max(self.input_dim, self.conv_output_dim)

    @property
    def mlp_rank2(self) -> MLP:
        return MLP(self.num_linears, self.input_dim, self.hidden_dim_mlp, 1,
                   use_bn=self.use_bn, act="elu")

    @property
    def mlp_hodge(self) -> MLP:
        return MLP(self.num_linears, self.input_dim, self.hidden_dim_mlp,
                   self.conv_output_dim, use_bn=self.use_bn, act="elu")

    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, self.input_dim + 2)
        return {
            "layers": [self.block.init(k) for k in keys[: self.input_dim]],
            "mlp_rank2": self.mlp_rank2.init(keys[-2]),
            "mlp_hodge": self.mlp_hodge.init(keys[-1]),
        }

    def apply(
        self,
        params: dict,
        hodge_adj: jnp.ndarray,
        rank2: jnp.ndarray,
        flags: Optional[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        rank2_list, hodge_list = [], []
        for k in range(self.input_dim):
            r, h = self.block.apply(params["layers"][k], hodge_adj[:, k], rank2, flags)
            rank2_list.append(r)
            hodge_list.append(h)
        h = self.mlp_hodge.apply(params["mlp_hodge"], jnp.stack(hodge_list, -1))
        h = mask_hodge_adjs(jnp.moveaxis(h, -1, 1), self.spec, flags)
        h = jnp.tanh(h)
        hodge_adj_out = h + jnp.swapaxes(h, -1, -2)

        r = self.mlp_rank2.apply(params["mlp_rank2"], jnp.stack(rank2_list, -1))[..., 0]
        rank2_out = mask_rank2(r, self.spec, flags)
        return hodge_adj_out, rank2_out
