"""Score networks for the adjacency tensor A (graph mode).

Parity targets: ccsd/src/models/ScoreNetwork_A.py:28-561
(BaselineNetworkLayer, BaselineNetwork, ScoreNetworkA).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ccsd_tpu.models.attention import AttentionLayer
from ccsd_tpu.models.gcn import DenseGCNConv
from ccsd_tpu.models.nn import MLP
from ccsd_tpu.ops.hodge import default_mask
from ccsd_tpu.ops.masks import (
    mask_adjs,
    mask_x,
    node_feature_to_matrix,
    pow_tensor,
)


@dataclass(frozen=True)
class BaselineNetworkLayer:
    """GDSS baseline layer.  Parity: ScoreNetwork_A.py:28-140."""

    num_linears: int
    conv_input_dim: int
    conv_output_dim: int
    input_dim: int
    output_dim: int
    use_bn: bool = False

    @property
    def convs(self) -> list[DenseGCNConv]:
        return [
            DenseGCNConv(self.conv_input_dim, self.conv_output_dim)
            for _ in range(self.input_dim)
        ]

    @property
    def hidden_dim(self) -> int:
        return max(self.input_dim, self.output_dim)

    @property
    def mlp(self) -> MLP:
        return MLP(
            self.num_linears,
            self.input_dim + 2 * self.conv_output_dim,
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
            "convs": [c.init(k) for c, k in zip(self.convs, keys[: self.input_dim])],
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
        convs = self.convs
        xs = [
            convs[k].apply(params["convs"][k], x, adj[:, k])
            for k in range(self.input_dim)
        ]
        x_out = self.multi_channel.apply(
            params["multi_channel"], jnp.concatenate(xs, axis=-1)
        )
        x_out = jnp.tanh(mask_x(x_out, flags))

        x_matrix = node_feature_to_matrix(x_out)  # (B, N, N, 2F)
        mlp_in = jnp.concatenate([x_matrix, jnp.moveaxis(adj, 1, -1)], axis=-1)
        adj_out = self.mlp.apply(params["mlp"], mlp_in)
        adj_out = jnp.moveaxis(adj_out, -1, 1)
        adj_out = adj_out + jnp.swapaxes(adj_out, -1, -2)
        return x_out, mask_adjs(adj_out, flags)


def _a_layers(cls, cfg) -> list:
    """Shared first/mid/last layer-stack construction (ScoreNetwork_A.py:404-448)."""
    kw = dict(
        fused=getattr(cfg, "fused", False),
        scores_impl=getattr(cfg, "scores_impl", "mulreduce"),
        agg_impl=getattr(cfg, "agg_impl", "mulreduce"),
    )
    out = []
    for k in range(cfg.num_layers):
        if k == 0:
            out.append(
                cls(cfg.num_linears, cfg.max_feat_num, cfg.nhid, cfg.nhid,
                    cfg.c_init, cfg.c_hid, cfg.num_heads, cfg.conv, cfg.use_bn,
                    **kw)
            )
        elif k == cfg.num_layers - 1:
            out.append(
                cls(cfg.num_linears, cfg.nhid, cfg.adim, cfg.nhid,
                    cfg.c_hid, cfg.c_final, cfg.num_heads, cfg.conv, cfg.use_bn,
                    **kw)
            )
        else:
            out.append(
                cls(cfg.num_linears, cfg.nhid, cfg.adim, cfg.nhid,
                    cfg.c_hid, cfg.c_hid, cfg.num_heads, cfg.conv, cfg.use_bn,
                    **kw)
            )
    return out


@dataclass(frozen=True)
class ScoreNetworkA:
    """Adjacency score via stacked AttentionLayers.  Parity: ScoreNetwork_A.py:348-561."""

    max_feat_num: int
    max_node_num: int
    nhid: int
    num_layers: int
    num_linears: int
    c_init: int
    c_hid: int
    c_final: int
    adim: int
    num_heads: int = 4
    conv: str = "GCN"
    use_bn: bool = False
    is_cc: bool = False
    fused: bool = False  # channel-folded attention fast path (same params)
    scores_impl: str = "mulreduce"  # fused-path lowering (attention.py)
    agg_impl: str = "mulreduce"
    # final-MLP first layer over the channel concat: "concat" materializes
    # the (B, N, N, fdim) tensor like the reference; "blocksum" applies the
    # matching weight slice per adj_list block and sums (identical math, no
    # channels-last concatenate — that concat measured 36 us/eval on v5e)
    final_impl: str = "concat"

    @property
    def layers(self) -> list[AttentionLayer]:
        return _a_layers(AttentionLayer, self)

    @property
    def fdim(self) -> int:
        return self.c_hid * (self.num_layers - 1) + self.c_final + self.c_init

    @property
    def final(self) -> MLP:
        return MLP(3, self.fdim, 2 * self.fdim, 1, use_bn=self.use_bn, act="elu")

    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, self.num_layers + 1)
        return {
            "layers": [l.init(k) for l, k in zip(self.layers, keys[:-1])],
            "final": self.final.init(keys[-1]),
        }

    def apply(
        self,
        params: dict,
        x: jnp.ndarray,
        adj: jnp.ndarray,
        rank2: Optional[jnp.ndarray] = None,
        flags: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        del rank2  # CC mode ignores rank2 (ScoreNetwork_A.py:543-561)
        adjc = pow_tensor(adj, self.c_init)
        adj_list = [adjc]
        h = x
        for layer, p in zip(self.layers, params["layers"]):
            h, adjc = layer.apply(p, h, adjc, flags)
            adj_list.append(adjc)
        if self.final_impl == "blocksum":
            # first Linear of the final MLP, one weight slice per block of
            # the channel concat — avoids materializing the concatenated
            # channels-last (B, N, N, fdim) tensor
            fp = params["final"]
            w1, b1 = fp["linears"][0]["w"], fp["linears"][0]["b"]
            off, h1 = 0, b1
            for blk in adj_list:
                c = blk.shape[1]
                h1 = h1 + jnp.einsum("bcnm,ch->bnmh", blk, w1[off:off + c])
                off += c
            assert not self.use_bn, "blocksum final path assumes use_bn=False"
            act = jax.nn.elu
            hh = act(h1)
            for i, lp in enumerate(fp["linears"][1:], start=1):
                hh = hh @ lp["w"] + lp["b"]
                if i < len(fp["linears"]) - 1:
                    hh = act(hh)
            score = hh[..., 0]
        else:
            adjs = jnp.moveaxis(jnp.concatenate(adj_list, axis=1), 1, -1)
            score = self.final.apply(params["final"], adjs)[..., 0]
        score = score * default_mask(self.max_node_num)[None]
        return mask_adjs(score, flags)


@dataclass(frozen=True)
class BaselineNetwork:
    """GDSS baseline adjacency score.  Parity: ScoreNetwork_A.py:143-345."""

    max_feat_num: int
    max_node_num: int
    nhid: int
    num_layers: int
    num_linears: int
    c_init: int
    c_hid: int
    c_final: int
    adim: int  # unused, kept for config parity
    num_heads: int = 4
    conv: str = "GCN"
    use_bn: bool = False
    is_cc: bool = False

    @property
    def layers(self) -> list[BaselineNetworkLayer]:
        out = []
        for k in range(self.num_layers):
            if k == 0:
                out.append(
                    BaselineNetworkLayer(
                        self.num_linears, self.max_feat_num, self.nhid,
                        self.c_init, self.c_hid, self.use_bn)
                )
            elif k == self.num_layers - 1:
                out.append(
                    BaselineNetworkLayer(
                        self.num_linears, self.nhid, self.nhid,
                        self.c_hid, self.c_final, self.use_bn)
                )
            else:
                out.append(
                    BaselineNetworkLayer(
                        self.num_linears, self.nhid, self.nhid,
                        self.c_hid, self.c_hid, self.use_bn)
                )
        return out

    @property
    def fdim(self) -> int:
        return self.c_hid * (self.num_layers - 1) + self.c_final + self.c_init

    @property
    def final(self) -> MLP:
        return MLP(3, self.fdim, 2 * self.fdim, 1, use_bn=self.use_bn, act="elu")

    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, self.num_layers + 1)
        return {
            "layers": [l.init(k) for l, k in zip(self.layers, keys[:-1])],
            "final": self.final.init(keys[-1]),
        }

    def apply(
        self,
        params: dict,
        x: jnp.ndarray,
        adj: jnp.ndarray,
        rank2: Optional[jnp.ndarray] = None,
        flags: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        del rank2
        adjc = pow_tensor(adj, self.c_init)
        adj_list = [adjc]
        h = x
        for layer, p in zip(self.layers, params["layers"]):
            h, adjc = layer.apply(p, h, adjc, flags)
            adj_list.append(adjc)
        adjs = jnp.moveaxis(jnp.concatenate(adj_list, axis=1), 1, -1)
        score = self.final.apply(params["final"], adjs)[..., 0]
        score = score * default_mask(self.max_node_num)[None]
        return mask_adjs(score, flags)
