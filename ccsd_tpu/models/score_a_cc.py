"""Adjacency score networks in the higher-order (CC) domain.

Parity targets: ccsd/src/models/ScoreNetwork_A_CC.py:20-332 (ScoreNetworkA_CC)
and ScoreNetwork_A_Base_CC.py:21-323 (ScoreNetworkA_Base_CC).
Both combine a graph branch (AttentionLayer stack over adjacency powers) with
a Hodge branch operating on the E x E dual of those powers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ccsd_tpu.models.attention import AttentionLayer
from ccsd_tpu.models.hodge_nn import HodgeAdjAttentionLayer, HodgeBaselineLayer
from ccsd_tpu.models.nn import MLP
from ccsd_tpu.ops.cells import get_spec
from ccsd_tpu.ops.hodge import adj_to_hodgedual, default_mask, hodgedual_to_adj
from ccsd_tpu.ops.masks import mask_adjs, pow_tensor


def _graph_layers(cfg) -> list[AttentionLayer]:
    fused = getattr(cfg, "fused", False)
    out = []
    for k in range(cfg.num_layers):
        if k == 0:
            out.append(AttentionLayer(
                cfg.num_linears, cfg.max_feat_num, cfg.nhid, cfg.nhid,
                cfg.c_init, cfg.c_hid, cfg.num_heads, cfg.conv, cfg.use_bn,
                fused=fused))
        elif k == cfg.num_layers - 1:
            out.append(AttentionLayer(
                cfg.num_linears, cfg.nhid, cfg.adim, cfg.nhid,
                cfg.c_hid, cfg.c_final, cfg.num_heads, cfg.conv, cfg.use_bn,
                fused=fused))
        else:
            out.append(AttentionLayer(
                cfg.num_linears, cfg.nhid, cfg.adim, cfg.nhid,
                cfg.c_hid, cfg.c_hid, cfg.num_heads, cfg.conv, cfg.use_bn,
                fused=fused))
    return out


@dataclass(frozen=True)
class ScoreNetworkA_CC:
    max_feat_num: int
    max_node_num: int
    d_min: int
    d_max: int
    nhid: int
    nhid_h: int
    num_layers: int
    num_layers_h: int
    num_linears: int
    num_linears_h: int
    c_init: int
    c_hid: int
    c_hid_h: int
    c_final: int
    c_final_h: int
    adim: int
    adim_h: int
    num_heads: int = 4
    num_heads_h: int = 4
    conv: str = "GCN"
    conv_hodge: str = "HCN"
    use_bn: bool = False
    is_cc: bool = True
    cells: tuple = None  # optional active-cell universe (tuple of node tuples)
    fused: bool = False  # channel-folded attention fast path (same params)

    @property
    def spec(self):
        return get_spec(self.max_node_num, self.d_min, self.d_max, self.cells)

    @property
    def layers(self) -> list[AttentionLayer]:
        return _graph_layers(self)

    @property
    def layers_hodge(self) -> list[HodgeAdjAttentionLayer]:
        out = []
        for k in range(self.num_layers_h):
            if k == 0:
                out.append(HodgeAdjAttentionLayer(
                    self.num_linears_h, self.c_init, self.nhid_h, self.c_hid_h,
                    self.spec, self.num_heads_h, self.conv_hodge, self.use_bn))
            elif k == self.num_layers_h - 1:
                out.append(HodgeAdjAttentionLayer(
                    self.num_linears_h, self.c_hid_h, self.adim_h, self.c_final_h,
                    self.spec, self.num_heads_h, self.conv_hodge, self.use_bn))
            else:
                out.append(HodgeAdjAttentionLayer(
                    self.num_linears_h, self.c_hid_h, self.adim_h, self.c_hid_h,
                    self.spec, self.num_heads_h, self.conv_hodge, self.use_bn))
        return out

    @property
    def fdim(self) -> int:
        return (
            self.c_hid * (self.num_layers - 1) + self.c_final + self.c_init
            + self.c_hid_h * (self.num_layers_h - 1) + self.c_final_h + self.c_init
        )

    @property
    def final(self) -> MLP:
        return MLP(3, self.fdim, 2 * self.fdim, 1, use_bn=self.use_bn, act="elu")

    def init(self, key: jax.Array) -> dict:
        gl, hl = self.layers, self.layers_hodge
        keys = jax.random.split(key, len(gl) + len(hl) + 1)
        return {
            "layers": [l.init(k) for l, k in zip(gl, keys[: len(gl)])],
            "layers_hodge": [
                l.init(k) for l, k in zip(hl, keys[len(gl):len(gl) + len(hl)])
            ],
            "final": self.final.init(keys[-1]),
        }

    def apply(
        self,
        params: dict,
        x: jnp.ndarray,
        adj: jnp.ndarray,
        rank2: jnp.ndarray,
        flags: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        # dtype-following: under the bf16 sampling mode (solvers.carry_dtype)
        # the E x E hodge-dual channel tensors are the model's big streams —
        # keeping them in the input dtype halves the HBM traffic
        dt = rank2.dtype
        if dt != jnp.float32:
            params = jax.tree_util.tree_map(lambda a: a.astype(dt), params)
            x = x.astype(dt)
            adj = adj.astype(dt)
        adjc = pow_tensor(adj, self.c_init)
        hodge_adjc = adj_to_hodgedual(adjc)

        adj_list = [adjc]
        h = x
        for layer, p in zip(self.layers, params["layers"]):
            h, adjc = layer.apply(p, h, adjc, flags)
            adj_list.append(adjc)

        hodge_adj_list = [hodge_adjc]
        r = rank2
        for layer, p in zip(self.layers_hodge, params["layers_hodge"]):
            hodge_adjc, r = layer.apply(p, hodge_adjc, r, flags)
            hodge_adj_list.append(hodge_adjc)

        adjs = jnp.moveaxis(jnp.concatenate(adj_list, axis=1), 1, -1)
        hodge_adjs = jnp.concatenate(hodge_adj_list, axis=1)
        adj_hodge = jnp.moveaxis(hodgedual_to_adj(hodge_adjs), 1, -1)
        out = jnp.concatenate([adjs, adj_hodge], axis=-1)
        score = self.final.apply(params["final"], out)[..., 0]
        score = score * default_mask(self.max_node_num)[None].astype(score.dtype)
        return mask_adjs(score, flags)


@dataclass(frozen=True)
class ScoreNetworkA_Base_CC:
    """Ablation variant with HodgeBaselineLayer.  Parity: ScoreNetwork_A_Base_CC.py."""

    max_feat_num: int
    max_node_num: int
    d_min: int
    d_max: int
    nhid: int
    nhid_h: int
    num_layers: int
    num_layers_h: int
    num_linears: int
    num_linears_h: int
    c_init: int
    c_hid: int
    c_hid_h: int
    c_final: int
    c_final_h: int
    adim: int
    hidden_h: int
    num_heads: int = 4
    conv: str = "GCN"
    use_bn: bool = False
    is_cc: bool = True
    cells: tuple = None  # optional active-cell universe (tuple of node tuples)
    fused: bool = False  # channel-folded attention fast path (same params)

    @property
    def spec(self):
        return get_spec(self.max_node_num, self.d_min, self.d_max, self.cells)

    @property
    def layers(self) -> list[AttentionLayer]:
        return _graph_layers(self)

    @property
    def layers_hodge(self) -> list[HodgeBaselineLayer]:
        out = []
        for k in range(self.num_layers_h):
            if k == 0:
                out.append(HodgeBaselineLayer(
                    self.num_linears_h, self.c_init, self.nhid_h, self.c_hid_h,
                    self.spec, self.use_bn))
            elif k == self.num_layers_h - 1:
                out.append(HodgeBaselineLayer(
                    self.num_linears_h, self.c_hid_h, self.hidden_h, self.c_final_h,
                    self.spec, self.use_bn))
            else:
                out.append(HodgeBaselineLayer(
                    self.num_linears_h, self.c_hid_h, self.hidden_h, self.c_hid_h,
                    self.spec, self.use_bn))
        return out

    @property
    def fdim(self) -> int:
        return (
            self.c_hid * (self.num_layers - 1) + self.c_final + self.c_init
            + self.c_hid_h * (self.num_layers_h - 1) + self.c_final_h + self.c_init
        )

    @property
    def final(self) -> MLP:
        return MLP(3, self.fdim, 2 * self.fdim, 1, use_bn=self.use_bn, act="elu")

    def init(self, key: jax.Array) -> dict:
        gl, hl = self.layers, self.layers_hodge
        keys = jax.random.split(key, len(gl) + len(hl) + 1)
        return {
            "layers": [l.init(k) for l, k in zip(gl, keys[: len(gl)])],
            "layers_hodge": [
                l.init(k) for l, k in zip(hl, keys[len(gl):len(gl) + len(hl)])
            ],
            "final": self.final.init(keys[-1]),
        }

    def apply(
        self,
        params: dict,
        x: jnp.ndarray,
        adj: jnp.ndarray,
        rank2: jnp.ndarray,
        flags: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        dt = rank2.dtype
        if dt != jnp.float32:
            params = jax.tree_util.tree_map(lambda a: a.astype(dt), params)
            x = x.astype(dt)
            adj = adj.astype(dt)
        adjc = pow_tensor(adj, self.c_init)
        hodge_adjc = adj_to_hodgedual(adjc)

        adj_list = [adjc]
        h = x
        for layer, p in zip(self.layers, params["layers"]):
            h, adjc = layer.apply(p, h, adjc, flags)
            adj_list.append(adjc)

        hodge_adj_list = [hodge_adjc]
        r = rank2
        for layer, p in zip(self.layers_hodge, params["layers_hodge"]):
            hodge_adjc, r = layer.apply(p, hodge_adjc, r, flags)
            hodge_adj_list.append(hodge_adjc)

        adjs = jnp.moveaxis(jnp.concatenate(adj_list, axis=1), 1, -1)
        hodge_adjs = jnp.concatenate(hodge_adj_list, axis=1)
        adj_hodge = jnp.moveaxis(hodgedual_to_adj(hodge_adjs), 1, -1)
        out = jnp.concatenate([adjs, adj_hodge], axis=-1)
        score = self.final.apply(params["final"], out)[..., 0]
        score = score * default_mask(self.max_node_num)[None].astype(score.dtype)
        return mask_adjs(score, flags)
