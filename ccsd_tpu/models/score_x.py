"""Score networks for the node-feature tensor X.

Parity targets: ccsd/src/models/ScoreNetwork_X.py:22-341
(ScoreNetworkX, ScoreNetworkX_GMH).  In CC mode the rank-2 tensor is accepted
and ignored, matching `forward_cc` (ScoreNetwork_X.py:135-153).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ccsd_tpu.models.attention import AttentionLayer
from ccsd_tpu.models.gcn import DenseGCNConv
from ccsd_tpu.models.nn import MLP
from ccsd_tpu.ops.masks import mask_x, pow_tensor


@dataclass(frozen=True)
class ScoreNetworkX:
    max_feat_num: int
    depth: int
    nhid: int
    use_bn: bool = False
    is_cc: bool = False

    @property
    def layers(self) -> list[DenseGCNConv]:
        return [
            DenseGCNConv(self.max_feat_num if k == 0 else self.nhid, self.nhid)
            for k in range(self.depth)
        ]

    @property
    def final(self) -> MLP:
        fdim = self.max_feat_num + self.depth * self.nhid
        return MLP(3, fdim, 2 * fdim, self.max_feat_num, use_bn=self.use_bn, act="elu")

    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, self.depth + 1)
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
        del rank2  # CC mode ignores the rank-2 tensor (ScoreNetwork_X.py:135-153)
        xs = [x]
        h = x
        for layer, p in zip(self.layers, params["layers"]):
            h = jnp.tanh(layer.apply(p, h, adj))
            xs.append(h)
        out = self.final.apply(params["final"], jnp.concatenate(xs, axis=-1))
        return mask_x(out, flags)


@dataclass(frozen=True)
class ScoreNetworkX_GMH:
    max_feat_num: int
    depth: int
    nhid: int
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

    @property
    def layers(self) -> list[AttentionLayer]:
        kw = dict(fused=self.fused, scores_impl=self.scores_impl,
                  agg_impl=self.agg_impl)
        out = []
        for k in range(self.depth):
            if k == 0:
                out.append(
                    AttentionLayer(
                        self.num_linears, self.max_feat_num, self.nhid, self.nhid,
                        self.c_init, self.c_hid, self.num_heads, self.conv, self.use_bn,
                        **kw,
                    )
                )
            elif k == self.depth - 1:
                out.append(
                    AttentionLayer(
                        self.num_linears, self.nhid, self.adim, self.nhid,
                        self.c_hid, self.c_final, self.num_heads, self.conv, self.use_bn,
                        **kw,
                    )
                )
            else:
                out.append(
                    AttentionLayer(
                        self.num_linears, self.nhid, self.adim, self.nhid,
                        self.c_hid, self.c_hid, self.num_heads, self.conv, self.use_bn,
                        **kw,
                    )
                )
        return out

    @property
    def final(self) -> MLP:
        fdim = self.max_feat_num + self.depth * self.nhid
        return MLP(3, fdim, 2 * fdim, self.max_feat_num, use_bn=self.use_bn, act="elu")

    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, self.depth + 1)
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
        xs = [x]
        h = x
        for layer, p in zip(self.layers, params["layers"]):
            h, adjc = layer.apply(p, h, adjc, flags)
            h = jnp.tanh(h)
            xs.append(h)
        out = self.final.apply(params["final"], jnp.concatenate(xs, axis=-1))
        return mask_x(out, flags)
