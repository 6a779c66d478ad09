"""Score network for the rank-2 incidence tensor F.

Parity target: ccsd/src/models/ScoreNetwork_F.py:24-217.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ccsd_tpu.models.hodge_nn import HodgeNetworkLayer
from ccsd_tpu.models.nn import MLP
from ccsd_tpu.ops.cells import get_spec
from ccsd_tpu.ops.hodge import default_mask, pow_tensor_cc
from ccsd_tpu.ops.masks import mask_rank2


def linear_slabs(lin_params: dict, slabs: list) -> list:
    """Channel Linear over a python list of (B, E, K) slabs: unrolled into
    scalar-weight multiply-adds so XLA fuses everything elementwise (no
    (B, C, E, K) tensor ever hits HBM)."""
    w, b = lin_params["w"], lin_params["b"]
    outs = []
    for o in range(w.shape[1]):
        acc = b[o]
        for c, s in enumerate(slabs):
            acc = acc + w[c, o] * s
        outs.append(acc)
    return outs


def mlp_slabs(mlp: "MLP", mlp_params: dict, slabs: list) -> list:
    """MLP over channel slabs (see linear_slabs)."""
    from ccsd_tpu.models.nn import ACT

    lins = mlp_params["linears"]
    act = ACT[mlp.act]
    h = slabs
    for i, lp in enumerate(lins):
        h = linear_slabs(lp, h)
        if i < len(lins) - 1:
            h = [act(s) for s in h]
    return h


@dataclass(frozen=True)
class ScoreNetworkF:
    num_layers_mlp: int
    num_layers: int
    num_linears: int
    nhid: int
    c_hid: int
    c_final: int
    cnum: int
    max_node_num: int
    d_min: int
    d_max: int
    use_hodge_mask: bool = True
    use_bn: bool = False
    is_cc: bool = True
    cells: tuple = None  # optional active-cell universe (tuple of node tuples)
    fused: bool = False  # slab-unrolled fast path (same params/numerics)

    @property
    def spec(self):
        return get_spec(self.max_node_num, self.d_min, self.d_max, self.cells)

    @property
    def layers(self) -> list[HodgeNetworkLayer]:
        out = []
        for k in range(self.num_layers):
            cin = self.cnum if k == 0 else self.c_hid
            cout = self.c_final if k == self.num_layers - 1 else self.c_hid
            out.append(
                HodgeNetworkLayer(self.num_linears, cin, self.nhid, cout,
                                  self.spec, self.use_bn)
            )
        return out

    @property
    def fdim(self) -> int:
        return self.c_hid * (self.num_layers - 1) + self.c_final + self.cnum

    @property
    def final(self) -> MLP:
        return MLP(self.num_layers_mlp, self.fdim, 2 * self.fdim, 1,
                   use_bn=self.use_bn, act="elu")

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
        rank2: jnp.ndarray,
        flags: Optional[jnp.ndarray] = None,
        dyn: Optional[tuple] = None,
    ) -> jnp.ndarray:
        del x, adj  # F-score depends on the rank-2 tensor only
        if dyn is not None:
            # per-sample candidate-cell universe (two-stage open-universe
            # sampling) — only supported through the fused slab path
            return self._apply_fused(params, rank2, flags, dyn)
        if self.fused:
            return self._apply_fused(params, rank2, flags)
        hodge_mask = (
            default_mask(self.spec.num_edges) if self.use_hodge_mask else None
        )
        rank2c = pow_tensor_cc(rank2, self.cnum, hodge_mask)

        rank2_list = [rank2c]
        h = rank2c
        for layer, p in zip(self.layers, params["layers"]):
            h = layer.apply(p, h, flags)
            rank2_list.append(h)

        feats = jnp.moveaxis(jnp.concatenate(rank2_list, axis=1), 1, -1)
        score = self.final.apply(params["final"], feats)[..., 0]
        # reference multiplies by an all-ones (rows, cols) mask here — a no-op
        # (ScoreNetwork_F.py:142, 211-212)
        return mask_rank2(score, self.spec, flags)

    def _apply_fused(self, params, rank2, flags, dyn=None):
        """Slab-unrolled fast path: identical math, radically less HBM traffic.

        The default path materializes (B, C, E, K) channel tensors and
        channels-last copies around every tiny channel-MLP — at
        community_small_CC shapes (E=190, K=1140, B=128) that is multiple
        GB of traffic per eval for a network whose channel dims are <= 12.
        Here the channel axis is a PYTHON LIST of (B, E, K) slabs and every
        channel Linear is unrolled into scalar-weight multiply-adds, so XLA
        fuses the whole post-Hodge network into a few elementwise passes
        with no (B, C, E, K) tensor ever written to HBM.  Measured ~7x on
        TPU v5e (DESIGN_NOTES.md).
        """
        from ccsd_tpu.ops.hodge import hodge_laplacian
        from ccsd_tpu.ops.masks import mask_rank2_dynamic

        spec = self.spec
        # dtype-following: when the sampler feeds bf16 rank-2 tensors
        # (solvers.get_pc_sampler carry_dtype), run the whole slab network in
        # bf16 — at (B, E, K) sizes the path is HBM-bound, so keeping any f32
        # intermediate doubles the traffic (tools/profile_cc_sampler.py)
        dt = rank2.dtype
        if dt != jnp.float32:
            params = jax.tree_util.tree_map(lambda a: a.astype(dt), params)
        if dyn is not None:
            member, valid = dyn
            mask = lambda s: mask_rank2_dynamic(s, spec, member, valid, flags)
        else:
            mask = lambda s: mask_rank2(s, spec, flags)

        H = hodge_laplacian(rank2)
        if self.use_hodge_mask:
            H = H * default_mask(spec.num_edges)[None].astype(dt)
        slabs = [rank2]
        for _ in range(self.cnum - 1):
            slabs.append(jnp.einsum("bef,bfk->bek", H, slabs[-1]))

        rank2_list = list(slabs)
        h = slabs
        for layer, p in zip(self.layers, params["layers"]):
            h = mlp_slabs(layer.layer, p["layer"], h)
            h = [mask(s) for s in h]
            rank2_list.extend(h)

        score = mlp_slabs(self.final, params["final"], rank2_list)[0]
        return mask(score)
