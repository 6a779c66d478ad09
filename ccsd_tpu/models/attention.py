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
    fused: bool = False  # channel-folded fast path (identical numerics)
    # lowering choices for the two hot contractions of the fused path
    # (same math; see tools/fastpath_probe.py for on-chip measurements):
    #   scores_impl: "mulreduce" (VPU broadcast-multiply-reduce) | "dot"
    #                (batched MXU dot via einsum) | "dot_bf16"
    #   agg_impl:    "mulreduce" | "dot" | "dot_bf16"
    scores_impl: str = "mulreduce"
    agg_impl: str = "mulreduce"

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

        Two execution paths, same params, same numerics:
        * unrolled (default): one Attention.apply per channel.  A naively
          channel-vmapped variant was benchmarked SLOWER than this at CCSD
          shapes (568 vs 636 sampler steps/s at B=128).
        * fused=True: channel-folded — Q|K|V weights of all C channels are
          stacked so the whole layer is ~10 large ops instead of ~7*C small
          ones.  At sampler shapes (B=128, N=20) the per-op dispatch floor
          dominates, so fewer/bigger ops is the main throughput lever
          (DESIGN_NOTES.md).
        """
        if self.fused:
            x_out, att = self._fused_attention(params, x, adj, flags)
        else:
            vs, masks = [], []
            for k in range(self.input_dim):
                v, m = self.attn.apply(params["attn"][k], x, adj[:, k], flags)
                vs.append(v)
                masks.append(m)
            x_out = self.multi_channel.apply(
                params["multi_channel"], jnp.concatenate(vs, axis=-1)
            )
            att = jnp.stack(masks, axis=-1)  # (B, N, N, C_i)
        x_out = jnp.tanh(mask_x(x_out, flags))

        # channels-last concat of [attention maps | input adj channels]
        mlp_in = jnp.concatenate([att, jnp.moveaxis(adj, 1, -1)], axis=-1)
        adj_out = self.mlp.apply(params["mlp"], mlp_in)
        adj_out = jnp.moveaxis(adj_out, -1, 1)
        adj_out = adj_out + jnp.swapaxes(adj_out, -1, -2)
        return x_out, mask_adjs(adj_out, flags)

    def _fused_attention(self, params, x, adj, flags):
        """All C_i per-channel GMH attentions as stacked contractions.

        Returns (x_out-before-tanh/mask, attention maps (B, N, N, C_i)).
        Weight stacking happens at trace time from the canonical per-channel
        param layout; when called outside a `lax.scan` body (the score_fn
        closure is built once per sampler program) XLA hoists the stacks out
        of the hot loop.

        TPU-tuned contractions (profiled on v5e at sampler shapes, B=128
        N=20 — see DESIGN_NOTES.md):
        * aggregation uses ``(norm @ x) @ W`` instead of ``norm @ (x @ W)``
          (3x fewer FLOPs in the batched per-channel contraction, and the
          weight contraction becomes ONE block-diagonal MXU matmul);
        * the batched (B*C) and (B*C*H) contractions are expressed as
          broadcast-multiply-reduce, which XLA fuses on the VPU without the
          layout-relayout copies its batched-dot lowering inserts (those
          copies were ~45% of the model's runtime).
        """
        from ccsd_tpu.models.gcn import gcn_norm

        def agg(norm, x):
            # nx[b,c,n,f] = sum_m norm[b,c,n,m] x[b,m,f]
            if self.agg_impl == "mulreduce":
                return (norm[..., None] * x[:, None, None, :, :]).sum(axis=3)
            dt = jnp.bfloat16 if self.agg_impl == "dot_bf16" else norm.dtype
            out = jnp.einsum(
                "bcnm,bmf->bcnf", norm.astype(dt), x.astype(dt)
            )
            return out.astype(norm.dtype)

        attn = self.attn
        A_dim, O = attn.attn_dim, attn.out_dim
        ds = attn.head_dim
        H = A_dim // ds
        C = self.input_dim
        B, N, _ = x.shape
        sp = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params["attn"])

        norm = gcn_norm(adj)  # (B, C, N, N), per-channel deg-normalized
        if self.conv == "GCN":
            # (norm @ x) @ W: one VPU reduce + one block-diag MXU matmul
            W = jnp.concatenate(
                [sp["q"]["weight"], sp["k"]["weight"], sp["v"]["weight"]], axis=-1
            )  # (C, F, 2A+O)
            b = jnp.concatenate(
                [sp["q"]["bias"], sp["k"]["bias"], sp["v"]["bias"]], axis=-1
            )  # (C, 2A+O)
            F_in = W.shape[1]
            P = W.shape[-1]
            nx = agg(norm, x)  # (B, C, N, F)
            # block-diagonal (C*F, C*P) so all C channel matmuls are one dot
            Wblk = (jnp.eye(C)[:, None, :, None] * W[:, :, None, :]).reshape(
                C * F_in, C * P
            )
            agg = (
                jnp.moveaxis(nx, 1, 2).reshape(B, N, C * F_in) @ Wblk
            ).reshape(B, N, C, P)
            agg = jnp.moveaxis(agg, 2, 1) + b[None, :, None, :]
            Q, K, V = agg[..., :A_dim], agg[..., A_dim : 2 * A_dim], agg[..., 2 * A_dim :]
        elif self.conv == "MLP":
            # Q, K are 2-layer tanh MLPs of x only (attention.py:64-67);
            # V remains a GCN conv.
            qk_w1 = jnp.concatenate(
                [sp["q"]["linears"][0]["w"], sp["k"]["linears"][0]["w"]], axis=-1
            )  # (C, F, 2*hidden)
            qk_b1 = jnp.concatenate(
                [sp["q"]["linears"][0]["b"], sp["k"]["linears"][0]["b"]], axis=-1
            )
            hid = sp["q"]["linears"][0]["w"].shape[-1]
            h1 = jnp.tanh(
                jnp.einsum("bnf,cfh->bcnh", x, qk_w1) + qk_b1[None, :, None, :]
            )
            Q = (
                jnp.einsum("bcnh,chp->bcnp", h1[..., :hid], sp["q"]["linears"][1]["w"])
                + sp["q"]["linears"][1]["b"][None, :, None, :]
            )
            K = (
                jnp.einsum("bcnh,chp->bcnp", h1[..., hid:], sp["k"]["linears"][1]["w"])
                + sp["k"]["linears"][1]["b"][None, :, None, :]
            )
            nx = agg(norm, x)  # (B, C, N, F)
            V = (
                jnp.einsum("bcnf,cfo->bcno", nx, sp["v"]["weight"])
                + sp["v"]["bias"][None, :, None, :]
            )
        else:
            raise NotImplementedError(
                f"Convolution layer {self.conv} not implemented."
            )

        # torch head trick: head h = attn channels [h*ds:(h+1)*ds].
        # Broadcast-multiply-reduce instead of a (B*C*H)-batched dot: the
        # contraction is only ds=A/H long, and this form fuses with the
        # tanh + head-mean without any relayout copies.
        Qh = Q.reshape(B, C, N, H, ds)
        Kh = K.reshape(B, C, N, H, ds)
        if self.scores_impl == "mulreduce":
            scores = (Qh[:, :, :, None, :, :] * Kh[:, :, None, :, :, :]).sum(-1)
            att = jnp.tanh(scores / math.sqrt(O)).mean(axis=-1)  # (B, C, N, N)
        elif self.scores_impl in ("mulreduce_h", "mulreduce_h_bf16"):
            # head loop unrolled in Python: each head's (B, C, N, N) fusion
            # tiles as T(8,128) instead of the H-minor T(4,128) layout XLA
            # picks for the stacked (B, C, N, N, H) variant (50% sublane
            # waste measured in tools/profile_sampler.py)
            if self.scores_impl.endswith("bf16"):
                Qh = Qh.astype(jnp.bfloat16)
                Kh = Kh.astype(jnp.bfloat16)
            acc = None
            for h in range(H):
                s = (Qh[:, :, :, None, h, :] * Kh[:, :, None, :, h, :]).sum(-1)
                t = jnp.tanh(s.astype(jnp.float32) / math.sqrt(O))
                acc = t if acc is None else acc + t
            att = acc / H
        else:
            dt = jnp.bfloat16 if self.scores_impl == "dot_bf16" else Qh.dtype
            scores = jnp.einsum(
                "bcnhd,bcmhd->bchnm", Qh.astype(dt), Kh.astype(dt)
            )
            att = jnp.tanh(
                scores.astype(jnp.float32) / math.sqrt(O)
            ).mean(axis=2)
        att = (att + jnp.swapaxes(att, -1, -2)) / 2  # symmetrize

        x_out = self.multi_channel.apply(
            params["multi_channel"], jnp.moveaxis(V, 1, 2).reshape(B, N, C * O)
        )
        return x_out, jnp.moveaxis(att, 1, -1)
