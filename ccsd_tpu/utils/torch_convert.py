"""PyTorch-checkpoint -> JAX-param-tree conversion.

The reference ships pretrained ``.pth`` checkpoints
(/root/reference/checkpoints/*) which serve as the activation-parity oracles
for this rebuild (BASELINE.md).  This module maps a torch ``state_dict``
onto the parameter pytrees produced by our model ``init`` functions by
structural recursion over the model definition.

Key mappings:
  * torch ``nn.Linear.weight`` is (out, in) -> our ``w`` is (in, out) (transpose);
  * DenseGCNConv / DenseHCNConv store their weight (in, out) already -> copy;
  * MLP with num_layers == 1 uses key ``linear``, else ``linears.{i}`` —
    parity: ccsd/src/models/layers.py:193-226.

Requires torch (CPU) only inside :func:`load_torch_state_dict`.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ccsd_tpu.models.attention import Attention, AttentionLayer
from ccsd_tpu.models.gcn import DenseGCNConv
from ccsd_tpu.models.hodge_nn import (
    BaselineBlock,
    DenseHCNConv,
    HodgeAdjAttentionLayer,
    HodgeAttention,
    HodgeBaselineLayer,
    HodgeNetworkLayer,
)
from ccsd_tpu.models.nn import MLP
from ccsd_tpu.models.score_a import (
    BaselineNetwork,
    BaselineNetworkLayer,
    ScoreNetworkA,
)
from ccsd_tpu.models.score_a_cc import ScoreNetworkA_Base_CC, ScoreNetworkA_CC
from ccsd_tpu.models.score_f import ScoreNetworkF
from ccsd_tpu.models.score_x import ScoreNetworkX, ScoreNetworkX_GMH

SD = Dict[str, np.ndarray]


def load_torch_state_dict(path: str, key: str) -> SD:
    """Load one state dict (e.g. 'x_state_dict') from a reference .pth file."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt[key]
    # strip DataParallel prefix (loader.py:635-637)
    if next(iter(sd)).startswith("module."):
        sd = {k[7:]: v for k, v in sd.items()}
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _linear(sd: SD, p: str) -> dict:
    return {"w": sd[f"{p}.weight"].T.copy(), "b": sd[f"{p}.bias"].copy()}


def _mlp(m: MLP, sd: SD, p: str) -> dict:
    if m.num_layers == 1:
        out = {"linears": [_linear(sd, f"{p}.linear")]}
    else:
        out = {
            "linears": [_linear(sd, f"{p}.linears.{i}") for i in range(m.num_layers)]
        }
        if m.use_bn:
            out["bns"] = [
                {
                    "scale": sd[f"{p}.batch_norms.{i}.weight"].copy(),
                    "bias": sd[f"{p}.batch_norms.{i}.bias"].copy(),
                }
                for i in range(m.num_layers - 1)
            ]
    return out


def _gcn(sd: SD, p: str) -> dict:
    out = {"weight": sd[f"{p}.weight"].copy()}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"].copy()
    return out


def _attention(a: Attention, sd: SD, p: str) -> dict:
    if a.conv == "GCN":
        q = _gcn(sd, f"{p}.gnn_q")
        k = _gcn(sd, f"{p}.gnn_k")
    else:
        q = _mlp(MLP(2, a.in_dim, 2 * a.attn_dim, a.attn_dim, act="tanh"), sd, f"{p}.gnn_q")
        k = _mlp(MLP(2, a.in_dim, 2 * a.attn_dim, a.attn_dim, act="tanh"), sd, f"{p}.gnn_k")
    return {"q": q, "k": k, "v": _gcn(sd, f"{p}.gnn_v")}


def _attention_layer(al: AttentionLayer, sd: SD, p: str) -> dict:
    return {
        "attn": [
            _attention(al.attn, sd, f"{p}.attn.{i}") for i in range(al.input_dim)
        ],
        "mlp": _mlp(al.mlp, sd, f"{p}.mlp"),
        "multi_channel": _mlp(al.multi_channel, sd, f"{p}.multi_channel"),
    }


def _baseline_layer(bl: BaselineNetworkLayer, sd: SD, p: str) -> dict:
    return {
        "convs": [_gcn(sd, f"{p}.convs.{i}") for i in range(bl.input_dim)],
        "mlp": _mlp(bl.mlp, sd, f"{p}.mlp"),
        "multi_channel": _mlp(bl.multi_channel, sd, f"{p}.multi_channel"),
    }


def _hodge_attention(h: HodgeAttention, sd: SD, p: str) -> dict:
    if h.conv == "HCN":
        q = _gcn(sd, f"{p}.ccnn_q")
        k = _gcn(sd, f"{p}.ccnn_k")
    else:
        q = _mlp(MLP(2, h.in_dim, 2 * h.attn_dim, h.attn_dim, act="tanh"), sd, f"{p}.ccnn_q")
        k = _mlp(MLP(2, h.in_dim, 2 * h.attn_dim, h.attn_dim, act="tanh"), sd, f"{p}.ccnn_k")
    return {"q": q, "k": k}


def _hodge_adj_attention_layer(hl: HodgeAdjAttentionLayer, sd: SD, p: str) -> dict:
    return {
        "attn": [
            _hodge_attention(hl.attn, sd, f"{p}.attn.{i}")
            for i in range(hl.input_dim)
        ],
        "mlp_value": _mlp(hl.mlp_value, sd, f"{p}.mlp_value"),
        "mlp_attention": _mlp(hl.mlp_attention, sd, f"{p}.mlp_attention"),
    }


def _hodge_baseline_layer(hl: HodgeBaselineLayer, sd: SD, p: str) -> dict:
    return {
        "layers": [
            {"mlp_layer": _mlp(hl.block.mlp_layer, sd, f"{p}.layers.{i}.mlp_layer")}
            for i in range(hl.input_dim)
        ],
        "mlp_rank2": _mlp(hl.mlp_rank2, sd, f"{p}.mlp_rank2"),
        "mlp_hodge": _mlp(hl.mlp_hodge, sd, f"{p}.mlp_hodge"),
    }


def _hodge_network_layer(hl: HodgeNetworkLayer, sd: SD, p: str) -> dict:
    return {"layer": _mlp(hl.layer, sd, f"{p}.layer")}


def convert(model: Any, sd: SD) -> dict:
    """Convert a torch state dict to the param tree for ``model``."""
    if isinstance(model, ScoreNetworkX):
        return {
            "layers": [_gcn(sd, f"layers.{k}") for k in range(model.depth)],
            "final": _mlp(model.final, sd, "final"),
        }
    if isinstance(model, ScoreNetworkX_GMH):
        return {
            "layers": [
                _attention_layer(l, sd, f"layers.{k}")
                for k, l in enumerate(model.layers)
            ],
            "final": _mlp(model.final, sd, "final"),
        }
    if isinstance(model, ScoreNetworkA):
        return {
            "layers": [
                _attention_layer(l, sd, f"layers.{k}")
                for k, l in enumerate(model.layers)
            ],
            "final": _mlp(model.final, sd, "final"),
        }
    if isinstance(model, BaselineNetwork):
        return {
            "layers": [
                _baseline_layer(l, sd, f"layers.{k}")
                for k, l in enumerate(model.layers)
            ],
            "final": _mlp(model.final, sd, "final"),
        }
    if isinstance(model, ScoreNetworkF):
        return {
            "layers": [
                _hodge_network_layer(l, sd, f"layers.{k}")
                for k, l in enumerate(model.layers)
            ],
            "final": _mlp(model.final, sd, "final"),
        }
    if isinstance(model, ScoreNetworkA_CC):
        return {
            "layers": [
                _attention_layer(l, sd, f"layers.{k}")
                for k, l in enumerate(model.layers)
            ],
            "layers_hodge": [
                _hodge_adj_attention_layer(l, sd, f"layers_hodge.{k}")
                for k, l in enumerate(model.layers_hodge)
            ],
            "final": _mlp(model.final, sd, "final"),
        }
    if isinstance(model, ScoreNetworkA_Base_CC):
        return {
            "layers": [
                _attention_layer(l, sd, f"layers.{k}")
                for k, l in enumerate(model.layers)
            ],
            "layers_hodge": [
                _hodge_baseline_layer(l, sd, f"layers_hodge.{k}")
                for k, l in enumerate(model.layers_hodge)
            ],
            "final": _mlp(model.final, sd, "final"),
        }
    raise NotImplementedError(f"No converter for {type(model).__name__}")
