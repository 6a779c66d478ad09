"""Model registry + config -> hyperparameter marshalling.

Parity targets: ccsd/src/utils/loader.py:71-101 (load_model) and
:461-566 (load_model_params).  The returned objects are the frozen dataclass
model definitions; parameters are created with ``model.init(key)``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

from ccsd_tpu.models.score_a import BaselineNetwork, ScoreNetworkA
from ccsd_tpu.models.score_a_cc import ScoreNetworkA_Base_CC, ScoreNetworkA_CC
from ccsd_tpu.models.score_f import ScoreNetworkF
from ccsd_tpu.models.score_x import ScoreNetworkX, ScoreNetworkX_GMH

MODELS = {
    "ScoreNetworkX": ScoreNetworkX,
    "ScoreNetworkX_GMH": ScoreNetworkX_GMH,
    "ScoreNetworkA": ScoreNetworkA,
    "BaselineNetwork": BaselineNetwork,
    "ScoreNetworkA_CC": ScoreNetworkA_CC,
    "ScoreNetworkA_Base_CC": ScoreNetworkA_Base_CC,
    "ScoreNetworkF": ScoreNetworkF,
}


# models whose definitions accept the channel-folded `fused` fast path
# (identical params/numerics; see ccsd_tpu/models/attention.py and
# score_f.py, DESIGN_NOTES.md)
FUSED_CAPABLE = {
    "ScoreNetworkX_GMH",
    "ScoreNetworkA",
    "ScoreNetworkA_CC",
    "ScoreNetworkA_Base_CC",
    "ScoreNetworkF",
}


def with_fused(defs: Dict[str, Dict[str, Any]], enable: bool = True,
               fast: bool = True):
    """Return model-def dicts with the fused fast path toggled where
    supported.  Used by the samplers: at inference the fused path is a pure
    win (same weights, ~1e-6 parity, 1.7-6.6x faster on TPU).

    ``fast`` additionally applies the profile-tuned sampling lowerings
    (tools/fastpath_probe.py): head-unrolled bf16 scores (T(8,128) tiling
    instead of the half-empty T(4,128) the stacked form gets) and the
    concat-free final-MLP head — 1232 -> 1085 us/step on the graph
    sampler.  bf16 scores are a sampling-time numerics change (~1e-3 on
    tanh-bounded attention maps); DEFAULT-ON since the multi-seed MMD
    clearance (BASELINE.md "Graph fast-lowering clearance": fast runs
    straddle the f32 control inside seed spread).  Opt out per run with
    ``sample.fast: false``."""
    out = {}
    for name, d in defs.items():
        d = dict(d)
        mt = d.get("model_type")
        if mt in FUSED_CAPABLE:
            d["fused"] = enable
        if enable and fast and mt in ("ScoreNetworkA", "ScoreNetworkX_GMH"):
            d.setdefault("scores_impl", "mulreduce_h_bf16")
        if enable and fast and mt == "ScoreNetworkA":
            d.setdefault("final_impl", "blocksum")
        out[name] = d
    return out


class RematModel:
    """Wrap a score model so its forward is rematerialized under grad.

    `jax.checkpoint` drops the layer activations after the forward pass and
    recomputes them during the backward pass — trading FLOPs for HBM, which
    is what makes large-E Hodge configs (grid_small_CC: E=1176, E x E
    attention maps per channel per layer) trainable within chip memory.
    Enable with ``train.remat: true``.  No reference counterpart (the
    reference has no activation checkpointing).
    """

    def __init__(self, inner):
        self._inner = inner

    def apply(self, params, x, adj, rank2=None, flags=None, **kw):
        def fwd(params, x, adj, rank2, flags):
            return self._inner.apply(params, x, adj, rank2, flags=flags, **kw)

        import jax

        return jax.checkpoint(fwd)(params, x, adj, rank2, flags)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def load_model(params: Dict[str, Any]):
    """Instantiate a model definition from a params dict with 'model_type'."""
    params_ = dict(params)
    model_type = params_.pop("model_type", None)
    if model_type not in MODELS:
        raise ValueError(
            f"Model Name <{model_type}> is unknown. Please select from "
            f"{sorted(MODELS)}"
        )
    return MODELS[model_type](**params_)


def load_model_params(config, is_cc: bool = False) -> Tuple[Dict[str, Any], ...]:
    """Marshal per-model hyperparameter dicts from a config.

    Parity: ccsd/src/utils/loader.py:461-566.
    """
    assert is_cc == config.is_cc, "is_cc should match config.is_cc"
    cm = config.model
    max_feat_num = config.data.max_feat_num
    max_node_num = config.data.max_node_num

    if "GMH" in cm.x:
        params_x = {
            "is_cc": is_cc,
            "model_type": cm.x,
            "max_feat_num": max_feat_num,
            "depth": cm.depth,
            "nhid": cm.nhid,
            "num_linears": cm.num_linears,
            "c_init": cm.c_init,
            "c_hid": cm.c_hid,
            "c_final": cm.c_final,
            "adim": cm.adim,
            "num_heads": cm.num_heads,
            "conv": cm.conv,
            "use_bn": cm.use_bn,
        }
    else:
        params_x = {
            "is_cc": is_cc,
            "model_type": cm.x,
            "max_feat_num": max_feat_num,
            "depth": cm.depth,
            "nhid": cm.nhid,
            "use_bn": cm.use_bn,
        }
    params_adj = {
        "is_cc": is_cc,
        "model_type": cm.adj,
        "max_feat_num": max_feat_num,
        "max_node_num": max_node_num,
        "nhid": cm.nhid,
        "num_layers": cm.num_layers,
        "num_linears": cm.num_linears,
        "c_init": cm.c_init,
        "c_hid": cm.c_hid,
        "c_final": cm.c_final,
        "adim": cm.adim,
        "num_heads": cm.num_heads,
        "conv": cm.conv,
        "use_bn": cm.use_bn,
    }
    # optional model.fused: channel-folded fast path at TRAIN time too
    # (sampling enables it by default regardless — with_fused above)
    if cm.get("fused"):
        for pd in (params_x, params_adj):
            if pd["model_type"] in FUSED_CAPABLE:
                pd["fused"] = True

    if not is_cc:
        return params_x, params_adj

    d_min, d_max = config.data.d_min, config.data.d_max
    if cm.adj == "ScoreNetworkA_CC":
        params_adj.update(
            d_min=d_min, d_max=d_max, nhid_h=cm.nhid_h,
            num_layers_h=cm.num_layers_h, num_linears_h=cm.num_linears_h,
            c_hid_h=cm.c_hid_h, c_final_h=cm.c_final_h, adim_h=cm.adim_h,
            num_heads_h=cm.num_heads_h, conv_hodge=cm.conv_hodge,
        )
    elif cm.adj == "ScoreNetworkA_Base_CC":
        params_adj.update(
            d_min=d_min, d_max=d_max, nhid_h=cm.nhid_h,
            num_layers_h=cm.num_layers_h, num_linears_h=cm.num_linears_h,
            c_hid_h=cm.c_hid_h, c_final_h=cm.c_final_h, hidden_h=cm.hidden_h,
        )
    params_rank2 = {
        "is_cc": config.is_cc,
        "model_type": cm.rank2,
        "num_layers_mlp": cm.num_layers_mlp,
        "num_layers": cm.num_layers_h,
        "num_linears": cm.num_linears_h,
        "nhid": cm.nhid_h,
        "c_hid": cm.c_hid_h,
        "c_final": cm.c_final_h,
        "cnum": cm.cnum,
        "max_node_num": max_node_num,
        "d_min": d_min,
        "d_max": d_max,
        "use_hodge_mask": cm.use_hodge_mask,
        "use_bn": cm.use_bn,
    }
    if cm.get("fused") and params_rank2["model_type"] in FUSED_CAPABLE:
        params_rank2["fused"] = True
    return params_x, params_adj, params_rank2
