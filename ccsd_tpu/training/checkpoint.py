"""Checkpoint save/load for parameter + EMA + optimizer pytrees.

Parity target: the reference's torch.save dict layout (trainer.py:258-283,
loader.py:569-616): {model_config, params_x/adj[/rank2], *_state_dict,
ema_*}.  Upgrades over the reference: optimizer state is saved too, enabling
true mid-training resume (the reference cannot resume training).

Format: a pickle of numpy-ified pytrees — portable, dependency-free, and
sharding-agnostic (arrays are re-sharded on load).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def _to_numpy(tree):
    def conv(x):
        if isinstance(x, jax.Array):
            return np.asarray(x)
        return x

    return jax.tree.map(conv, tree)


def save_ckpt(path: str, payload: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=pickle.HIGHEST_PROTOCOL)


def load_ckpt_file(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def ckpt_path(folder: str, dataset: str, name: str) -> str:
    return os.path.join(folder, "checkpoints", dataset, f"{name}.ckpt.pkl")


def load_torch_reference_ckpt(path: str, is_cc: bool = False) -> Dict[str, Any]:
    """Load a reference .pth checkpoint and convert its weights to our trees.

    Returns {params_x, params_adj[, params_rank2], x_params, adj_params
    [, rank2_params], ema_* (if present), model_config}.
    """
    import sys
    import types

    import torch

    from ccsd_tpu.models.registry import load_model
    from ccsd_tpu.utils.torch_convert import convert

    # reference checkpoints pickle their config as an easydict.EasyDict;
    # shim it onto our AttrDict when easydict is not installed
    try:
        import easydict  # noqa: F401
    except ImportError:
        from ccsd_tpu.utils.config import AttrDict

        mod = types.ModuleType("easydict")
        mod.EasyDict = AttrDict
        sys.modules.setdefault("easydict", mod)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out: Dict[str, Any] = {"model_config": ckpt.get("model_config")}
    pairs = [("x", "params_x", "x_state_dict"), ("adj", "params_adj", "adj_state_dict")]
    if is_cc:
        pairs.append(("rank2", "params_rank2", "rank2_state_dict"))
    for key, pkey, skey in pairs:
        params_def = dict(ckpt[pkey])
        sd = ckpt[skey]
        if next(iter(sd)).startswith("module."):
            sd = {k[7:]: v for k, v in sd.items()}
        sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
        model = load_model(params_def)
        out[pkey] = params_def
        out[f"{key}_params"] = convert(model, sd)
        ema_key = f"ema_{key}"
        if ema_key in ckpt:
            ema_sd = ckpt[ema_key]
            shadow = [p.detach().cpu().numpy() for p in ema_sd["shadow_params"]]
            # map the flat torch param list back onto our tree in state_dict
            # order: torch iterates model.parameters() == state_dict order here
            flat_names = [k for k in sd.keys()]
            ema_named = dict(zip(flat_names, shadow))
            out[f"{key}_ema_params"] = convert(model, ema_named)
            out[f"{key}_ema_meta"] = {
                "decay": ema_sd["decay"],
                "num_updates": ema_sd["num_updates"],
            }
    return out
