"""Orbax-backed checkpointing for pod-scale (sharded) training state.

The default pickle format (training/checkpoint.py) gathers every array to
host — fine at CCSD model sizes, wrong for sharded pod-scale state.  This
wrapper stores the array pytrees through `orbax.checkpoint` (per-shard
async-capable TensorStore files) and the non-array metadata (model config,
model param defs) as JSON alongside.

Opt in with ``train.ckpt_format: orbax``; the pickle format stays the
default and the two are interchangeable through the Trainer API.
No reference counterpart (the reference torch.saves a state dict,
trainer.py:258-283).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax


_META_NAME = "ccsd_meta.json"
_ARRAY_PREFIXES = ("x_", "adj_", "rank2_", "ema_")


def _split(payload: Dict[str, Any]):
    arrays = {
        k: v for k, v in payload.items() if k.startswith(_ARRAY_PREFIXES)
    }
    meta = {k: v for k, v in payload.items() if k not in arrays}
    return arrays, meta


def save_orbax(path: str, payload: Dict[str, Any]) -> str:
    """Save a Trainer checkpoint payload under directory ``path``.

    Array pytrees (params / optimizer / EMA) go through orbax; everything
    else (model_config, params_<name> defs) into a JSON sidecar.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    arrays, meta = _split(payload)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, arrays, force=True)
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump(meta, f, default=str)
    return path


def restore_orbax(
    path: str, target: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Restore a checkpoint saved by :func:`save_orbax`.

    ``target`` (optional) is a matching pytree of like-structured arrays —
    e.g. a freshly initialized Trainer state — used to restore exact leaf
    types/shardings (custom nodes like optax states round-trip through it).
    Without a target, trees come back as plain nested dicts/lists.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            restored = ckptr.restore(path, item=target)
        else:
            restored = ckptr.restore(path)
    out = dict(restored)
    meta_path = os.path.join(path, _META_NAME)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            out.update(json.load(f))
    return out


def orbax_dir(folder: str, dataset: str, name: str) -> str:
    return os.path.join(folder, "checkpoints", dataset, f"{name}.orbax")
