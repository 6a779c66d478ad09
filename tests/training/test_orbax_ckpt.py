"""Orbax checkpoint round-trip: save/restore of a full training payload,
including optax states restored through a structural target (custom pytree
nodes), and Trainer-level resume from the orbax format."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from ccsd_tpu.training.orbax_ckpt import orbax_dir, restore_orbax, save_orbax


def _tree_allclose(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip_with_optax_state(tmp_path):
    params = {
        "w": jnp.arange(12.0).reshape(3, 4),
        "nested": {"b": jnp.ones((4,))},
    }
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    payload = {
        "model_config": {"data": {"data": "unit"}, "is_cc": False},
        "params_x": {"model_type": "ScoreNetworkX", "max_feat_num": 4},
        "x_params": params,
        "x_opt_state": opt_state,
        "ema_x": (jnp.asarray(0.999), jnp.asarray(3), params),
    }
    path = save_orbax(str(tmp_path / "ckpt.orbax"), payload)
    assert os.path.isdir(path)

    target = {
        "x_params": jax.tree.map(jnp.zeros_like, params),
        "x_opt_state": opt.init(jax.tree.map(jnp.zeros_like, params)),
        "ema_x": (jnp.asarray(0.0), jnp.asarray(0),
                  jax.tree.map(jnp.zeros_like, params)),
    }
    restored = restore_orbax(path, target=target)
    _tree_allclose(restored["x_params"], params)
    _tree_allclose(restored["x_opt_state"], opt_state)
    _tree_allclose(restored["ema_x"], payload["ema_x"])
    # optax custom nodes keep their type through the target
    assert type(restored["x_opt_state"]) is type(opt_state)
    # metadata sidecar
    assert restored["model_config"]["is_cc"] is False
    assert restored["params_x"]["model_type"] == "ScoreNetworkX"


def test_orbax_dir_layout():
    assert orbax_dir("/f", "ds", "name").endswith(
        os.path.join("checkpoints", "ds", "name.orbax")
    )


@pytest.mark.slow
def test_trainer_orbax_save_and_resume(tmp_path):
    from tests.training.test_trainer_sampler import _config, _make_dataset
    from ccsd_tpu.training.trainer import Trainer

    name = _make_dataset(tmp_path)
    cfg = _config(tmp_path, name)
    cfg.train.ckpt_format = "orbax"
    t1 = Trainer(cfg, log=False)
    t1.train()
    path = t1.save_checkpoint(suffix="_orb")
    assert os.path.isdir(path)

    t2 = Trainer(cfg, log=False)
    t2.load_checkpoint(f"{t1.ckpt_name}_orb")
    for n in t1.names:
        _tree_allclose(t1.state.params[n], t2.state.params[n])
        _tree_allclose(t1.state.emas[n], t2.state.emas[n])
        _tree_allclose(t1.state.opt_states[n], t2.state.opt_states[n])
