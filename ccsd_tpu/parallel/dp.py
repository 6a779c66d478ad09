"""Sharded training-step builders (data parallel + edge partition).

The reference has no distributed layer (torch DataParallel only,
loader.py:124-141); this module is the new first-class design: one jitted
train step over a Mesh with axes

  * 'data' — batch parallelism (gradients all-reduced by GSPMD psum),
  * 'edge' — edge partition of the E (= C(N,2)) axis of rank-2 / Hodge
    tensors; the E x E Hodge-dual matmuls then run as local blocks with
    XLA-inserted all-gathers riding ICI.

Entry points build the step function plus the in_shardings needed to place
batches; they are used by __graft_entry__.dryrun_multichip and by the
Trainer when a multi-axis mesh is requested.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ccsd_tpu.diffusion.losses import get_sde_loss_fn, get_sde_loss_fn_cc
from ccsd_tpu.training.ema import ema_init, ema_update
from ccsd_tpu.training.optim import make_optimizer


def cc_train_step_sharded(
    mesh: Mesh,
    models: Dict[str, object],
    sdes: Dict[str, object],
    spec,
    lr: float = 1e-3,
    weight_decay: float = 1e-4,
    grad_norm: float = 1.0,
    reduce_mean: bool = False,
):
    """Build (jitted_step, shardings) for the full CC training step.

    Shardings: x (data, -, -), adj (data, -, -), rank2 (data, edge, -);
    params/opt/EMA replicated.  Returns a function
    ``step(params, opt_states, emas, batch, key) -> (params, opts, emas,
    losses)`` jitted with explicit in/out shardings over the mesh.
    """
    names = ["x", "adj", "rank2"]
    loss_fn = get_sde_loss_fn_cc(
        sdes["x"], sdes["adj"], sdes["rank2"],
        models["x"], models["adj"], models["rank2"], spec,
        reduce_mean=reduce_mean,
    )
    optimizers = {
        n: make_optimizer(lr=lr, weight_decay=weight_decay, grad_norm=grad_norm)
        for n in names
    }

    has_edge = "edge" in mesh.axis_names
    batch_shardings = (
        NamedSharding(mesh, P("data", None, None)),  # x
        NamedSharding(mesh, P("data", None, None)),  # adj
        NamedSharding(
            mesh, P("data", "edge" if has_edge else None, None)
        ),  # rank2: E axis over ICI
    )
    repl = NamedSharding(mesh, P())

    def step(params, opt_states, emas, batch, key):
        def total(p):
            losses = loss_fn(p["x"], p["adj"], p["rank2"], *batch, key)
            return sum(losses), losses

        (_, losses), grads = jax.value_and_grad(total, has_aux=True)(params)
        new_params, new_opts, new_emas = {}, {}, {}
        for n in names:
            updates, new_opts[n] = optimizers[n].update(
                grads[n], opt_states[n], params[n]
            )
            new_params[n] = optax.apply_updates(params[n], updates)
            new_emas[n] = ema_update(emas[n], new_params[n])
        return new_params, new_opts, new_emas, losses

    jitted = jax.jit(
        step,
        in_shardings=(repl, repl, repl, batch_shardings, repl),
        out_shardings=(repl, repl, repl, repl),
    )

    def init_state(key):
        keys = jax.random.split(key, 3)
        params = {
            n: jax.device_put(models[n].init(k), repl)
            for n, k in zip(names, keys)
        }
        opts = {n: optimizers[n].init(params[n]) for n in names}
        emas = {n: ema_init(params[n], 0.999) for n in names}
        return params, opts, emas

    return jitted, batch_shardings, init_state


def graph_train_step_sharded(
    mesh: Mesh,
    models: Dict[str, object],
    sdes: Dict[str, object],
    lr: float = 1e-3,
    weight_decay: float = 1e-4,
    grad_norm: float = 1.0,
    reduce_mean: bool = False,
):
    """Data-parallel graph (x, adj) training step over the mesh."""
    names = ["x", "adj"]
    loss_fn = get_sde_loss_fn(
        sdes["x"], sdes["adj"], models["x"], models["adj"],
        reduce_mean=reduce_mean,
    )
    optimizers = {
        n: make_optimizer(lr=lr, weight_decay=weight_decay, grad_norm=grad_norm)
        for n in names
    }
    batch_shardings = (
        NamedSharding(mesh, P("data", None, None)),
        NamedSharding(mesh, P("data", None, None)),
    )
    repl = NamedSharding(mesh, P())

    def step(params, opt_states, emas, batch, key):
        def total(p):
            losses = loss_fn(p["x"], p["adj"], *batch, key)
            return sum(losses), losses

        (_, losses), grads = jax.value_and_grad(total, has_aux=True)(params)
        new_params, new_opts, new_emas = {}, {}, {}
        for n in names:
            updates, new_opts[n] = optimizers[n].update(
                grads[n], opt_states[n], params[n]
            )
            new_params[n] = optax.apply_updates(params[n], updates)
            new_emas[n] = ema_update(emas[n], new_params[n])
        return new_params, new_opts, new_emas, losses

    jitted = jax.jit(
        step,
        in_shardings=(repl, repl, repl, batch_shardings, repl),
        out_shardings=(repl, repl, repl, repl),
    )

    def init_state(key):
        keys = jax.random.split(key, 2)
        params = {
            n: jax.device_put(models[n].init(k), repl)
            for n, k in zip(names, keys)
        }
        opts = {n: optimizers[n].init(params[n]) for n in names}
        emas = {n: ema_init(params[n], 0.999) for n in names}
        return params, opts, emas

    return jitted, batch_shardings, init_state
