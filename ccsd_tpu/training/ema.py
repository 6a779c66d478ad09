"""Exponential moving average over parameter pytrees.

Parity target: ccsd/src/utils/ema.py:14-126, including the warmup schedule
``decay_t = min(decay, (1 + n) / (10 + n))`` (ema.py:62-64).  State is a
(num_updates, shadow_params) pytree so updates run inside the jitted train
step with no host round trip.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    decay: jnp.ndarray  # scalar float32
    num_updates: jnp.ndarray  # scalar int32
    shadow_params: Any  # pytree matching the model params


def ema_init(params, decay: float = 0.999) -> EMAState:
    if not (0.0 <= decay <= 1.0):
        raise ValueError("Decay must be between 0 and 1")
    return EMAState(
        decay=jnp.asarray(decay, jnp.float32),
        num_updates=jnp.asarray(0, jnp.int32),
        shadow_params=jax.tree.map(jnp.asarray, params),
    )


def ema_update(state: EMAState, params) -> EMAState:
    n = state.num_updates + 1
    decay = jnp.minimum(state.decay, (1.0 + n) / (10.0 + n))
    one_minus = 1.0 - decay
    shadow = jax.tree.map(
        lambda s, p: s - one_minus * (s - p), state.shadow_params, params
    )
    return EMAState(decay=state.decay, num_updates=n, shadow_params=shadow)


def ema_copy_to(state: EMAState):
    """Return the shadow params (the reference's copy_to, ema.py:71-81)."""
    return state.shadow_params
