"""EMA parity with the reference warmup schedule (ema.py:52-69)."""

import numpy as np
import jax.numpy as jnp

from ccsd_tpu.training.ema import ema_copy_to, ema_init, ema_update


def test_ema_warmup_schedule():
    p0 = {"w": jnp.zeros((2,))}
    state = ema_init(p0, decay=0.999)
    shadow = np.zeros(2)
    for n in range(1, 6):
        p = {"w": jnp.full((2,), float(n))}
        state = ema_update(state, p)
        decay = min(0.999, (1 + n) / (10 + n))
        shadow = shadow - (1 - decay) * (shadow - n)
        np.testing.assert_allclose(
            np.asarray(state.shadow_params["w"]), shadow, rtol=1e-6
        )
    assert int(state.num_updates) == 5
    np.testing.assert_allclose(np.asarray(ema_copy_to(state)["w"]), shadow, rtol=1e-6)


def test_ema_decay_bounds():
    import pytest

    with pytest.raises(ValueError):
        ema_init({"w": jnp.zeros(1)}, decay=1.5)
