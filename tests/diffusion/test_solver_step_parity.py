"""Predictor/corrector single-step parity vs the reference with fixed noise.

The reference predictors draw noise internally (solver.py gen_noise); we
monkeypatch its module-level gen_noise to return a fixed tensor and compare
one update step against our `_make_predictor` / `_make_corrector` closures
fed the same score and noise.
"""

import numpy as np
import pytest

from tests.ref_compat import install_reference

HAVE_REF = install_reference()
pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference/torch unavailable")

if HAVE_REF:
    import torch

import jax.numpy as jnp

import ccsd_tpu.diffusion.solvers as solvers
from ccsd_tpu.diffusion.sde import VPSDE, VESDE

B, N = 4, 6


def _fixed():
    rng = np.random.default_rng(0)
    adj = rng.random((B, N, N)).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 2, 1)
    score = rng.standard_normal((B, N, N)).astype(np.float32)
    score = np.triu(score, 1)
    score = score + score.transpose(0, 2, 1)
    noise = rng.standard_normal((B, N, N)).astype(np.float32)
    noise = np.triu(noise, 1)
    noise = noise + noise.transpose(0, 2, 1)
    t = np.full(B, 0.37, np.float32)
    return adj, score, noise, t


@pytest.mark.parametrize("sde_kind", ["VP", "VE"])
@pytest.mark.parametrize("predictor", ["Euler", "Reverse"])
def test_predictor_step_parity(monkeypatch, sde_kind, predictor):
    import ccsd.src.solver as ref_solver
    from ccsd.src.sde import VESDE as RefVE, VPSDE as RefVP

    adj, score, noise, t = _fixed()
    STEPS = 50
    if sde_kind == "VP":
        ref_sde = RefVP(0.1, 1.0, STEPS)
        our_sde = VPSDE(N=STEPS, beta_min=0.1, beta_max=1.0)
    else:
        ref_sde = RefVE(0.1, 1.0, STEPS)
        our_sde = VESDE(N=STEPS, sigma_min=0.1, sigma_max=1.0)

    monkeypatch.setattr(
        ref_solver, "gen_noise", lambda x, flags, sym=True: torch.tensor(noise)
    )
    score_t = torch.tensor(score)
    ref_score_fn = lambda x, a, fl, tt: score_t
    pred_cls = ref_solver.get_predictor(predictor)
    pred = pred_cls("adj", ref_sde, ref_score_fn, False)
    with torch.no_grad():
        ref_new, ref_mean = pred.update_fn(
            torch.tensor(adj), torch.tensor(adj), None, torch.tensor(t)
        )

    our_update = solvers._make_predictor(predictor, "adj", our_sde, False, None)
    # inject the same noise by patching _noise_for
    orig = solvers._noise_for
    solvers._noise_for = lambda key, obj, v, flags, spec: jnp.asarray(noise)
    try:
        import jax

        new, mean = our_update(
            jax.random.PRNGKey(0),
            lambda v: jnp.asarray(score), jnp.asarray(adj), None, jnp.asarray(t),
        )
    finally:
        solvers._noise_for = orig
    np.testing.assert_allclose(np.asarray(mean), ref_mean.numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new), ref_new.numpy(),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("sde_kind", ["VP", "VE"])
def test_langevin_corrector_step_parity(monkeypatch, sde_kind):
    import ccsd.src.solver as ref_solver
    from ccsd.src.sde import VESDE as RefVE, VPSDE as RefVP

    adj, score, noise, t = _fixed()
    STEPS = 50
    if sde_kind == "VP":
        ref_sde = RefVP(0.1, 1.0, STEPS)
        our_sde = VPSDE(N=STEPS, beta_min=0.1, beta_max=1.0)
    else:
        ref_sde = RefVE(0.1, 1.0, STEPS)
        our_sde = VESDE(N=STEPS, sigma_min=0.1, sigma_max=1.0)

    monkeypatch.setattr(
        ref_solver, "gen_noise", lambda x, flags, sym=True: torch.tensor(noise)
    )
    corr = ref_solver.LangevinCorrector(
        "adj", ref_sde, lambda x, a, fl, tt: torch.tensor(score),
        snr=0.1, scale_eps=0.7, n_steps=1,
    )
    with torch.no_grad():
        ref_new, ref_mean = corr.update_fn(
            torch.tensor(adj), torch.tensor(adj), None, torch.tensor(t)
        )

    our_update = solvers._make_corrector("Langevin", "adj", our_sde, 0.1, 0.7, 1, None)
    orig = solvers._noise_for
    solvers._noise_for = lambda key, obj, v, flags, spec: jnp.asarray(noise)
    try:
        import jax

        new, mean = our_update(
            jax.random.PRNGKey(0),
            lambda v: jnp.asarray(score), jnp.asarray(adj), None, jnp.asarray(t),
        )
    finally:
        solvers._noise_for = orig
    np.testing.assert_allclose(np.asarray(mean), ref_mean.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new), ref_new.numpy(),
                               atol=1e-5, rtol=1e-4)
