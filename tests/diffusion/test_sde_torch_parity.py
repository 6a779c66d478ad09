"""SDE-class parity vs the reference torch implementations.

Covers sde() / marginal_prob() / discretize() / transition() / prior_logp()
for VP, VE and subVP on shared inputs.
"""

import numpy as np
import pytest

from tests.ref_compat import install_reference

HAVE_REF = install_reference()
pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference/torch unavailable")

if HAVE_REF:
    import torch

import jax.numpy as jnp

from ccsd_tpu.diffusion.sde import VESDE, VPSDE, subVPSDE

B, N = 5, 4
STEPS = 77


def _pairs():
    from ccsd.src.sde import VESDE as TVE, VPSDE as TVP, subVPSDE as TSub

    return [
        (TVP(0.1, 1.0, STEPS), VPSDE(N=STEPS, beta_min=0.1, beta_max=1.0)),
        (TVE(0.2, 5.0, STEPS), VESDE(N=STEPS, sigma_min=0.2, sigma_max=5.0)),
        (TSub(0.1, 2.0, STEPS), subVPSDE(N=STEPS, beta_min=0.1, beta_max=2.0)),
    ]


def _inputs():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, N, N)).astype(np.float32)
    t = rng.uniform(0.01, 0.99, B).astype(np.float32)
    return x, t


@pytest.mark.parametrize("idx", [0, 1, 2])
def test_sde_drift_diffusion(idx):
    ref, ours = _pairs()[idx]
    x, t = _inputs()
    rd, rg = ref.sde(torch.tensor(x), torch.tensor(t))
    od, og = ours.sde(jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(od), rd.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(og) * np.ones(B), np.asarray(rg) * np.ones(B),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("idx", [0, 1, 2])
def test_marginal_prob(idx):
    ref, ours = _pairs()[idx]
    x, t = _inputs()
    rm, rs = ref.marginal_prob(torch.tensor(x), torch.tensor(t))
    om, os_ = ours.marginal_prob(jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(om), rm.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(os_), rs.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("idx", [0, 1])
def test_discretize(idx):
    ref, ours = _pairs()[idx]
    x, t = _inputs()
    rf, rg = ref.discretize(torch.tensor(x), torch.tensor(t))
    of, og = ours.discretize(jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(of), rf.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(og), rg.numpy(), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("idx", [0, 1])
def test_transition(idx):
    ref, ours = _pairs()[idx]
    x, t = _inputs()
    dt = np.full(B, -0.01, np.float32)
    rm, rs = ref.transition(torch.tensor(x), torch.tensor(t), torch.tensor(dt))
    om, os_ = ours.transition(jnp.asarray(x), jnp.asarray(t), jnp.asarray(dt))
    np.testing.assert_allclose(np.asarray(om), rm.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(os_), rs.numpy(), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("idx", [0, 1, 2])
def test_prior_logp(idx):
    ref, ours = _pairs()[idx]
    x, _ = _inputs()
    # reference VP sums over dims (1,2) but VE/subVP over (1,2,3); use 3D for
    # VP and 4D for the others to match their hard-coded axes
    if idx == 0:
        z = x
        rz = torch.tensor(x)
    else:
        z = x[..., None]
        rz = torch.tensor(z)
    r = ref.prior_logp(rz)
    o = ours.prior_logp(jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=1e-5)


def test_langevin_alpha_matches_reference_table():
    from ccsd.src.sde import VPSDE as TVP

    ref = TVP(0.1, 1.0, STEPS)
    ours = VPSDE(N=STEPS, beta_min=0.1, beta_max=1.0)
    t = jnp.asarray(np.linspace(0.01, 0.99, 13, dtype=np.float32))
    timestep = (torch.tensor(np.asarray(t)) * (STEPS - 1) / 1).long()
    ref_alpha = ref.alphas[timestep].numpy()
    np.testing.assert_allclose(np.asarray(ours.alpha_of_t(t)), ref_alpha,
                               rtol=1e-6)
