"""SDE parity tests: closed-form tables vs the reference's linspace caches."""

import numpy as np
import jax.numpy as jnp

from ccsd_tpu.diffusion.sde import VESDE, VPSDE, subVPSDE


def test_vpsde_discrete_tables_match_linspace():
    sde = VPSDE(N=1000, beta_min=0.1, beta_max=20.0)
    # reference: torch.linspace(beta_min/N, beta_max/N, N)  (sde.py:364)
    ref_betas = np.linspace(0.1 / 1000, 20.0 / 1000, 1000, dtype=np.float64)
    i = jnp.arange(1000)
    np.testing.assert_allclose(np.asarray(sde.discrete_beta(i)), ref_betas, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sde.discrete_alpha(i)), 1.0 - ref_betas, rtol=1e-5
    )


def test_vpsde_marginal_prob():
    sde = VPSDE(N=1000, beta_min=0.1, beta_max=1.0)
    t = jnp.asarray([0.3, 0.9])
    x = jnp.ones((2, 4, 4))
    mean, std = sde.marginal_prob(x, t)
    lmc = -0.25 * t**2 * (1.0 - 0.1) - 0.5 * t * 0.1
    np.testing.assert_allclose(np.asarray(mean[:, 0, 0]), np.exp(lmc), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(std), np.sqrt(1 - np.exp(2 * lmc)), rtol=1e-6
    )


def test_vpsde_discretize_matches_table_gather():
    sde = VPSDE(N=1000, beta_min=0.1, beta_max=20.0)
    t = jnp.asarray([0.123, 0.5, 0.999])
    x = jnp.ones((3, 2, 2))
    f, G = sde.discretize(x, t)
    ts = np.asarray((t * 999).astype(jnp.int32))
    betas = np.linspace(0.1 / 1000, 20.0 / 1000, 1000)
    np.testing.assert_allclose(np.asarray(G), np.sqrt(betas[ts]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(f[:, 0, 0]), np.sqrt(1 - betas[ts]) - 1, rtol=1e-4, atol=1e-7
    )


def test_vesde_discretize():
    sde = VESDE(N=100, sigma_min=0.01, sigma_max=50.0)
    sigmas = np.exp(np.linspace(np.log(0.01), np.log(50.0), 100))
    t = jnp.asarray([0.0, 0.5, 1.0])
    x = jnp.zeros((3, 2, 2))
    f, G = sde.discretize(x, t)
    ts = np.asarray((t * 99).astype(jnp.int32))
    expect = np.sqrt(
        sigmas[ts] ** 2 - np.where(ts == 0, 0.0, sigmas[np.maximum(ts - 1, 0)] ** 2)
    )
    np.testing.assert_allclose(np.asarray(G), expect, rtol=1e-4)
    assert not np.asarray(f).any()


def test_subvp_diffusion_le_vp():
    vp = VPSDE(N=100, beta_min=0.1, beta_max=20.0)
    sub = subVPSDE(N=100, beta_min=0.1, beta_max=20.0)
    t = jnp.asarray([0.2, 0.8])
    x = jnp.ones((2, 3, 3))
    _, d_vp = vp.sde(x, t)
    _, d_sub = sub.sde(x, t)
    assert (np.asarray(d_sub) <= np.asarray(d_vp) + 1e-7).all()


def test_prior_sampling_sym_is_symmetric_hollow():
    import jax

    sde = VPSDE(N=10)
    s = sde.prior_sampling_sym(jax.random.PRNGKey(0), (4, 6, 6))
    a = np.asarray(s)
    np.testing.assert_allclose(a, a.transpose(0, 2, 1))
    assert not np.diagonal(a, axis1=1, axis2=2).any()


def test_transition_kernels():
    vp = VPSDE(N=100, beta_min=0.1, beta_max=1.0)
    t = jnp.asarray([0.5])
    dt = jnp.asarray([-0.005])
    x = jnp.ones((1, 2, 2))
    mean, std = vp.transition(x, t, dt)
    lmc = 0.25 * (-0.005) * (2 * 0.1 + (2 * 0.5 - 0.005) * 0.9)
    np.testing.assert_allclose(np.asarray(mean[0, 0, 0]), np.exp(-lmc), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(std), np.sqrt(1 - np.exp(2 * lmc)), rtol=1e-5
    )
