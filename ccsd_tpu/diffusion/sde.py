"""Stochastic differential equations (VP / VE / subVP) as pure functions.

TPU-native re-design of ccsd/src/sde.py:17-786.  Differences from the
reference (all intentional):

  * SDEs are frozen dataclasses of *pure functions*; there is no mutable
    state, so they can be closed over by jit/scan bodies.
  * The reference caches `discrete_betas` / `alphas` / `discrete_sigmas`
    tables and gathers them with `.long().to("cpu")` indexing
    (sde.py:465-483, 625-648) — a host sync in the sampler hot loop.  The
    linspace tables are affine/geometric in the index, so we evaluate them in
    closed form on device from the timestep; results are bitwise-identical
    up to float associativity.
  * `SDE.reverse` (sde.py:113-342) built subclasses at runtime; here the
    reverse drift is a function transform (`reverse_sde` / `reverse_discretize`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp


def _bcast(scalar: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a (B,) per-sample scalar against (B, ..., ...) tensors.

    The reference always writes `s[:, None, None]` because every tensor it
    touches is rank-3; we support any rank >= 1.
    """
    return scalar.reshape(scalar.shape + (1,) * (like.ndim - scalar.ndim))


@dataclass(frozen=True)
class SDE:
    """Base: N discretization steps, final time T = 1."""

    N: int = 1000

    @property
    def T(self) -> float:
        return 1.0

    # -- interface (overridden) --
    def sde(self, x, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    def marginal_prob(self, x, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    def transition(self, x, t, dt) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    def prior_logp(self, z: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def marginal_std(self, t: jnp.ndarray) -> jnp.ndarray:
        """std of the perturbation kernel as a function of t only."""
        raise NotImplementedError

    # -- shared --
    def discretize(self, x, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Euler discretization x_{i+1} = x_i + f_i + G_i z.  (sde.py:93-111)"""
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t)
        return drift * dt, diffusion * math.sqrt(dt)

    def timestep_of(self, t: jnp.ndarray) -> jnp.ndarray:
        """Continuous time -> integer table index.  (sde.py:477, 639)"""
        return (t * (self.N - 1) / self.T).astype(jnp.int32)

    def prior_sampling(self, key, shape, dtype=jnp.float32) -> jnp.ndarray:
        import jax

        return jax.random.normal(key, shape, dtype)

    def prior_sampling_sym(self, key, shape, dtype=jnp.float32) -> jnp.ndarray:
        import jax

        x = jnp.triu(jax.random.normal(key, shape, dtype), k=1)
        return x + jnp.swapaxes(x, -1, -2)


@dataclass(frozen=True)
class VPSDE(SDE):
    """Variance-preserving SDE.  Parity: ccsd/src/sde.py:345-503."""

    beta_min: float = 0.1
    beta_max: float = 20.0

    def beta_t(self, t):
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def sde(self, x, t):
        beta_t = self.beta_t(t)
        drift = -0.5 * _bcast(beta_t, x) * x
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def _log_mean_coeff(self, t):
        return -0.25 * t**2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min

    def marginal_prob(self, x, t):
        lmc = self._log_mean_coeff(t)
        mean = jnp.exp(_bcast(lmc, x)) * x
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))
        return mean, std

    def marginal_std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self._log_mean_coeff(t)))

    # discrete tables, evaluated in closed form (reference: sde.py:364-368)
    def discrete_beta(self, i: jnp.ndarray) -> jnp.ndarray:
        lo, hi = self.beta_min / self.N, self.beta_max / self.N
        step = (hi - lo) / (self.N - 1) if self.N > 1 else 0.0
        return lo + i.astype(jnp.float32) * step

    def discrete_alpha(self, i: jnp.ndarray) -> jnp.ndarray:
        return 1.0 - self.discrete_beta(i)

    def alpha_of_t(self, t: jnp.ndarray) -> jnp.ndarray:
        """alphas[timestep(t)] used by the Langevin corrector (solver.py:684-687)."""
        return self.discrete_alpha(self.timestep_of(t))

    def discretize(self, x, t):
        """DDPM discretization.  (sde.py:465-483)"""
        i = self.timestep_of(t)
        beta = self.discrete_beta(i)
        alpha = 1.0 - beta
        f = _bcast(jnp.sqrt(alpha), x) * x - x
        G = jnp.sqrt(beta)
        return f, G

    def transition(self, x, t, dt):
        """Mean/std of the transition kernel (S4 solver).  (sde.py:485-503)"""
        lmc = 0.25 * dt * (2 * self.beta_min + (2 * t + dt) * (self.beta_max - self.beta_min))
        mean = jnp.exp(_bcast(-lmc, x)) * x
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))
        return mean, std

    def prior_logp(self, z):
        shape = z.shape
        n = math.prod(shape[1:])
        axes = tuple(range(1, z.ndim))
        return -n / 2.0 * math.log(2 * math.pi) - jnp.sum(z**2, axis=axes) / 2.0


@dataclass(frozen=True)
class VESDE(SDE):
    """Variance-exploding SDE.  Parity: ccsd/src/sde.py:506-669."""

    sigma_min: float = 0.01
    sigma_max: float = 50.0

    def sigma_t(self, t):
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

    def sde(self, x, t):
        sigma = self.sigma_t(t)
        drift = jnp.zeros_like(x)
        diffusion = sigma * math.sqrt(
            2 * (math.log(self.sigma_max) - math.log(self.sigma_min))
        )
        return drift, diffusion

    def marginal_prob(self, x, t):
        return x, self.sigma_t(t)

    def marginal_std(self, t):
        return self.sigma_t(t)

    def alpha_of_t(self, t):
        return jnp.ones_like(t)

    def discrete_sigma(self, i: jnp.ndarray) -> jnp.ndarray:
        lo, hi = math.log(self.sigma_min), math.log(self.sigma_max)
        step = (hi - lo) / (self.N - 1) if self.N > 1 else 0.0
        return jnp.exp(lo + i.astype(jnp.float32) * step)

    def discretize(self, x, t):
        """SMLD (NCSN) discretization.  (sde.py:625-648)"""
        i = self.timestep_of(t)
        sigma = self.discrete_sigma(i)
        adjacent = jnp.where(i == 0, jnp.zeros_like(t), self.discrete_sigma(i - 1))
        f = jnp.zeros_like(x)
        G = jnp.sqrt(sigma**2 - adjacent**2)
        return f, G

    def transition(self, x, t, dt):
        var = jnp.square(self.sigma_t(t)) - jnp.square(self.sigma_t(t + dt))
        return x, jnp.sqrt(var)

    def prior_logp(self, z):
        shape = z.shape
        n = math.prod(shape[1:])
        axes = tuple(range(1, z.ndim))
        return -n / 2.0 * math.log(2 * math.pi * self.sigma_max**2) - jnp.sum(
            z**2, axis=axes
        ) / (2 * self.sigma_max**2)


@dataclass(frozen=True)
class subVPSDE(SDE):
    """sub-VP SDE.  Parity: ccsd/src/sde.py:672-786."""

    beta_min: float = 0.1
    beta_max: float = 20.0

    def beta_t(self, t):
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def sde(self, x, t):
        beta_t = self.beta_t(t)
        drift = -0.5 * _bcast(beta_t, x) * x
        discount = 1.0 - jnp.exp(
            -2 * self.beta_min * t - (self.beta_max - self.beta_min) * t**2
        )
        diffusion = jnp.sqrt(beta_t * discount)
        return drift, diffusion

    def _log_mean_coeff(self, t):
        return -0.25 * t**2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min

    def marginal_prob(self, x, t):
        lmc = self._log_mean_coeff(t)
        mean = jnp.exp(_bcast(lmc, x)) * x
        std = 1.0 - jnp.exp(2.0 * lmc)
        return mean, std

    def marginal_std(self, t):
        return 1.0 - jnp.exp(2.0 * self._log_mean_coeff(t))

    # subVP shares VP's discrete-beta table for the corrector alpha
    def discrete_beta(self, i: jnp.ndarray) -> jnp.ndarray:
        lo, hi = self.beta_min / self.N, self.beta_max / self.N
        step = (hi - lo) / (self.N - 1) if self.N > 1 else 0.0
        return lo + i.astype(jnp.float32) * step

    def alpha_of_t(self, t: jnp.ndarray) -> jnp.ndarray:
        return 1.0 - self.discrete_beta(self.timestep_of(t))

    def prior_logp(self, z):
        shape = z.shape
        n = math.prod(shape[1:])
        axes = tuple(range(1, z.ndim))
        return -n / 2.0 * math.log(2 * math.pi) - jnp.sum(z**2, axis=axes) / 2.0


def is_vp_like(sde: SDE) -> bool:
    """VP/subVP use -score/std scaling and discrete-alpha Langevin steps."""
    return isinstance(sde, (VPSDE, subVPSDE))


# ------------------------------------------------------ reverse transforms ---

def reverse_sde(sde: SDE, probability_flow: bool = False):
    """Reverse-time drift/diffusion as a function transform.

    Given a score already evaluated at (x, t), return (drift, diffusion) of
    the reverse SDE.  Parity: ccsd/src/sde.py:180-207 / 265-302 — the
    argument-routing (is_adj / is_rank2) lives in the solver, which always
    evaluates the forward sde on the tensor being updated.
    """

    def rev(x, t, score):
        drift, diffusion = sde.sde(x, t)
        drift = drift - _bcast(diffusion, x) ** 2 * score * (
            0.5 if probability_flow else 1.0
        )
        diffusion = jnp.zeros_like(diffusion) if probability_flow else diffusion
        return drift, diffusion

    return rev


def reverse_discretize(sde: SDE, probability_flow: bool = False):
    """Discretized reverse iteration (f, G).  Parity: sde.py:209-235 / 304-340."""

    def rev(x, t, score):
        f, G = sde.discretize(x, t)
        rev_f = f - _bcast(G, x) ** 2 * score * (0.5 if probability_flow else 1.0)
        rev_G = jnp.zeros_like(G) if probability_flow else G
        return rev_f, rev_G

    return rev


def load_sde(config_sde) -> SDE:
    """Build an SDE from a config node {type, beta_min, beta_max, num_scales}.

    Parity: ccsd/src/utils/loader.py:242-267.
    """
    t = config_sde.type
    if t == "VP":
        return VPSDE(N=config_sde.num_scales, beta_min=config_sde.beta_min,
                     beta_max=config_sde.beta_max)
    if t == "VE":
        return VESDE(N=config_sde.num_scales, sigma_min=config_sde.beta_min,
                     sigma_max=config_sde.beta_max)
    if t == "subVP":
        return subVPSDE(N=config_sde.num_scales, beta_min=config_sde.beta_min,
                        beta_max=config_sde.beta_max)
    raise NotImplementedError(f"SDE class {t} not supported.")
