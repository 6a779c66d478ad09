"""Predictor-corrector and S4 reverse-diffusion samplers as `lax.scan` loops.

Parity targets: ccsd/src/solver.py:24-1563.  The reference runs a Python
`trange` of 1000 steps, each dispatching through Predictor/Corrector objects
(2-6 model forwards per step with host-side RNG).  Here the entire reverse
diffusion is ONE compiled `lax.scan`: XLA pipelines every step on-device, RNG
is a threaded jax PRNG key, and no host sync happens until the final sample
is fetched.  This is the single biggest TPU win in the framework.

Semantics preserved exactly (update staleness included):
  * corrector then predictor per step; the adj update sees the pre-corrector
    x (`_x`), rank2 sees pre-update x AND adj (solver.py:1129-1147);
  * Euler-Maruyama (solver.py:157-313) and reverse-diffusion / ancestral
    (solver.py:316-463) predictors; Langevin (solver.py:600-807) and None
    correctors;
  * Langevin step size couples the batch through mean grad/noise norms
    (solver.py:695-699) — under pjit data parallelism XLA lowers those means
    to psums, preserving global-batch semantics.

The denoised means are carried through the scan (not stacked); only the
optional sample-0 trajectory is accumulated as scan outputs.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ccsd_tpu.diffusion.sde import (
    SDE,
    _bcast,
    reverse_discretize,
    reverse_sde,
)
from ccsd_tpu.ops.cells import ComplexSpec
from ccsd_tpu.ops.masks import (
    gen_noise,
    gen_noise_rank2,
    mask_adjs,
    mask_rank2,
    mask_x,
)


class SamplerOutput(NamedTuple):
    x: jnp.ndarray
    adj: jnp.ndarray
    rank2: Optional[jnp.ndarray]
    n_model_evals: int
    trajectory: Optional[tuple]


def _batch_norm_mean(v: jnp.ndarray) -> jnp.ndarray:
    """Mean over the batch of per-sample L2 norms (solver.py:695-698).

    Accumulates in f32 regardless of input dtype — with the bf16 sampling
    mode the sum of ~3e7 squares would otherwise lose all precision.
    """
    v = v.astype(jnp.float32)
    return jnp.linalg.norm(v.reshape(v.shape[0], -1), axis=-1).mean()


def _langevin_step(sde: SDE, score, v, noise, t, snr, scale_eps):
    """One Langevin MCMC correction on tensor v given its score and noise."""
    alpha = sde.alpha_of_t(t)
    grad_norm = _batch_norm_mean(score)
    noise_norm = _batch_norm_mean(noise)
    step_size = (snr * noise_norm / grad_norm) ** 2 * 2 * alpha
    v_mean = v + _bcast(step_size, v).astype(v.dtype) * score
    v = v_mean + _bcast(jnp.sqrt(step_size * 2), v).astype(v.dtype) * noise * scale_eps
    return v, v_mean


def _noise_for(key, obj: str, v, flags, spec):
    if obj == "x":
        return gen_noise(key, v, flags, sym=False)
    if obj == "adj":
        return gen_noise(key, v, flags, sym=True)
    return gen_noise_rank2(key, v, spec, flags)


def _make_corrector(
    corrector: str, obj: str, sde: SDE, snr, scale_eps, n_steps: int, spec
):
    """Corrector update: (key, score_eval, v, flags, t) -> (v, v_mean).

    `score_eval(v)` re-evaluates the score with tensor `obj` replaced by v.
    """
    if corrector == "None":

        def update(key, score_eval, v, flags, t):
            return v, v

        return update
    if corrector != "Langevin":
        raise NotImplementedError(
            f"Corrector {corrector} not supported. Select from [Langevin, None]."
        )

    def update(key, score_eval, v, flags, t):
        v_mean = v
        for i in range(n_steps):
            k = jax.random.fold_in(key, i)
            score = score_eval(v)
            noise = _noise_for(k, obj, v, flags, spec)
            v, v_mean = _langevin_step(sde, score, v, noise, t, snr, scale_eps)
        return v, v_mean

    return update


def _make_predictor(
    predictor: str, obj: str, sde: SDE, probability_flow: bool, spec
):
    """Predictor update: (key, score_eval, v, flags, t) -> (v, v_mean)."""
    if predictor == "Euler":
        rev = reverse_sde(sde, probability_flow)

        def update(key, score_eval, v, flags, t):
            dt = -1.0 / sde.N
            z = _noise_for(key, obj, v, flags, spec)
            drift, diffusion = rev(v, t, score_eval(v))
            v_mean = v + drift * dt
            v = v_mean + _bcast(diffusion, v) * math.sqrt(-dt) * z
            return v, v_mean

        return update
    if predictor == "Reverse":
        rev = reverse_discretize(sde, probability_flow)

        def update(key, score_eval, v, flags, t):
            f, G = rev(v, t, score_eval(v))
            z = _noise_for(key, obj, v, flags, spec)
            v_mean = v - f
            v = v_mean + _bcast(G, v) * z
            return v, v_mean

        return update
    raise NotImplementedError(
        f"Predictor {predictor} not supported. Select from [Reverse, Euler]."
    )


def _scan_steps(step, init, diff_steps, timesteps, record_trajectory, lean):
    """Run a ``step(samples, (i, t)) -> (samples, (means, out))`` body over
    the reverse-diffusion schedule; returns (samples, means, trajectory).

    ``lean=False`` (the f32 default): ONE scan over all steps with the
    denoising means riding in the carry.  Measured fastest on TPU — the
    round-3 split form cost the f32 CC sampler 6.4% (125.1 vs 133.6
    steps/s at community_small_CC shapes, same chip/hour bisect), because
    the means are byproduct values XLA aliases into carry slots for free,
    while splitting the last step out of the scan perturbs the loop
    schedule.

    ``lean=True`` (bf16 carry mode): carry only the sample tensors and run
    the last step un-scanned for the means.  This keeps the f32 means
    (111 MB of rank-2 means at community_small_CC shapes) out of a bf16
    stream's working set — the configuration the bf16 mode's 1.8× win was
    measured with (BASELINE.md "Fast sampling modes").
    """
    if lean:
        def scan_body(carry, it):
            carry, (_means, out) = step(carry, it)  # means DCE'd in-scan
            return carry, out

        its = (jnp.arange(diff_steps - 1), timesteps[:-1])
        samples, traj = jax.lax.scan(scan_body, init, its)
        last_it = (jnp.asarray(diff_steps - 1), timesteps[-1])
        samples, (means, last_out) = step(samples, last_it)
        if record_trajectory:
            traj = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b[None]]), traj, last_out
            )
        return samples, means, traj

    def full_body(carry, it):
        samples, _ = carry
        samples, (means, out) = step(samples, it)
        return (samples, means), out

    zeros_means = jax.tree_util.tree_map(jnp.zeros_like, init)
    its = (jnp.arange(diff_steps), timesteps)
    (samples, means), traj = jax.lax.scan(
        full_body, (init, zeros_means), its
    )
    return samples, means, traj


def get_pc_sampler(
    sde_x: SDE,
    sde_adj: SDE,
    shape_x: Sequence[int],
    shape_adj: Sequence[int],
    predictor: str = "Euler",
    corrector: str = "None",
    snr: float = 0.1,
    scale_eps: float = 1.0,
    n_steps: int = 1,
    probability_flow: bool = False,
    denoise: bool = True,
    eps: float = 1e-3,
    is_cc: bool = False,
    sde_rank2: Optional[SDE] = None,
    shape_rank2: Optional[Sequence[int]] = None,
    spec: Optional[ComplexSpec] = None,
    record_trajectory: bool = False,
    carry_dtype=None,
) -> Callable:
    """Build a scanned PC sampler.

    Graph mode returns ``sampler(score_fn_x, score_fn_adj, init_flags, key)``;
    CC mode additionally takes ``score_fn_rank2``.  Score functions have the
    reference signatures ((x, adj, flags, t) or (x, adj, rank2, flags, t)).
    The caller closes params into the score fns and may jit the result.

    ``carry_dtype=jnp.bfloat16`` runs the reverse diffusion with bf16 sample
    tensors, scores and noise (norm reductions stay f32): at CC shapes the
    hot loop is HBM-bound on (B, E, K) streams (tools/profile_cc_sampler.py),
    so halving the bytes is the dominant lever.  No reference counterpart
    (the reference is f64-default torch on CPU); quality is gated by the MMD
    sweep, see BASELINE.md.
    """
    shape_x = tuple(shape_x)
    shape_adj = tuple(shape_adj)
    diff_steps = sde_adj.N
    timesteps = jnp.linspace(sde_adj.T, eps, diff_steps)
    cdt = jnp.dtype(carry_dtype) if carry_dtype is not None else None

    def _cast(v):
        return v.astype(cdt) if cdt is not None else v

    corr_x = _make_corrector(corrector, "x", sde_x, snr, scale_eps, n_steps, spec)
    corr_adj = _make_corrector(corrector, "adj", sde_adj, snr, scale_eps, n_steps, spec)
    pred_x = _make_predictor(predictor, "x", sde_x, probability_flow, spec)
    pred_adj = _make_predictor(predictor, "adj", sde_adj, probability_flow, spec)
    if is_cc:
        assert sde_rank2 is not None and shape_rank2 is not None and spec is not None
        shape_rank2 = tuple(shape_rank2)
        corr_r2 = _make_corrector(
            corrector, "rank2", sde_rank2, snr, scale_eps, n_steps, spec
        )
        pred_r2 = _make_predictor(predictor, "rank2", sde_rank2, probability_flow, spec)

    if not is_cc:

        def sampler(score_fn_x, score_fn_adj, init_flags, key):
            flags = init_flags
            if cdt is not None:
                sfx, sfa = score_fn_x, score_fn_adj
                score_fn_x = lambda *a: sfx(*a).astype(cdt)  # noqa: E731
                score_fn_adj = lambda *a: sfa(*a).astype(cdt)  # noqa: E731
            kx, kadj, kscan = jax.random.split(key, 3)
            x = _cast(mask_x(sde_x.prior_sampling(kx, shape_x), flags))
            adj = _cast(mask_adjs(sde_adj.prior_sampling_sym(kadj, shape_adj), flags))

            def step(carry, it):
                x, adj = carry
                i, t = it
                vec_t = jnp.full((shape_adj[0],), t)
                k = jax.random.fold_in(kscan, i)
                k1, k2, k3, k4 = jax.random.split(k, 4)

                _x = x
                x, _ = corr_x(
                    k1, lambda v: score_fn_x(v, adj, flags, vec_t), x, flags, vec_t
                )
                adj, _ = corr_adj(
                    k2, lambda v: score_fn_adj(_x, v, flags, vec_t), adj, flags, vec_t
                )

                _x = x
                x, x_mean = pred_x(
                    k3, lambda v: score_fn_x(v, adj, flags, vec_t), x, flags, vec_t
                )
                adj, adj_mean = pred_adj(
                    k4, lambda v: score_fn_adj(_x, v, flags, vec_t), adj, flags, vec_t
                )
                out = (x_mean[0], adj_mean[0]) if record_trajectory else None
                return (_cast(x), _cast(adj)), ((x_mean, adj_mean), out)

            (x, adj), (x_mean, adj_mean), traj = _scan_steps(
                step, (x, adj), diff_steps, timesteps, record_trajectory,
                lean=cdt is not None,
            )
            f32 = lambda v: v.astype(jnp.float32)  # noqa: E731
            return SamplerOutput(
                x=f32(x_mean if denoise else x),
                adj=f32(adj_mean if denoise else adj),
                rank2=None,
                n_model_evals=diff_steps * (n_steps + 1),
                trajectory=traj,
            )

        return sampler

    def sampler_cc(score_fn_x, score_fn_adj, score_fn_rank2, init_flags, key):
        flags = init_flags
        if cdt is not None:
            sfx, sfa, sfr = score_fn_x, score_fn_adj, score_fn_rank2
            score_fn_x = lambda *a: sfx(*a).astype(cdt)  # noqa: E731
            score_fn_adj = lambda *a: sfa(*a).astype(cdt)  # noqa: E731
            score_fn_rank2 = lambda *a: sfr(*a).astype(cdt)  # noqa: E731
        kx, kadj, kr2, kscan = jax.random.split(key, 4)
        x = _cast(mask_x(sde_x.prior_sampling(kx, shape_x), flags))
        adj = _cast(mask_adjs(sde_adj.prior_sampling_sym(kadj, shape_adj), flags))
        rank2 = _cast(
            mask_rank2(sde_rank2.prior_sampling(kr2, shape_rank2), spec, flags)
        )

        def step(carry, it):
            x, adj, rank2 = carry
            i, t = it
            vec_t = jnp.full((shape_adj[0],), t)
            k = jax.random.fold_in(kscan, i)
            k1, k2, k3, k4, k5, k6 = jax.random.split(k, 6)

            _x, _adj = x, adj
            x, _ = corr_x(
                k1, lambda v: score_fn_x(v, adj, rank2, flags, vec_t), x, flags, vec_t
            )
            adj, _ = corr_adj(
                k2, lambda v: score_fn_adj(_x, v, rank2, flags, vec_t), adj, flags, vec_t
            )
            rank2, _ = corr_r2(
                k3, lambda v: score_fn_rank2(_x, _adj, v, flags, vec_t),
                rank2, flags, vec_t,
            )

            _x, _adj = x, adj
            x, x_mean = pred_x(
                k4, lambda v: score_fn_x(v, adj, rank2, flags, vec_t), x, flags, vec_t
            )
            adj, adj_mean = pred_adj(
                k5, lambda v: score_fn_adj(_x, v, rank2, flags, vec_t), adj, flags, vec_t
            )
            rank2, rank2_mean = pred_r2(
                k6, lambda v: score_fn_rank2(_x, _adj, v, flags, vec_t),
                rank2, flags, vec_t,
            )
            out = (
                (x_mean[0], adj_mean[0], rank2_mean[0]) if record_trajectory else None
            )
            return (_cast(x), _cast(adj), _cast(rank2)), (
                (x_mean, adj_mean, rank2_mean), out)

        (x, adj, rank2), (x_mean, adj_mean, rank2_mean), traj = _scan_steps(
            step, (x, adj, rank2), diff_steps, timesteps, record_trajectory,
            lean=cdt is not None,
        )
        f32 = lambda v: v.astype(jnp.float32)  # noqa: E731
        return SamplerOutput(
            x=f32(x_mean if denoise else x),
            adj=f32(adj_mean if denoise else adj),
            rank2=f32(rank2_mean if denoise else rank2),
            n_model_evals=diff_steps * (n_steps + 1),
            trajectory=traj,
        )

    return sampler_cc


def get_s4_solver(
    sde_x: SDE,
    sde_adj: SDE,
    shape_x: Sequence[int],
    shape_adj: Sequence[int],
    snr: float = 0.1,
    scale_eps: float = 1.0,
    denoise: bool = True,
    eps: float = 1e-3,
    is_cc: bool = False,
    sde_rank2: Optional[SDE] = None,
    shape_rank2: Optional[Sequence[int]] = None,
    spec: Optional[ComplexSpec] = None,
    record_trajectory: bool = False,
    **_unused,
) -> Callable:
    """S4 splitting solver as a scan.  Parity: ccsd/src/solver.py:1179-1563."""
    shape_x = tuple(shape_x)
    shape_adj = tuple(shape_adj)
    diff_steps = sde_adj.N
    timesteps = jnp.linspace(sde_adj.T, eps, diff_steps)
    dt = -1.0 / diff_steps

    def correct(key, sde, score, v, obj, flags, vec_t):
        noise = _noise_for(key, obj, v, flags, spec)
        return _langevin_step(sde, score, v, noise, vec_t, snr, scale_eps)

    def predict(key, sde, v, Sdrift, obj, flags, vec_t, vec_dt):
        k1, k2 = jax.random.split(key)
        mu, sigma = sde.transition(v, vec_t, vec_dt)
        v = mu + _bcast(sigma, v) * _noise_for(k1, obj, v, flags, spec)
        v = v + Sdrift * dt
        mu, sigma = sde.transition(v, vec_t + vec_dt, vec_dt)
        v_out = mu + _bcast(sigma, v) * _noise_for(k2, obj, v, flags, spec)
        return v_out, mu

    if not is_cc:

        def solver(score_fn_x, score_fn_adj, init_flags, key):
            flags = init_flags
            kx, kadj, kscan = jax.random.split(key, 3)
            x = mask_x(sde_x.prior_sampling(kx, shape_x), flags)
            adj = mask_adjs(sde_adj.prior_sampling_sym(kadj, shape_adj), flags)

            def step(carry, it):
                x, adj = carry
                i, t = it
                vec_t = jnp.full((shape_adj[0],), t)
                vec_dt = jnp.full((shape_adj[0],), dt / 2)
                k = jax.random.fold_in(kscan, i)
                k1, k2, k3, k4 = jax.random.split(k, 4)

                score_x = score_fn_x(x, adj, flags, vec_t)
                score_adj = score_fn_adj(x, adj, flags, vec_t)
                Sdrift_x = -_bcast(sde_x.sde(x, vec_t)[1], x) ** 2 * score_x
                Sdrift_adj = -_bcast(sde_adj.sde(adj, vec_t)[1], adj) ** 2 * score_adj

                x, _ = correct(k1, sde_x, score_x, x, "x", flags, vec_t)
                adj, _ = correct(k2, sde_adj, score_adj, adj, "adj", flags, vec_t)

                x, x_mean = predict(k3, sde_x, x, Sdrift_x, "x", flags, vec_t, vec_dt)
                adj, adj_mean = predict(
                    k4, sde_adj, adj, Sdrift_adj, "adj", flags, vec_t, vec_dt
                )
                out = (x_mean[0], adj_mean[0]) if record_trajectory else None
                return (x, adj), ((x_mean, adj_mean), out)

            (x, adj), (x_mean, adj_mean), traj = _scan_steps(
                step, (x, adj), diff_steps, timesteps, record_trajectory,
                lean=False,
            )
            return SamplerOutput(
                x=x_mean if denoise else x,
                adj=adj_mean if denoise else adj,
                rank2=None,
                n_model_evals=0,
                trajectory=traj,
            )

        return solver

    assert sde_rank2 is not None and shape_rank2 is not None and spec is not None
    shape_rank2 = tuple(shape_rank2)

    def solver_cc(score_fn_x, score_fn_adj, score_fn_rank2, init_flags, key):
        flags = init_flags
        kx, kadj, kr2, kscan = jax.random.split(key, 4)
        x = mask_x(sde_x.prior_sampling(kx, shape_x), flags)
        adj = mask_adjs(sde_adj.prior_sampling_sym(kadj, shape_adj), flags)
        rank2 = mask_rank2(sde_rank2.prior_sampling(kr2, shape_rank2), spec, flags)

        def step(carry, it):
            x, adj, rank2 = carry
            i, t = it
            vec_t = jnp.full((shape_adj[0],), t)
            vec_dt = jnp.full((shape_adj[0],), dt / 2)
            k = jax.random.fold_in(kscan, i)
            k1, k2, k3, k4, k5, k6 = jax.random.split(k, 6)

            score_x = score_fn_x(x, adj, rank2, flags, vec_t)
            score_adj = score_fn_adj(x, adj, rank2, flags, vec_t)
            score_r2 = score_fn_rank2(x, adj, rank2, flags, vec_t)
            Sdrift_x = -_bcast(sde_x.sde(x, vec_t)[1], x) ** 2 * score_x
            Sdrift_adj = -_bcast(sde_adj.sde(adj, vec_t)[1], adj) ** 2 * score_adj
            Sdrift_r2 = -_bcast(sde_rank2.sde(rank2, vec_t)[1], rank2) ** 2 * score_r2

            x, _ = correct(k1, sde_x, score_x, x, "x", flags, vec_t)
            adj, _ = correct(k2, sde_adj, score_adj, adj, "adj", flags, vec_t)
            rank2, _ = correct(k3, sde_rank2, score_r2, rank2, "rank2", flags, vec_t)

            x, x_mean = predict(k4, sde_x, x, Sdrift_x, "x", flags, vec_t, vec_dt)
            adj, adj_mean = predict(
                k5, sde_adj, adj, Sdrift_adj, "adj", flags, vec_t, vec_dt
            )
            rank2, rank2_mean = predict(
                k6, sde_rank2, rank2, Sdrift_r2, "rank2", flags, vec_t, vec_dt
            )
            out = (
                (x_mean[0], adj_mean[0], rank2_mean[0]) if record_trajectory else None
            )
            return (x, adj, rank2), ((x_mean, adj_mean, rank2_mean), out)

        (x, adj, rank2), (x_mean, adj_mean, rank2_mean), traj = _scan_steps(
            step, (x, adj, rank2), diff_steps, timesteps, record_trajectory,
            lean=False,
        )
        return SamplerOutput(
            x=x_mean if denoise else x,
            adj=adj_mean if denoise else adj,
            rank2=rank2_mean if denoise else rank2,
            n_model_evals=0,
            trajectory=traj,
        )

    return solver_cc
