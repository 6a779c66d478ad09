"""Score wrappers and denoising score-matching (DSM) losses.

Parity targets: ccsd/src/losses.py:18-432.  The torch closures over mutable
nn.Modules become pure functions of (params, tensors, key), so one
``jax.grad`` of the summed loss reproduces the reference's separate
per-model backward passes exactly (each partial loss touches only its own
model's parameters).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ccsd_tpu.diffusion.sde import SDE, VESDE, _bcast, is_vp_like
from ccsd_tpu.ops.cells import ComplexSpec
from ccsd_tpu.ops.masks import (
    gen_noise,
    gen_noise_rank2,
    mask_adjs,
    mask_rank2,
    mask_x,
    node_flags,
)


def _compute_cast(params, compute_dtype):
    """Helpers for the selective-precision fast path (`sample.score_dtype`):
    cast the float leaves of ``params`` plus every model input to
    ``compute_dtype`` so the SCORE NETWORK runs in reduced precision while
    the reverse-diffusion carry, noise, and norm reductions stay f32 —
    unlike the ``sample.dtype`` bf16-carry mode, nothing on the integrator
    side is rounded.  Returns (params, cast_in, cast_out)."""
    if compute_dtype is None:
        ident = lambda v: v  # noqa: E731
        return params, ident, ident
    dt = jnp.dtype(compute_dtype)
    params = jax.tree.map(
        lambda a: a.astype(dt)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        params,
    )
    return params, (lambda v: v.astype(dt)), (lambda v: v.astype(jnp.float32))


def get_score_fn(sde: SDE, model, params, compute_dtype=None) -> Callable:
    """Graph score function (x, adj, flags, t) -> score.

    Parity: ccsd/src/losses.py:18-104.  VP/subVP scale the network output by
    -1/std(t); VE returns the raw output.  ``compute_dtype`` runs the model
    (params + inputs) at that precision and returns f32 scores.
    """
    params, cin, cout = _compute_cast(params, compute_dtype)
    if is_vp_like(sde):

        def score_fn(x, adj, flags, t):
            out = cout(model.apply(params, cin(x), cin(adj), flags=cin(flags)))
            std = sde.marginal_std(t)
            # match the model's dtype so a bf16 fast path is not silently
            # promoted back to f32 by the f32 std scalar
            return -out / _bcast(std, out).astype(out.dtype)

    elif isinstance(sde, VESDE):

        def score_fn(x, adj, flags, t):
            return cout(model.apply(params, cin(x), cin(adj), flags=cin(flags)))

    else:
        raise NotImplementedError(f"SDE class {type(sde).__name__} not supported.")
    return score_fn


def get_score_fn_cc(sde: SDE, model, params, compute_dtype=None) -> Callable:
    """CC score function (x, adj, rank2, flags, t) -> score.

    Parity: ccsd/src/losses.py:107-198.  ``compute_dtype`` as in
    :func:`get_score_fn`.
    """
    params, cin, cout = _compute_cast(params, compute_dtype)
    if is_vp_like(sde):

        def score_fn(x, adj, rank2, flags, t):
            out = cout(model.apply(
                params, cin(x), cin(adj), cin(rank2), flags=cin(flags)))
            std = sde.marginal_std(t)
            return -out / _bcast(std, out).astype(out.dtype)

    elif isinstance(sde, VESDE):

        def score_fn(x, adj, rank2, flags, t):
            return cout(model.apply(
                params, cin(x), cin(adj), cin(rank2), flags=cin(flags)))

    else:
        raise NotImplementedError(f"SDE class {type(sde).__name__} not supported.")
    return score_fn


def _reduce(losses: jnp.ndarray, reduce_mean: bool) -> jnp.ndarray:
    flat = losses.reshape(losses.shape[0], -1)
    if reduce_mean:
        return flat.mean(axis=-1)
    return 0.5 * flat.sum(axis=-1)


def get_sde_loss_fn(
    sde_x: SDE,
    sde_adj: SDE,
    model_x,
    model_adj,
    reduce_mean: bool = False,
    likelihood_weighting: bool = False,
    eps: float = 1e-5,
):
    """DSM loss for (X, A).  Parity: ccsd/src/losses.py:201-292.

    Returns ``loss_fn(params_x, params_adj, x, adj, key) -> (loss_x, loss_adj)``.
    """

    def loss_fn(params_x, params_adj, x, adj, key):
        score_fn_x = get_score_fn(sde_x, model_x, params_x)
        score_fn_adj = get_score_fn(sde_adj, model_adj, params_adj)

        k_t, k_zx, k_zadj = jax.random.split(key, 3)
        t = (
            jax.random.uniform(k_t, (adj.shape[0],), dtype=adj.dtype)
            * (sde_adj.T - eps)
            + eps
        )
        flags = node_flags(adj)

        z_x = gen_noise(k_zx, x, flags, sym=False)
        mean_x, std_x = sde_x.marginal_prob(x, t)
        perturbed_x = mask_x(mean_x + _bcast(std_x, x) * z_x, flags)

        z_adj = gen_noise(k_zadj, adj, flags, sym=True)
        mean_adj, std_adj = sde_adj.marginal_prob(adj, t)
        perturbed_adj = mask_adjs(mean_adj + _bcast(std_adj, adj) * z_adj, flags)

        score_x = score_fn_x(perturbed_x, perturbed_adj, flags, t)
        score_adj = score_fn_adj(perturbed_x, perturbed_adj, flags, t)

        if not likelihood_weighting:
            lx = _reduce(jnp.square(score_x * _bcast(std_x, score_x) + z_x), reduce_mean)
            la = _reduce(
                jnp.square(score_adj * _bcast(std_adj, score_adj) + z_adj), reduce_mean
            )
        else:
            g2_x = sde_x.sde(jnp.zeros_like(x), t)[1] ** 2
            lx = _reduce(
                jnp.square(score_x + z_x / _bcast(std_x, z_x)), reduce_mean
            ) * g2_x
            g2_adj = sde_adj.sde(jnp.zeros_like(adj), t)[1] ** 2
            la = _reduce(
                jnp.square(score_adj + z_adj / _bcast(std_adj, z_adj)), reduce_mean
            ) * g2_adj

        return lx.mean(), la.mean()

    return loss_fn


def get_sde_loss_fn_cc(
    sde_x: SDE,
    sde_adj: SDE,
    sde_rank2: SDE,
    model_x,
    model_adj,
    model_rank2,
    spec: ComplexSpec,
    reduce_mean: bool = False,
    likelihood_weighting: bool = False,
    eps: float = 1e-5,
):
    """DSM loss for (X, A, F).  Parity: ccsd/src/losses.py:295-432.

    Returns ``loss_fn(params_x, params_adj, params_rank2, x, adj, rank2, key)
    -> (loss_x, loss_adj, loss_rank2)``.
    """

    def loss_fn(params_x, params_adj, params_rank2, x, adj, rank2, key):
        score_fn_x = get_score_fn_cc(sde_x, model_x, params_x)
        score_fn_adj = get_score_fn_cc(sde_adj, model_adj, params_adj)
        score_fn_rank2 = get_score_fn_cc(sde_rank2, model_rank2, params_rank2)

        k_t, k_zx, k_zadj, k_zr2 = jax.random.split(key, 4)
        t = (
            jax.random.uniform(k_t, (adj.shape[0],), dtype=adj.dtype)
            * (sde_adj.T - eps)
            + eps
        )
        flags = node_flags(adj)

        z_x = gen_noise(k_zx, x, flags, sym=False)
        mean_x, std_x = sde_x.marginal_prob(x, t)
        perturbed_x = mask_x(mean_x + _bcast(std_x, x) * z_x, flags)

        z_adj = gen_noise(k_zadj, adj, flags, sym=True)
        mean_adj, std_adj = sde_adj.marginal_prob(adj, t)
        perturbed_adj = mask_adjs(mean_adj + _bcast(std_adj, adj) * z_adj, flags)

        z_rank2 = gen_noise_rank2(k_zr2, rank2, spec, flags)
        mean_r2, std_r2 = sde_rank2.marginal_prob(rank2, t)
        perturbed_rank2 = mask_rank2(
            mean_r2 + _bcast(std_r2, rank2) * z_rank2, spec, flags
        )

        score_x = score_fn_x(perturbed_x, perturbed_adj, perturbed_rank2, flags, t)
        score_adj = score_fn_adj(perturbed_x, perturbed_adj, perturbed_rank2, flags, t)
        score_r2 = score_fn_rank2(perturbed_x, perturbed_adj, perturbed_rank2, flags, t)

        if not likelihood_weighting:
            lx = _reduce(jnp.square(score_x * _bcast(std_x, score_x) + z_x), reduce_mean)
            la = _reduce(
                jnp.square(score_adj * _bcast(std_adj, score_adj) + z_adj), reduce_mean
            )
            lr = _reduce(
                jnp.square(score_r2 * _bcast(std_r2, score_r2) + z_rank2), reduce_mean
            )
        else:
            g2_x = sde_x.sde(jnp.zeros_like(x), t)[1] ** 2
            lx = _reduce(
                jnp.square(score_x + z_x / _bcast(std_x, z_x)), reduce_mean
            ) * g2_x
            g2_adj = sde_adj.sde(jnp.zeros_like(adj), t)[1] ** 2
            la = _reduce(
                jnp.square(score_adj + z_adj / _bcast(std_adj, z_adj)), reduce_mean
            ) * g2_adj
            g2_r2 = sde_rank2.sde(jnp.zeros_like(rank2), t)[1] ** 2
            lr = _reduce(
                jnp.square(score_r2 + z_rank2 / _bcast(std_r2, z_rank2)), reduce_mean
            ) * g2_r2

        return lx.mean(), la.mean(), lr.mean()

    return loss_fn


def get_score_fn_rank2_dynamic(sde: SDE, model, params, dyn) -> Callable:
    """Stage-2 score for the two-stage (open-universe) sampler.

    The F-model conditions on the generated adjacency only through the
    per-sample candidate universe ``dyn`` (diffusion/two_stage.py); the
    returned closure has signature ``(rank2, flags, t) -> score``.
    """
    if is_vp_like(sde):

        def score_fn(rank2, flags, t):
            out = model.apply(
                params, None, None, rank2, flags=flags,
                dyn=(dyn.member, dyn.valid),
            )
            return -out / _bcast(sde.marginal_std(t), out)

    elif isinstance(sde, VESDE):

        def score_fn(rank2, flags, t):
            return model.apply(
                params, None, None, rank2, flags=flags,
                dyn=(dyn.member, dyn.valid),
            )

    else:
        raise NotImplementedError(f"SDE class {type(sde).__name__} not supported.")
    return score_fn


def get_rank2_dynamic_loss_fn(
    sde_rank2: SDE,
    model_rank2,
    spec: ComplexSpec,
    reduce_mean: bool = False,
    eps: float = 1e-5,
):
    """DSM loss for F alone over per-sample candidate universes.

    Trains the stage-2 model of the two-stage factorization: each training
    sample's universe is derived from ITS OWN adjacency (the same bridge
    used at sampling time), and the clean F restricted to those columns is
    the target.  Returns ``loss_fn(params, rank2, flags, member, valid, key)
    -> loss`` (same reduce semantics as losses.py:229-233).
    """
    from ccsd_tpu.ops.masks import gen_noise_rank2_dynamic, mask_rank2_dynamic

    def loss_fn(params, rank2, flags, member, valid, key):
        k_t, k_z = jax.random.split(key)
        t = (
            jax.random.uniform(k_t, (rank2.shape[0],), dtype=rank2.dtype)
            * (sde_rank2.T - eps)
            + eps
        )
        z = gen_noise_rank2_dynamic(k_z, rank2, spec, member, valid, flags)
        mean, std = sde_rank2.marginal_prob(rank2, t)
        perturbed = mask_rank2_dynamic(
            mean + _bcast(std, rank2) * z, spec, member, valid, flags
        )
        out = model_rank2.apply(
            params, None, None, perturbed, flags=flags, dyn=(member, valid)
        )
        if is_vp_like(sde_rank2):
            score = -out / _bcast(std, out)
        else:
            score = out
        losses = jnp.square(score * _bcast(std, score) + z)
        return _reduce(losses, reduce_mean).mean()

    return loss_fn
