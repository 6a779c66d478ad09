"""Optimizer construction matching the reference training semantics.

The reference (ccsd/src/trainer.py:185-209, loader.py:143-150) does, per
model and per batch:  backward -> clip_grad_norm_(grad_norm) ->
torch.optim.Adam(lr, weight_decay).step(), with an ExponentialLR(gamma)
stepped once per epoch.  torch's Adam applies weight decay as L2 *added to
the gradient before the moment updates*, so the optax chain is
clip_by_global_norm -> add_decayed_weights -> adam — NOT adamw (decoupled).
"""

from __future__ import annotations

import optax


def make_optimizer(
    lr: float,
    weight_decay: float = 0.0,
    grad_norm: float | None = 1.0,
    lr_schedule: bool = False,
    lr_decay: float = 0.999,
    steps_per_epoch: int = 1,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam with torch-style L2 weight decay, grad clipping and per-epoch
    exponential lr decay (gamma ** epoch)."""
    if lr_schedule:
        schedule = lambda step: lr * lr_decay ** (step // steps_per_epoch)
    else:
        schedule = lr
    parts = []
    if grad_norm is not None:
        parts.append(optax.clip_by_global_norm(grad_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
