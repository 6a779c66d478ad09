"""Minimal functional NN primitives: Linear, MLP, initializers.

Design: each layer is a frozen dataclass of static hyperparameters with
``init(key) -> params`` and ``apply(params, *args) -> out``; params are plain
nested dicts/lists of jnp arrays (a pytree), so models compose freely with
jit / grad / vmap / pjit and shard trivially.

Numerics mirror ccsd/src/models/layers.py:20-290 (glorot-uniform weights,
zero biases, identical layer arithmetic) so the shipped PyTorch checkpoints
convert weight-for-weight (Linear kernels are stored (in, out) = torch W^T).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def glorot_uniform(key: jax.Array, shape: Sequence[int]) -> jnp.ndarray:
    """Glorot/Xavier uniform over the last two dims.  (layers.py:20-29)"""
    fan_in, fan_out = shape[-2], shape[-1]
    stdv = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, tuple(shape), jnp.float32, -stdv, stdv)


ACT: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "tanh": jnp.tanh,
}


@dataclass(frozen=True)
class Linear:
    in_dim: int
    out_dim: int

    def init(self, key: jax.Array) -> dict:
        return {
            "w": glorot_uniform(key, (self.in_dim, self.out_dim)),
            "b": jnp.zeros((self.out_dim,), jnp.float32),
        }

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        return x @ params["w"] + params["b"]


@dataclass(frozen=True)
class BatchNorm:
    """Batch normalization over the trailing feature dim using batch stats.

    The reference uses torch BatchNorm1d inside MLPs (layers.py:221-224) but
    every shipped config sets ``use_bn: False``; we normalize with current
    batch statistics (no running-average state) and document the divergence.
    """

    dim: int
    eps: float = 1e-5

    def init(self, key: jax.Array) -> dict:
        del key
        return {
            "scale": jnp.ones((self.dim,), jnp.float32),
            "bias": jnp.zeros((self.dim,), jnp.float32),
        }

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        axes = tuple(range(x.ndim - 1))
        mean = x.mean(axis=axes, keepdims=True)
        var = x.var(axis=axes, keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return xn * params["scale"] + params["bias"]


@dataclass(frozen=True)
class MLP:
    """n-layer perceptron; ``num_layers == 1`` degenerates to Linear.

    Parity: ccsd/src/models/layers.py:161-290.  Applies over the trailing
    dim of arbitrarily-ranked inputs (like torch.nn.Linear).
    """

    num_layers: int
    input_dim: int
    hidden_dim: int
    output_dim: int
    use_bn: bool = False
    act: str = "relu"

    def __post_init__(self):
        if self.num_layers < 1:
            raise ValueError("Number of layers should be >= 1.")

    @property
    def linears(self) -> list[Linear]:
        if self.num_layers == 1:
            return [Linear(self.input_dim, self.output_dim)]
        dims = (
            [self.input_dim]
            + [self.hidden_dim] * (self.num_layers - 1)
            + [self.output_dim]
        )
        return [Linear(dims[i], dims[i + 1]) for i in range(self.num_layers)]

    def init(self, key: jax.Array) -> dict:
        lin = self.linears
        keys = jax.random.split(key, len(lin))
        params: dict = {"linears": [l.init(k) for l, k in zip(lin, keys)]}
        if self.use_bn and self.num_layers > 1:
            bn = BatchNorm(self.hidden_dim)
            params["bns"] = [bn.init(key) for _ in range(self.num_layers - 1)]
        return params

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        lin = self.linears
        if self.num_layers == 1:
            return lin[0].apply(params["linears"][0], x)
        act = ACT[self.act]
        h = x
        for i in range(self.num_layers - 1):
            h = lin[i].apply(params["linears"][i], h)
            if self.use_bn:
                h = BatchNorm(self.hidden_dim).apply(params["bns"][i], h)
            h = act(h)
        return lin[-1].apply(params["linears"][-1], h)
