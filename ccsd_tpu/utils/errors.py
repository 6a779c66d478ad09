"""Framework errors + symmetry assertion.

Parity: ccsd/src/utils/errors.py:8-30 and graph_utils.py:254-271.
"""

from __future__ import annotations

import jax.numpy as jnp


class SymmetryError(Exception):
    """Raised when an adjacency tensor is not symmetric."""


def check_sym(adjs: jnp.ndarray, print_val: bool = False,
              epsilon: float = 1e-2) -> None:
    sym_error = float(jnp.abs(adjs - jnp.swapaxes(adjs, -1, -2)).sum())
    if not sym_error < epsilon:
        raise SymmetryError(f"Tensor not symmetric: {sym_error:.4e}")
    if print_val:
        print(f"{sym_error:.4e}")
