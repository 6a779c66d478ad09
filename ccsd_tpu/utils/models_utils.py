"""Model utilities: parameter counting.

Parity: ccsd/src/utils/models_utils.py:13-64 (get_ones is obsolete — jnp
ops are functional; the lru-cached ones-tensor micro-optimization it served
is a no-op under XLA constant folding).
"""

from __future__ import annotations

import jax
import numpy as np


def count_params(params) -> int:
    """Total number of scalar parameters in a param pytree."""
    return int(sum(np.prod(np.shape(x)) for x in jax.tree.leaves(params)))
