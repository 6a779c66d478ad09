"""Unit tests for static cell indexing, masks, and Hodge ops.

Brute-force oracles re-derive the reference semantics (dict/loop based,
cc_utils.py:44-96, 527-591, 1503-1588) in pure Python and compare against
the vectorized implementations.
"""

from itertools import combinations

import numpy as np
import jax.numpy as jnp

from ccsd_tpu.ops.cells import get_spec, rank2_dim
from ccsd_tpu.ops import hodge, masks

N, D_MIN, D_MAX = 6, 3, 4
B = 3


def _flags():
    f = np.ones((B, N), np.float32)
    f[0, 4:] = 0
    f[1, 0] = 0
    return f


def test_rank2_dim():
    E, K = rank2_dim(N, D_MIN, D_MAX)
    assert E == N * (N - 1) // 2
    from math import comb

    assert K == comb(N, 3) + comb(N, 4)


def test_cell_enumeration_order():
    spec = get_spec(N, D_MIN, D_MAX)
    # reference order: k ascending, lexicographic within k (cc_utils.py:71-76)
    expected = [c for k in (3, 4) for c in combinations(range(N), k)]
    assert spec.cells == expected
    assert list(map(tuple, spec.edge_uv)) == list(combinations(range(N), 2))


def test_rank2_flags_bruteforce():
    spec = get_spec(N, D_MIN, D_MAX)
    flags = _flags()
    fl, fr = masks.rank2_flags(spec, jnp.asarray(flags))
    fl, fr = np.asarray(fl), np.asarray(fr)
    for b in range(B):
        absent = {n for n in range(N) if flags[b, n] == 0}
        for i, (u, v) in enumerate(spec.edge_uv):
            assert fl[b, i] == (0.0 if (u in absent or v in absent) else 1.0)
        for j, cell in enumerate(spec.cells):
            assert fr[b, j] == (0.0 if absent & set(cell) else 1.0)


def test_mask_rank2_channels():
    spec = get_spec(N, D_MIN, D_MAX)
    flags = jnp.asarray(_flags())
    r2 = jnp.ones((B, 2, spec.num_edges, spec.num_cells))
    out3 = masks.mask_rank2(r2[:, 0], spec, flags)
    out4 = masks.mask_rank2(r2, spec, flags)
    np.testing.assert_allclose(np.asarray(out4[:, 0]), np.asarray(out3))
    np.testing.assert_allclose(np.asarray(out4[:, 0]), np.asarray(out4[:, 1]))


def test_hodgedual_roundtrip():
    rng = np.random.default_rng(0)
    adj = rng.standard_normal((B, 2, N, N)).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 1, 3, 2)
    hd = hodge.adj_to_hodgedual(jnp.asarray(adj))
    E = N * (N - 1) // 2
    assert hd.shape == (B, 2, E, E)
    # diagonal holds the strict upper triangle
    iu = np.triu_indices(N, 1)
    np.testing.assert_allclose(
        np.asarray(jnp.diagonal(hd, axis1=-2, axis2=-1)),
        adj[:, :, iu[0], iu[1]],
    )
    back = hodge.hodgedual_to_adj(hd)
    np.testing.assert_allclose(np.asarray(back), adj, atol=1e-6)


def test_pow_tensor_matches_matrix_powers():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((B, N, N)).astype(np.float32)
    out = np.asarray(masks.pow_tensor(jnp.asarray(a), 3))
    np.testing.assert_allclose(out[:, 0], a, rtol=1e-5)
    np.testing.assert_allclose(out[:, 1], a @ a, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out[:, 2], a @ a @ a, rtol=1e-4, atol=1e-3)


def test_pow_tensor_cc_hodge_powers():
    spec = get_spec(N, D_MIN, D_MAX)
    rng = np.random.default_rng(2)
    F = rng.standard_normal((B, spec.num_edges, spec.num_cells)).astype(np.float32)
    mask = np.asarray(hodge.default_mask(spec.num_edges))
    out = np.asarray(hodge.pow_tensor_cc(jnp.asarray(F), 3, jnp.asarray(mask)))
    H = (F @ F.transpose(0, 2, 1)) * mask[None]
    np.testing.assert_allclose(out[:, 0], F, rtol=1e-5)
    np.testing.assert_allclose(out[:, 1], H @ F, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(out[:, 2], H @ H @ F, rtol=1e-3, atol=1e-2)


def test_node_flags_and_quantize():
    adj = np.zeros((B, N, N), np.float32)
    adj[:, 0, 1] = adj[:, 1, 0] = 0.7
    f = np.asarray(masks.node_flags(jnp.asarray(adj)))
    assert f[:, :2].all() and not f[:, 2:].any()
    q = np.asarray(masks.quantize(jnp.asarray(adj)))
    assert q[0, 0, 1] == 1.0 and q[0, 2, 3] == 0.0


def test_quantize_mol():
    a = np.array([[0.2, 0.7, 1.9, 2.6, 3.4]])
    np.testing.assert_array_equal(masks.quantize_mol(a), [[0, 1, 2, 3, 3]])
