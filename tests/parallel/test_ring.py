"""Ring (explicit shard_map) edge-partitioned Hodge ops == dense path.

Validates the hand comm/compute path (parallel/ring.py) against the
single-device dense HodgeAttention on the virtual CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ccsd_tpu.models.hodge_nn import HodgeAttention
from ccsd_tpu.parallel.ring import (
    hodge_attention_sharded,
    ring_gather_matmul,
    ring_scores,
    sharded_transpose,
)

B, E, K, A = 2, 32, 12, 8
P_EDGE = 4


def _mesh():
    devs = np.array(jax.devices()[:P_EDGE]).reshape(P_EDGE)
    return Mesh(devs, ("edge",))


def _shard_map(mesh, fn, in_specs, out_specs):
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )


def test_ring_gather_matmul_matches_dense():
    mesh = _mesh()
    x = jax.random.normal(jax.random.PRNGKey(0), (B, E, E))
    y = jax.random.normal(jax.random.PRNGKey(1), (B, E, K))
    fn = _shard_map(
        mesh,
        lambda xl, yl: ring_gather_matmul(xl, yl, "edge"),
        (P(None, "edge", None), P(None, "edge", None)),
        P(None, "edge", None),
    )
    np.testing.assert_allclose(
        np.asarray(fn(x, y)), np.asarray(x @ y), rtol=1e-5, atol=1e-5
    )


def test_ring_scores_matches_dense():
    mesh = _mesh()
    q = jax.random.normal(jax.random.PRNGKey(2), (B, E, A))
    k = jax.random.normal(jax.random.PRNGKey(3), (B, E, A))
    fn = _shard_map(
        mesh,
        lambda ql, kl: ring_scores(ql, kl, "edge"),
        (P(None, "edge", None), P(None, "edge", None)),
        P(None, "edge", None),
    )
    np.testing.assert_allclose(
        np.asarray(fn(q, k)), np.asarray(q @ jnp.swapaxes(k, -1, -2)),
        rtol=1e-5, atol=1e-5,
    )


def test_sharded_transpose_matches_dense():
    mesh = _mesh()
    a = jax.random.normal(jax.random.PRNGKey(4), (B, E, E))
    fn = _shard_map(
        mesh,
        lambda al: sharded_transpose(al, "edge"),
        (P(None, "edge", None),),
        P(None, "edge", None),
    )
    np.testing.assert_allclose(
        np.asarray(fn(a)), np.asarray(jnp.swapaxes(a, -1, -2)),
        rtol=1e-6, atol=1e-6,
    )


def test_hodge_attention_sharded_matches_dense():
    mesh = _mesh()
    attn = HodgeAttention(K, A, K, num_heads=2, conv="HCN")
    params = attn.init(jax.random.PRNGKey(5))
    ha = jax.random.normal(jax.random.PRNGKey(6), (B, E, E))
    ha = (ha + jnp.swapaxes(ha, -1, -2)) / 2
    r2 = jax.random.normal(jax.random.PRNGKey(7), (B, E, K))

    v_ref, a_ref = attn.apply(params, ha, r2, flags=None)

    fn = _shard_map(
        mesh,
        lambda hl, rl: hodge_attention_sharded(
            params, hl, rl, "edge", num_heads=2, attn_dim=A, out_dim=K,
        ),
        (P(None, "edge", None), P(None, "edge", None)),
        (P(None, "edge", None), P(None, "edge", None)),
    )
    v_ring, a_ring = fn(ha, r2)
    np.testing.assert_allclose(
        np.asarray(v_ring), np.asarray(v_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a_ring), np.asarray(a_ref), rtol=1e-5, atol=1e-5
    )
