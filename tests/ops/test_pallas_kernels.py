"""Pallas kernel numerics vs the jnp reference paths.

On CPU these run in interpreter mode; on TPU they compile to Mosaic and
match the XLA path exactly (0 ulp observed on TPU v5e).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccsd_tpu.models.attention import Attention
from ccsd_tpu.models.gcn import DenseGCNConv
from ccsd_tpu.ops.pallas.gcn import gcn_aggregate_pallas
from ccsd_tpu.ops.pallas.gmh_attention import gmh_attention_pallas


def _graph(B, N, Fi, seed=0):
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (B, N, Fi))
    adj = (jax.random.uniform(key, (B, N, N)) > 0.7).astype(jnp.float32)
    adj = jnp.triu(adj, 1)
    adj = adj + jnp.swapaxes(adj, -1, -2)
    return x, adj


@pytest.mark.parametrize("shape", [(3, 12, 5, 8), (2, 40, 8, 16)])
def test_gcn_kernel_matches_reference(shape):
    B, N, Fi, Fo = shape
    x, adj = _graph(B, N, Fi)
    gcn = DenseGCNConv(Fi, Fo)
    p = gcn.init(jax.random.PRNGKey(1))
    ref = gcn.apply(p, x, adj)
    out = gcn_aggregate_pallas(x, adj, p["weight"], p["bias"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gcn_kernel_improved_loop():
    x, adj = _graph(2, 10, 4)
    gcn = DenseGCNConv(4, 6, improved=True)
    p = gcn.init(jax.random.PRNGKey(2))
    ref = gcn.apply(p, x, adj)
    out = gcn_aggregate_pallas(x, adj, p["weight"], p["bias"], improved=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("H", [2, 4])
def test_gmh_attention_kernel_matches_reference(H):
    B, N, Fi, attn_dim, Fo = 2, 14, 6, 8, 8
    x, adj = _graph(B, N, Fi, seed=3)
    att = Attention(Fi, attn_dim, Fo, num_heads=H, conv="GCN")
    p = att.init(jax.random.PRNGKey(4))
    V0, A0 = att.apply(p, x, adj, None)
    V1, A1 = gmh_attention_pallas(
        x, adj, p["q"]["weight"], p["q"]["bias"], p["k"]["weight"],
        p["k"]["bias"], p["v"]["weight"], p["v"]["bias"], H, Fo,
    )
    np.testing.assert_allclose(np.asarray(V1), np.asarray(V0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A0),
                               rtol=1e-5, atol=1e-5)
