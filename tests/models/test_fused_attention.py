"""Parity of the channel-folded ("fused") attention fast path.

The fused path executes the same parameters as the unrolled per-channel
AttentionLayer (ccsd/src/models/attention.py:186-304 parity path) through
restructured contractions tuned for TPU:

  * (norm @ x) @ W instead of norm @ (x @ W) (associativity — one
    block-diagonal MXU matmul for all channels),
  * broadcast-multiply-reduce for the per-(channel, head) score products.

On CPU (pure f32) the two paths agree to float-reordering tolerance.
"""

import jax
import jax.numpy as jnp
import pytest

from ccsd_tpu.models.attention import AttentionLayer
from ccsd_tpu.models.registry import load_model

B, N, F = 4, 20, 10


def _sym(a):
    return (a + jnp.swapaxes(a, -1, -2)) / 2


def _flags():
    return jnp.ones((B, N)).at[0, -5:].set(0.0)


@pytest.mark.parametrize("conv", ["GCN", "MLP"])
def test_attention_layer_fused_matches_unrolled(conv):
    lay = AttentionLayer(2, F, 32, 32, 2, 8, 4, conv, False)
    fused = AttentionLayer(2, F, 32, 32, 2, 8, 4, conv, False, fused=True)
    params = lay.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, F))
    adj = _sym(jax.random.normal(jax.random.PRNGKey(2), (B, 2, N, N)))
    x0, a0 = lay.apply(params, x, adj, _flags())
    x1, a1 = fused.apply(params, x, adj, _flags())
    assert jnp.abs(x0 - x1).max() < 5e-5
    assert jnp.abs(a0 - a1).max() < 5e-5


@pytest.mark.parametrize("conv", ["GCN", "MLP"])
def test_score_network_a_fused(conv):
    cfg = dict(model_type="ScoreNetworkA", max_feat_num=F, max_node_num=N,
               nhid=32, num_layers=5, num_linears=2, c_init=2, c_hid=8,
               c_final=4, adim=32, num_heads=4, conv=conv, use_bn=False,
               is_cc=False)
    m0 = load_model(cfg)
    m1 = load_model({**cfg, "fused": True})
    params = m0.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, F))
    adj = _sym(jax.random.normal(jax.random.PRNGKey(2), (B, N, N)))
    s0 = m0.apply(params, x, adj, flags=_flags())
    s1 = m1.apply(params, x, adj, flags=_flags())
    assert jnp.abs(s0 - s1).max() < 1e-4


def test_score_network_x_gmh_fused():
    cfg = dict(model_type="ScoreNetworkX_GMH", max_feat_num=F, depth=3,
               nhid=32, num_linears=2, c_init=2, c_hid=8, c_final=4, adim=32,
               num_heads=4, conv="GCN", use_bn=False, is_cc=False)
    m0 = load_model(cfg)
    m1 = load_model({**cfg, "fused": True})
    params = m0.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, F))
    adj = _sym(jax.random.normal(jax.random.PRNGKey(2), (B, N, N)))
    s0 = m0.apply(params, x, adj, flags=_flags())
    s1 = m1.apply(params, x, adj, flags=_flags())
    assert jnp.abs(s0 - s1).max() < 1e-4


@pytest.mark.parametrize("num_layers_mlp", [1, 3])
def test_score_network_f_fused(num_layers_mlp):
    from ccsd_tpu.ops.cells import get_spec
    cfg = dict(model_type="ScoreNetworkF", num_layers_mlp=num_layers_mlp,
               num_layers=2, num_linears=1, nhid=4, c_hid=2, c_final=2,
               cnum=2, max_node_num=8, d_min=3, d_max=3, use_hodge_mask=True,
               use_bn=False, is_cc=True)
    m0 = load_model(cfg)
    m1 = load_model({**cfg, "fused": True})
    spec = get_spec(8, 3, 3)
    params = m0.init(jax.random.PRNGKey(0))
    x = jnp.zeros((B, 8, 5))
    adj = jnp.zeros((B, 8, 8))
    rank2 = jax.random.normal(
        jax.random.PRNGKey(1), (B, spec.num_edges, spec.num_cells)
    )
    flags = jnp.ones((B, 8)).at[0, -2:].set(0.0)
    s0 = m0.apply(params, x, adj, rank2, flags=flags)
    s1 = m1.apply(params, x, adj, rank2, flags=flags)
    assert jnp.abs(s0 - s1).max() < 5e-4


def test_score_network_a_cc_fused():
    cfg = dict(model_type="ScoreNetworkA_CC", max_feat_num=F, max_node_num=8,
               d_min=3, d_max=3, nhid=8, nhid_h=4, num_layers=2,
               num_layers_h=1, num_linears=1, num_linears_h=1, c_init=2,
               c_hid=4, c_hid_h=2, c_final=2, c_final_h=2, adim=8, adim_h=4,
               num_heads=2, num_heads_h=2, conv="GCN", conv_hodge="HCN",
               use_bn=False, is_cc=True)
    m0 = load_model(cfg)
    m1 = load_model({**cfg, "fused": True})
    params = m0.init(jax.random.PRNGKey(0))
    from ccsd_tpu.ops.cells import get_spec
    spec = get_spec(8, 3, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 8, F))
    adj = _sym(jax.random.normal(jax.random.PRNGKey(2), (B, 8, 8)))
    rank2 = jax.random.normal(
        jax.random.PRNGKey(3), (B, spec.num_edges, spec.num_cells)
    )
    flags = jnp.ones((B, 8)).at[0, -2:].set(0.0)
    s0 = m0.apply(params, x, adj, rank2, flags=flags)
    s1 = m1.apply(params, x, adj, rank2, flags=flags)
    assert jnp.abs(s0 - s1).max() < 1e-4
