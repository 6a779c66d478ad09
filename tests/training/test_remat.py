"""Rematerialization (train.remat): gradients identical, memory traded.

RematModel wraps score-model forwards in jax.checkpoint; grads must match
the unwrapped path exactly (same math, recomputed activations).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccsd_tpu.diffusion.losses import get_sde_loss_fn_cc
from ccsd_tpu.diffusion.sde import VPSDE
from ccsd_tpu.models.registry import RematModel, load_model
from ccsd_tpu.ops.cells import get_spec
from ccsd_tpu.ops.masks import mask_rank2


@pytest.mark.slow
def test_remat_grads_match():
    B, N, F = 4, 8, 5
    spec = get_spec(N, 3, 3)
    models = {
        "x": load_model(dict(model_type="ScoreNetworkX", max_feat_num=F,
                             depth=2, nhid=8, use_bn=False, is_cc=True)),
        "adj": load_model(dict(
            model_type="ScoreNetworkA_CC", max_feat_num=F, max_node_num=N,
            d_min=3, d_max=3, nhid=8, nhid_h=4, num_layers=2, num_layers_h=1,
            num_linears=1, num_linears_h=1, c_init=2, c_hid=4, c_hid_h=2,
            c_final=2, c_final_h=2, adim=8, adim_h=4, num_heads=2,
            num_heads_h=2, conv="GCN", conv_hodge="HCN", use_bn=False,
            is_cc=True)),
        "rank2": load_model(dict(
            model_type="ScoreNetworkF", num_layers_mlp=1, num_layers=2,
            num_linears=1, nhid=4, c_hid=2, c_final=2, cnum=2,
            max_node_num=N, d_min=3, d_max=3, use_hodge_mask=True,
            use_bn=False, is_cc=True)),
    }
    params = {n: m.init(jax.random.PRNGKey(i))
              for i, (n, m) in enumerate(models.items())}
    sdes = {n: VPSDE(N=10, beta_min=0.1, beta_max=1.0) for n in models}

    adj = jax.random.bernoulli(
        jax.random.PRNGKey(5), 0.4, (B, N, N)).astype(jnp.float32)
    adj = jnp.triu(adj, 1)
    adj = adj + jnp.swapaxes(adj, -1, -2)
    x = jax.nn.one_hot(adj.sum(-1).astype(jnp.int32), F)
    rank2 = mask_rank2(
        jax.random.normal(jax.random.PRNGKey(6),
                          (B, spec.num_edges, spec.num_cells)),
        spec, jnp.ones((B, N)),
    )
    key = jax.random.PRNGKey(7)

    def grads_with(mdl):
        loss_fn = get_sde_loss_fn_cc(
            sdes["x"], sdes["adj"], sdes["rank2"],
            mdl["x"], mdl["adj"], mdl["rank2"], spec,
        )

        def tot(params):
            lx, la, lr = loss_fn(
                params["x"], params["adj"], params["rank2"], x, adj, rank2,
                key,
            )
            return lx + la + lr

        return jax.grad(tot)(params)

    g_plain = grads_with(models)
    g_remat = grads_with({n: RematModel(m) for n, m in models.items()})
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_remat_model_forwards_attributes():
    m = load_model(dict(model_type="ScoreNetworkF", num_layers_mlp=1,
                        num_layers=2, num_linears=1, nhid=4, c_hid=2,
                        c_final=2, cnum=2, max_node_num=8, d_min=3, d_max=3,
                        use_hodge_mask=True, use_bn=False, is_cc=True))
    r = RematModel(m)
    assert r.spec is m.spec  # attribute passthrough (Trainer uses .spec)
