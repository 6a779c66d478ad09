"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_data_parallel_loss_matches_single_device():
    """Sharded global-batch loss == replicated loss (incl. batch-coupled
    Langevin-style norms through jnp.mean)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ccsd_tpu.diffusion.losses import get_sde_loss_fn
    from ccsd_tpu.diffusion.sde import VPSDE
    from ccsd_tpu.models.registry import load_model

    B, N, F = 16, 6, 4
    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F, depth=2,
                         nhid=4, use_bn=False, is_cc=False))
    ma = load_model(dict(model_type="ScoreNetworkA", max_feat_num=F,
                         max_node_num=N, nhid=4, num_layers=2, num_linears=1,
                         c_init=2, c_hid=3, c_final=2, adim=4, num_heads=2,
                         conv="GCN", use_bn=False, is_cc=False))
    px = mx.init(jax.random.PRNGKey(0))
    pa = ma.init(jax.random.PRNGKey(1))
    sde = VPSDE(N=10, beta_min=0.1, beta_max=1.0)
    loss_fn = get_sde_loss_fn(sde, sde, mx, ma)

    key = jax.random.PRNGKey(2)
    adj = jax.random.bernoulli(key, 0.5, (B, N, N)).astype(jnp.float32)
    adj = jnp.triu(adj, 1)
    adj = adj + jnp.swapaxes(adj, -1, -2)
    x = jax.nn.one_hot(adj.sum(-1).astype(jnp.int32), F)

    ref = jax.jit(loss_fn)(px, pa, x, adj, key)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sh = NamedSharding(mesh, P("data", None, None))
    xs = jax.device_put(x, sh)
    adjs = jax.device_put(adj, sh)
    out = jax.jit(loss_fn)(px, pa, xs, adjs, key)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]), rtol=2e-5)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 20, 20)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_sharded_sampler_matches_replicated():
    """PC sampling with the batch sharded over 8 devices returns the same
    result as unsharded execution (same PRNG keys)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ccsd_tpu.diffusion.losses import get_score_fn
    from ccsd_tpu.diffusion.sde import VPSDE
    from ccsd_tpu.diffusion.solvers import get_pc_sampler
    from ccsd_tpu.models.registry import load_model

    B, N, F = 16, 6, 4
    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F, depth=2,
                         nhid=4, use_bn=False, is_cc=False))
    ma = load_model(dict(model_type="ScoreNetworkA", max_feat_num=F,
                         max_node_num=N, nhid=4, num_layers=2, num_linears=1,
                         c_init=2, c_hid=3, c_final=2, adim=4, num_heads=2,
                         conv="GCN", use_bn=False, is_cc=False))
    px = mx.init(jax.random.PRNGKey(0))
    pa = ma.init(jax.random.PRNGKey(1))
    sde = VPSDE(N=6, beta_min=0.1, beta_max=1.0)
    samp = get_pc_sampler(sde, sde, (B, N, F), (B, N, N),
                          predictor="Euler", corrector="Langevin",
                          snr=0.05, scale_eps=0.7)
    sfx = get_score_fn(sde, mx, px)
    sfa = get_score_fn(sde, ma, pa)
    flags = jnp.ones((B, N))
    key = jax.random.PRNGKey(3)

    ref = jax.jit(lambda fl, k: samp(sfx, sfa, fl, k))(flags, key)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sh = NamedSharding(mesh, P("data", None))
    flags_sharded = jax.device_put(flags, sh)
    out = jax.jit(lambda fl, k: samp(sfx, sfa, fl, k))(flags_sharded, key)
    np.testing.assert_allclose(
        np.asarray(out.adj), np.asarray(ref.adj), rtol=1e-4, atol=2e-4
    )


def test_edge_partitioned_cc_loss_matches_replicated():
    """Sharding the rank-2 E axis over a ('data' x 'edge') mesh changes
    nothing numerically: GSPMD's inserted collectives reproduce the
    replicated CC loss bit-close."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ccsd_tpu.diffusion.losses import get_sde_loss_fn_cc
    from ccsd_tpu.diffusion.sde import VPSDE
    from ccsd_tpu.models.registry import load_model
    from ccsd_tpu.ops.cells import get_spec

    B, N, F = 8, 8, 5
    spec = get_spec(N, 3, 3)
    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F, depth=2,
                         nhid=4, use_bn=False, is_cc=True))
    ma = load_model(dict(model_type="ScoreNetworkA_CC", max_feat_num=F,
                         max_node_num=N, d_min=3, d_max=3, nhid=4, nhid_h=2,
                         num_layers=2, num_layers_h=1, num_linears=1,
                         num_linears_h=1, c_init=2, c_hid=3, c_hid_h=2,
                         c_final=2, c_final_h=2, adim=4, adim_h=2, num_heads=2,
                         num_heads_h=2, conv="GCN", conv_hodge="HCN",
                         use_bn=False, is_cc=True))
    mf = load_model(dict(model_type="ScoreNetworkF", num_layers_mlp=1,
                         num_layers=2, num_linears=1, nhid=2, c_hid=2,
                         c_final=2, cnum=2, max_node_num=N, d_min=3, d_max=3,
                         use_hodge_mask=True, use_bn=False, is_cc=True))
    px = mx.init(jax.random.PRNGKey(0))
    pa = ma.init(jax.random.PRNGKey(1))
    pf = mf.init(jax.random.PRNGKey(2))
    sde = VPSDE(N=10, beta_min=0.1, beta_max=1.0)
    loss_fn = get_sde_loss_fn_cc(sde, sde, sde, mx, ma, mf, spec)

    key = jax.random.PRNGKey(3)
    adj = jax.random.bernoulli(key, 0.5, (B, N, N)).astype(jnp.float32)
    adj = jnp.triu(adj, 1)
    adj = adj + jnp.swapaxes(adj, -1, -2)
    x = jax.nn.one_hot(adj.sum(-1).astype(jnp.int32), F)
    rank2 = jax.random.normal(key, (B, spec.num_edges, spec.num_cells))

    ref = jax.jit(loss_fn)(px, pa, pf, x, adj, rank2, key)

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "edge"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    adjs = jax.device_put(adj, NamedSharding(mesh, P("data", None, None)))
    r2s = jax.device_put(rank2, NamedSharding(mesh, P("data", "edge", None)))
    out = jax.jit(loss_fn)(px, pa, pf, xs, adjs, r2s, key)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-5)
