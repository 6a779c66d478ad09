"""Sampler smoke + invariant tests (masking, symmetry, finiteness)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ccsd_tpu.diffusion.losses import get_score_fn, get_score_fn_cc
from ccsd_tpu.diffusion.sde import VESDE, VPSDE
from ccsd_tpu.diffusion.solvers import get_pc_sampler, get_s4_solver
from ccsd_tpu.models.registry import load_model
from ccsd_tpu.ops.cells import get_spec

B, N, F = 4, 6, 3
D_MIN, D_MAX = 3, 3


@pytest.fixture(scope="module")
def graph_models():
    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F, depth=2,
                         nhid=4, use_bn=False, is_cc=False))
    ma = load_model(dict(model_type="ScoreNetworkA", max_feat_num=F,
                         max_node_num=N, nhid=4, num_layers=2, num_linears=2,
                         c_init=2, c_hid=3, c_final=2, adim=4, num_heads=2,
                         conv="GCN", use_bn=False, is_cc=False))
    return mx, mx.init(jax.random.PRNGKey(0)), ma, ma.init(jax.random.PRNGKey(1))


def _flags():
    f = np.ones((B, N), np.float32)
    f[0, -2:] = 0
    return jnp.asarray(f)


@pytest.mark.parametrize("predictor", ["Euler", "Reverse"])
@pytest.mark.parametrize("corrector", ["Langevin", "None"])
def test_pc_sampler_graph(graph_models, predictor, corrector):
    mx, px, ma, pa = graph_models
    sde_x = VPSDE(N=8, beta_min=0.1, beta_max=1.0)
    sde_adj = VPSDE(N=8, beta_min=0.1, beta_max=1.0)
    sfx = get_score_fn(sde_x, mx, px)
    sfa = get_score_fn(sde_adj, ma, pa)
    samp = get_pc_sampler(sde_x, sde_adj, (B, N, F), (B, N, N),
                          predictor=predictor, corrector=corrector,
                          snr=0.05, scale_eps=0.7, n_steps=1, eps=1e-4)
    flags = _flags()
    out = jax.jit(lambda fl, k: samp(sfx, sfa, fl, k))(flags, jax.random.PRNGKey(2))
    x, adj = np.asarray(out.x), np.asarray(out.adj)
    assert np.isfinite(x).all() and np.isfinite(adj).all()
    np.testing.assert_allclose(adj, adj.transpose(0, 2, 1), atol=1e-5)
    # masked nodes stay zero
    assert not x[0, -2:].any()
    assert not adj[0, -2:].any() and not adj[0, :, -2:].any()
    assert out.n_model_evals == 8 * 2


def test_pc_sampler_ve(graph_models):
    mx, px, ma, pa = graph_models
    sde_x = VESDE(N=5, sigma_min=0.1, sigma_max=1.0)
    sde_adj = VESDE(N=5, sigma_min=0.1, sigma_max=1.0)
    samp = get_pc_sampler(sde_x, sde_adj, (B, N, F), (B, N, N),
                          predictor="Reverse", corrector="Langevin")
    out = samp(get_score_fn(sde_x, mx, px), get_score_fn(sde_adj, ma, pa),
               _flags(), jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(out.adj)).all()


def test_s4_solver_graph(graph_models):
    mx, px, ma, pa = graph_models
    sde_x = VPSDE(N=6, beta_min=0.1, beta_max=1.0)
    sde_adj = VPSDE(N=6, beta_min=0.1, beta_max=1.0)
    samp = get_s4_solver(sde_x, sde_adj, (B, N, F), (B, N, N),
                         snr=0.05, scale_eps=0.7)
    out = jax.jit(
        lambda fl, k: samp(get_score_fn(sde_x, mx, px),
                           get_score_fn(sde_adj, ma, pa), fl, k)
    )(_flags(), jax.random.PRNGKey(4))
    assert np.isfinite(np.asarray(out.x)).all()
    assert np.isfinite(np.asarray(out.adj)).all()


def test_pc_sampler_cc():
    spec = get_spec(N, D_MIN, D_MAX)
    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F, depth=2,
                         nhid=4, use_bn=False, is_cc=True))
    ma = load_model(dict(model_type="ScoreNetworkA_CC", max_feat_num=F,
                         max_node_num=N, d_min=D_MIN, d_max=D_MAX, nhid=4,
                         nhid_h=2, num_layers=2, num_layers_h=1, num_linears=1,
                         num_linears_h=1, c_init=2, c_hid=3, c_hid_h=2,
                         c_final=2, c_final_h=2, adim=4, adim_h=2, num_heads=2,
                         num_heads_h=2, conv="GCN", conv_hodge="HCN",
                         use_bn=False, is_cc=True))
    mf = load_model(dict(model_type="ScoreNetworkF", num_layers_mlp=1,
                         num_layers=2, num_linears=1, nhid=2, c_hid=2,
                         c_final=2, cnum=2, max_node_num=N, d_min=D_MIN,
                         d_max=D_MAX, use_hodge_mask=True, use_bn=False,
                         is_cc=True))
    px = mx.init(jax.random.PRNGKey(0))
    pa = ma.init(jax.random.PRNGKey(1))
    pf = mf.init(jax.random.PRNGKey(2))
    sde = VPSDE(N=4, beta_min=0.1, beta_max=1.0)
    samp = get_pc_sampler(
        sde, sde, (B, N, F), (B, N, N), predictor="Euler", corrector="Langevin",
        snr=0.05, scale_eps=0.7, is_cc=True, sde_rank2=sde,
        shape_rank2=(B, spec.num_edges, spec.num_cells), spec=spec,
    )
    out = jax.jit(
        lambda fl, k: samp(
            get_score_fn_cc(sde, mx, px), get_score_fn_cc(sde, ma, pa),
            get_score_fn_cc(sde, mf, pf), fl, k)
    )(_flags(), jax.random.PRNGKey(5))
    r2 = np.asarray(out.rank2)
    assert np.isfinite(r2).all()
    # rank-2 rows/cols of dead edges/cells stay zero for batch 0 (2 dead nodes)
    from ccsd_tpu.ops import masks

    fl, fr = masks.rank2_flags(spec, _flags())
    dead_rows = np.asarray(fl[0]) == 0
    dead_cols = np.asarray(fr[0]) == 0
    assert not r2[0][dead_rows].any()
    assert not r2[0][:, dead_cols].any()


def test_trajectory_recording(graph_models):
    mx, px, ma, pa = graph_models
    sde = VPSDE(N=5, beta_min=0.1, beta_max=1.0)
    samp = get_pc_sampler(sde, sde, (B, N, F), (B, N, N),
                          record_trajectory=True)
    out = samp(get_score_fn(sde, mx, px), get_score_fn(sde, ma, pa),
               _flags(), jax.random.PRNGKey(6))
    xt, at = out.trajectory
    assert xt.shape == (5, N, F) and at.shape == (5, N, N)


def test_subvp_sampler(graph_models):
    """subVP SDE through the Euler predictor (its discretize is the base
    Euler form, matching the reference's non-overridden subVPSDE)."""
    from ccsd_tpu.diffusion.sde import subVPSDE

    mx, px, ma, pa = graph_models
    sde = subVPSDE(N=6, beta_min=0.1, beta_max=1.0)
    samp = get_pc_sampler(sde, sde, (B, N, F), (B, N, N),
                          predictor="Euler", corrector="Langevin",
                          snr=0.05, scale_eps=0.7)
    out = samp(get_score_fn(sde, mx, px), get_score_fn(sde, ma, pa),
               _flags(), jax.random.PRNGKey(9))
    assert np.isfinite(np.asarray(out.adj)).all()


@pytest.mark.slow
def test_probability_flow_ode(graph_models):
    """probability_flow=True: deterministic reverse ODE (diffusion zeroed)."""
    mx, px, ma, pa = graph_models
    sde = VPSDE(N=6, beta_min=0.1, beta_max=1.0)
    samp = get_pc_sampler(sde, sde, (B, N, F), (B, N, N),
                          predictor="Euler", corrector="None",
                          probability_flow=True)
    sfx, sfa = get_score_fn(sde, mx, px), get_score_fn(sde, ma, pa)
    o1 = samp(sfx, sfa, _flags(), jax.random.PRNGKey(1))
    o2 = samp(sfx, sfa, _flags(), jax.random.PRNGKey(2))
    # same prior sample keys differ, but the *update* has no noise term:
    # running twice from the same key must be identical
    o3 = samp(sfx, sfa, _flags(), jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(o1.adj), np.asarray(o3.adj))
    assert not np.allclose(np.asarray(o1.adj), np.asarray(o2.adj))


def test_eval_array_batch():
    from ccsd_tpu.eval.stats import eval_array_batch

    rng = np.random.default_rng(0)
    adj = (rng.random((6, 8, 8)) > 0.6).astype(float)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 2, 1)
    res = eval_array_batch(adj, adj, methods=["degree", "spectral"])
    assert res["degree"] == pytest.approx(0.0, abs=1e-9)


def test_s4_solver_cc():
    spec = get_spec(N, D_MIN, D_MAX)
    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F, depth=2,
                         nhid=4, use_bn=False, is_cc=True))
    mf = load_model(dict(model_type="ScoreNetworkF", num_layers_mlp=1,
                         num_layers=2, num_linears=1, nhid=2, c_hid=2,
                         c_final=2, cnum=2, max_node_num=N, d_min=D_MIN,
                         d_max=D_MAX, use_hodge_mask=True, use_bn=False,
                         is_cc=True))
    ma = load_model(dict(model_type="ScoreNetworkA_CC", max_feat_num=F,
                         max_node_num=N, d_min=D_MIN, d_max=D_MAX, nhid=4,
                         nhid_h=2, num_layers=2, num_layers_h=1, num_linears=1,
                         num_linears_h=1, c_init=2, c_hid=3, c_hid_h=2,
                         c_final=2, c_final_h=2, adim=4, adim_h=2, num_heads=2,
                         num_heads_h=2, conv="GCN", conv_hodge="HCN",
                         use_bn=False, is_cc=True))
    px, pa, pf = (mx.init(jax.random.PRNGKey(0)), ma.init(jax.random.PRNGKey(1)),
                  mf.init(jax.random.PRNGKey(2)))
    # smoke only: ScoreNetworkF's Hodge power iteration is cubic in its
    # input, so UNTRAINED weights blow up within a few S4 steps (the torch
    # reference behaves identically); 2 VE steps stay finite
    sde = VESDE(N=2, sigma_min=0.1, sigma_max=1.0)
    samp = get_s4_solver(sde, sde, (B, N, F), (B, N, N), snr=0.1,
                         scale_eps=0.7, is_cc=True, sde_rank2=sde,
                         shape_rank2=(B, spec.num_edges, spec.num_cells),
                         spec=spec)
    out = jax.jit(lambda fl, k: samp(
        get_score_fn_cc(sde, mx, px), get_score_fn_cc(sde, ma, pa),
        get_score_fn_cc(sde, mf, pf), fl, k))(_flags(), jax.random.PRNGKey(7))
    assert np.isfinite(np.asarray(out.rank2)).all()
    assert np.isfinite(np.asarray(out.adj)).all()


def test_score_dtype_selective_precision(graph_models):
    """sample.score_dtype path: bf16 score-network compute returns f32
    scores close to the f32 reference (carry/noise/norms stay exact f32 —
    unlike the bf16-carry mode nothing integrator-side is rounded)."""
    mx, px, ma, pa = graph_models
    sde = VPSDE(N=8, beta_min=0.1, beta_max=1.0)
    flags = _flags()
    k = jax.random.PRNGKey(2)
    x = jax.random.normal(k, (B, N, F))
    adj = jax.random.normal(k, (B, N, N))
    adj = (adj + adj.transpose(0, 2, 1)) / 2
    t = jnp.full((B,), 0.5)

    f32_fn = get_score_fn(sde, ma, pa)
    bf_fn = get_score_fn(sde, ma, pa, compute_dtype=jnp.bfloat16)
    ref = np.asarray(f32_fn(x, adj, flags, t))
    got = np.asarray(bf_fn(x, adj, flags, t))
    assert got.dtype == np.float32
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 0.05

    # CC variant
    spec = get_spec(N, D_MIN, D_MAX)
    mf = load_model(dict(model_type="ScoreNetworkF", num_layers_mlp=1,
                         num_layers=2, num_linears=1, nhid=4, c_hid=2,
                         c_final=2, cnum=2, max_node_num=N, d_min=D_MIN,
                         d_max=D_MAX, use_hodge_mask=True, use_bn=False,
                         is_cc=True))
    pf = mf.init(jax.random.PRNGKey(3))
    r2 = jax.random.normal(k, (B, spec.num_edges, spec.num_cells))
    ref = np.asarray(get_score_fn_cc(sde, mf, pf)(x, adj, r2, flags, t))
    got = np.asarray(get_score_fn_cc(sde, mf, pf,
                                     compute_dtype=jnp.bfloat16)(
        x, adj, r2, flags, t))
    assert got.dtype == np.float32
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 0.05
