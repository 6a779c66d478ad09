"""Two-stage open-universe sampling: bridge, dynamic masks, end-to-end.

No reference counterpart (the reference's universe is global and static);
the dynamic masks are validated by equivalence against the static-spec
masks on a matching universe, and the bridge against known graphs.
"""

import networkx as nx
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccsd_tpu.diffusion.losses import (
    get_rank2_dynamic_loss_fn,
    get_score_fn,
    get_score_fn_rank2_dynamic,
)
from ccsd_tpu.diffusion.sde import VPSDE
from ccsd_tpu.diffusion.solvers import get_pc_sampler
from ccsd_tpu.diffusion.two_stage import (
    DynamicCells,
    candidate_cells_from_graph,
    dynamic_cells_from_adjs,
    get_rank2_sampler,
    incidence_from_dynamic,
    two_stage_sample,
)
from ccsd_tpu.models.registry import load_model
from ccsd_tpu.ops.cells import get_spec
from ccsd_tpu.ops.masks import (
    cell_flags,
    cell_flags_dynamic,
    mask_rank2,
    mask_rank2_dynamic,
)

N, D_MIN, D_MAX = 8, 3, 4


def _dyn_from_spec(spec, B):
    member = jnp.broadcast_to(
        jnp.asarray(spec.cell_mask)[None], (B, spec.num_cells, spec.N)
    )
    valid = jnp.ones((B, spec.num_cells))
    return DynamicCells(member=member, valid=valid)


def test_dynamic_masks_match_static_on_same_universe():
    cells = ((0, 1, 2), (1, 2, 3), (0, 2, 4, 5))
    spec = get_spec(N, D_MIN, D_MAX, cells)
    B = 3
    dyn = _dyn_from_spec(spec, B)
    flags = jnp.ones((B, N)).at[1, -3:].set(0.0)
    r2 = jax.random.normal(
        jax.random.PRNGKey(0), (B, spec.num_edges, spec.num_cells)
    )
    assert jnp.allclose(
        cell_flags_dynamic(dyn.member, dyn.valid, flags),
        cell_flags(spec, flags),
    )
    assert jnp.allclose(
        mask_rank2_dynamic(r2, spec, dyn.member, dyn.valid, flags),
        mask_rank2(r2, spec, flags),
    )


def test_candidate_cells_cycles():
    g = nx.Graph([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 2)])
    cells = candidate_cells_from_graph(g, 3, 4, "cycles")
    assert (0, 1, 2) in cells
    assert (2, 3, 4, 5) in cells
    assert all(3 <= len(c) <= 4 for c in cells)


def test_candidate_cells_path_based():
    g = nx.path_graph(5)
    cells = candidate_cells_from_graph(
        g, 3, 3, "path_based", path_length=3
    )
    assert (0, 1, 2) in cells and (1, 2, 3) in cells and (2, 3, 4) in cells
    assert all(len(c) == 3 for c in cells)


def test_dynamic_cells_from_adjs_padding_and_budget():
    a1 = nx.to_numpy_array(nx.cycle_graph(4))
    a2 = np.zeros((4, 4))
    adjs = np.zeros((2, N, N))
    adjs[0, :4, :4] = a1
    adjs[1, :4, :4] = a2
    dyn = dynamic_cells_from_adjs(adjs, 3, 4)
    assert dyn.member.shape == (2, 1, N)
    assert float(dyn.valid[0].sum()) == 1.0  # the 4-cycle
    assert float(dyn.valid[1].sum()) == 0.0  # empty graph -> padding only
    np.testing.assert_allclose(
        np.asarray(dyn.member[0, 0, :4]), np.ones(4)
    )


def test_incidence_from_dynamic_matches_codec():
    from ccsd_tpu.data.cc_codec import create_incidence_1_2

    g = nx.cycle_graph(4)
    adj = np.zeros((N, N))
    adj[:4, :4] = nx.to_numpy_array(g)
    spec_full = get_spec(N, 3, 4)
    dyn = dynamic_cells_from_adjs(adj[None], 3, 4)
    F_dyn = incidence_from_dynamic(jnp.asarray(adj)[None], spec_full, dyn)
    # the single candidate cell is {0,1,2,3}; check against the codec's
    # incidence for that cell as a custom universe
    spec_cell = get_spec(N, 3, 4, ((0, 1, 2, 3),))
    F_ref = create_incidence_1_2(
        N, adj, 3, 4, {frozenset((0, 1, 2, 3)): {"weight": 1}},
        spec=spec_cell,
    )
    np.testing.assert_allclose(np.asarray(F_dyn[0]), F_ref, atol=1e-6)


def test_dynamic_loss_finite_and_trains():
    spec = get_spec(N, D_MIN, D_MAX)
    B = 4
    mf = load_model(dict(model_type="ScoreNetworkF", num_layers_mlp=1,
                         num_layers=2, num_linears=1, nhid=4, c_hid=2,
                         c_final=2, cnum=2, max_node_num=N, d_min=D_MIN,
                         d_max=D_MAX, use_hodge_mask=True, use_bn=False,
                         is_cc=True))
    params = mf.init(jax.random.PRNGKey(0))
    adjs = np.zeros((B, N, N))
    for b in range(B):
        a = nx.to_numpy_array(nx.cycle_graph(4 + b % 2))
        adjs[b, : a.shape[0], : a.shape[0]] = a
    dyn = dynamic_cells_from_adjs(adjs, D_MIN, D_MAX)
    sde = VPSDE(N=10, beta_min=0.1, beta_max=1.0)
    F = incidence_from_dynamic(jnp.asarray(adjs), spec, dyn)
    flags = (jnp.asarray(adjs).sum(-1) > 0).astype(jnp.float32)
    loss_fn = get_rank2_dynamic_loss_fn(sde, mf, spec)
    loss, grads = jax.value_and_grad(loss_fn)(
        params, F, flags, dyn.member, dyn.valid, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    gnorm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)
    )
    assert gnorm > 0


@pytest.mark.slow
def test_two_stage_end_to_end_smoke():
    B, F_feat = 6, 5
    spec = get_spec(N, D_MIN, D_MAX)
    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F_feat,
                         depth=2, nhid=8, use_bn=False, is_cc=False))
    ma = load_model(dict(model_type="ScoreNetworkA", max_feat_num=F_feat,
                         max_node_num=N, nhid=8, num_layers=2, num_linears=1,
                         c_init=2, c_hid=4, c_final=2, adim=8, num_heads=2,
                         conv="GCN", use_bn=False, is_cc=False))
    mf = load_model(dict(model_type="ScoreNetworkF", num_layers_mlp=1,
                         num_layers=2, num_linears=1, nhid=4, c_hid=2,
                         c_final=2, cnum=2, max_node_num=N, d_min=D_MIN,
                         d_max=D_MAX, use_hodge_mask=True, use_bn=False,
                         is_cc=True))
    px = mx.init(jax.random.PRNGKey(0))
    pa = ma.init(jax.random.PRNGKey(1))
    # scale down the F init: an untrained ScoreNetworkF's H = FF^T powers
    # grow cubically in |F|, which blows up reverse dynamics at full random
    # init (same behavior as the joint CC sampler — see the S4 CC smoke
    # test); small weights keep the smoke run bounded
    pf = jax.tree_util.tree_map(
        lambda w: w * 0.01, mf.init(jax.random.PRNGKey(2))
    )
    steps = 8
    sde_x = VPSDE(N=steps, beta_min=0.1, beta_max=1.0)
    sde_adj = VPSDE(N=steps, beta_min=0.1, beta_max=1.0)
    sde_r2 = VPSDE(N=steps, beta_min=0.1, beta_max=1.0)
    graph_sampler = get_pc_sampler(
        sde_x, sde_adj, (B, N, F_feat), (B, N, N), predictor="Euler",
        corrector="Langevin", snr=0.1, scale_eps=1.0, n_steps=1,
        denoise=True, eps=1e-3,
    )
    rank2_sampler = get_rank2_sampler(
        sde_r2, spec, predictor="Euler", corrector="Langevin",
        snr=0.1, scale_eps=1.0, n_steps=1, denoise=True, eps=1e-3,
    )
    sfx = get_score_fn(sde_x, mx, px)
    sfa = get_score_fn(sde_adj, ma, pa)
    flags = jnp.ones((B, N))
    x, adj_q, rank2, dyn = two_stage_sample(
        graph_sampler, sfx, sfa, rank2_sampler, mf, pf, sde_r2, spec,
        flags, jax.random.PRNGKey(3), D_MIN, D_MAX,
    )
    assert x.shape == (B, N, F_feat)
    assert adj_q.shape == (B, N, N)
    assert rank2.shape == (B, spec.num_edges, dyn.k_max)
    assert bool(jnp.all(adj_q == jnp.swapaxes(adj_q, -1, -2)))
    assert bool(jnp.all(jnp.isfinite(rank2)))
    # nothing generated outside the per-sample candidate columns
    outside = rank2 * (1.0 - dyn.valid[:, None, :])
    assert float(jnp.abs(outside).max()) == 0.0


def test_rank2_sampler_reverse_predictor_runs():
    B = 3
    spec = get_spec(N, D_MIN, D_MAX)
    mf = load_model(dict(model_type="ScoreNetworkF", num_layers_mlp=1,
                         num_layers=2, num_linears=1, nhid=4, c_hid=2,
                         c_final=2, cnum=2, max_node_num=N, d_min=D_MIN,
                         d_max=D_MAX, use_hodge_mask=True, use_bn=False,
                         is_cc=True))
    pf = mf.init(jax.random.PRNGKey(0))
    sde = VPSDE(N=6, beta_min=0.1, beta_max=1.0)
    adjs = np.zeros((B, N, N))
    a = nx.to_numpy_array(nx.cycle_graph(5))
    for b in range(B):
        adjs[b, :5, :5] = a
    dyn = dynamic_cells_from_adjs(adjs, D_MIN, D_MAX)
    sampler = get_rank2_sampler(sde, spec, predictor="Reverse",
                                corrector="None")
    score_fn = get_score_fn_rank2_dynamic(sde, mf, pf, dyn)
    flags = (jnp.asarray(adjs).sum(-1) > 0).astype(jnp.float32)
    out = sampler(score_fn, dyn, flags, jax.random.PRNGKey(1),
                  (B, spec.num_edges, dyn.k_max))
    assert out.shape == (B, spec.num_edges, dyn.k_max)
    assert bool(jnp.all(jnp.isfinite(out)))
