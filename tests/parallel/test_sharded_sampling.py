"""Sharded PRODUCTION sampling path (parallel/sampling.py, VERDICT r2 #2).

The scanned PC sampler jitted over a mesh must equal the single-device
sampler bit-for-bit in expectation (same key stream, GSPMD only changes
placement), including the Langevin corrector's batch-coupled norms which
lower to psums over 'data'.  Runs on the virtual 8-device CPU mesh.

Counterpart being replaced: ccsd/src/sampler.py:92-366 (strictly
single-device; `divide_batch` is its only batching mechanism).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccsd_tpu.diffusion.losses import get_score_fn, get_score_fn_cc
from ccsd_tpu.diffusion.sde import VPSDE
from ccsd_tpu.diffusion.solvers import get_pc_sampler
from ccsd_tpu.models.registry import load_model
from ccsd_tpu.ops.cells import get_spec
from ccsd_tpu.parallel.mesh import make_mesh
from ccsd_tpu.parallel.sampling import (
    jit_sharded_sampling,
    mesh_from_config,
    shard_sampling_flags,
)
from ccsd_tpu.utils.config import AttrDict

B, N, F = 8, 6, 4
STEPS = 6


def _graph_setup():
    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F, depth=2,
                         nhid=8, use_bn=False, is_cc=False))
    ma = load_model(dict(model_type="ScoreNetworkA", max_feat_num=F,
                         max_node_num=N, nhid=8, num_layers=2, num_linears=1,
                         c_init=2, c_hid=4, c_final=2, adim=8, num_heads=2,
                         conv="GCN", use_bn=False, is_cc=False))
    px, pa = mx.init(jax.random.PRNGKey(0)), ma.init(jax.random.PRNGKey(1))
    sde = VPSDE(N=STEPS, beta_min=0.1, beta_max=1.0)
    sampler = get_pc_sampler(sde, sde, (B, N, F), (B, N, N),
                             predictor="Euler", corrector="Langevin",
                             snr=0.05, scale_eps=0.7, n_steps=1,
                             denoise=True, eps=1e-3)
    fns = [get_score_fn(sde, mx, px), get_score_fn(sde, ma, pa)]
    return sampler, fns


def test_sharded_graph_sampling_matches_single_device():
    sampler, fns = _graph_setup()
    flags = jnp.ones((B, N))
    key = jax.random.PRNGKey(3)
    ref = jax.jit(lambda fl, k: sampler(*fns, fl, k))(flags, key)

    mesh = make_mesh(4, ("data",))
    jitted = jit_sharded_sampling(mesh, sampler, fns, is_cc=False)
    out = jitted(shard_sampling_flags(mesh, flags), key)
    np.testing.assert_allclose(np.asarray(out.adj), np.asarray(ref.adj),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_sharded_cc_sampling_data_by_edge_mesh():
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
            num_linears=1, nhid=4, c_hid=2, c_final=2, cnum=2, max_node_num=N,
            d_min=3, d_max=3, use_hodge_mask=True, use_bn=False, is_cc=True)),
    }
    key = jax.random.PRNGKey(0)
    params = {n: m.init(jax.random.fold_in(key, i))
              for i, (n, m) in enumerate(models.items())}
    sde = VPSDE(N=STEPS, beta_min=0.1, beta_max=1.0)
    sampler = get_pc_sampler(
        sde, sde, (B, N, F), (B, N, N), predictor="Euler",
        corrector="Langevin", snr=0.05, scale_eps=0.7, n_steps=1,
        denoise=True, eps=1e-3, is_cc=True, sde_rank2=sde,
        shape_rank2=(B, spec.num_edges, spec.num_cells), spec=spec,
    )
    fns = [get_score_fn_cc(sde, models[n], params[n])
           for n in ("x", "adj", "rank2")]
    flags = jnp.ones((B, N))
    k = jax.random.PRNGKey(5)
    ref = jax.jit(lambda fl, kk: sampler(*fns, fl, kk))(flags, k)

    mesh = make_mesh(8, ("data", "edge"), shape=(4, 2))
    jitted = jit_sharded_sampling(mesh, sampler, fns, is_cc=True)
    out = jitted(shard_sampling_flags(mesh, flags), k)
    np.testing.assert_allclose(np.asarray(out.rank2), np.asarray(ref.rank2),
                               rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.adj), np.asarray(ref.adj),
                               rtol=2e-4, atol=1e-3)
    # the rank-2 output really is laid out over the edge axis
    shard_shapes = {s.data.shape for s in out.rank2.addressable_shards}
    assert all(sh[1] < spec.num_edges or sh[0] < B for sh in shard_shapes)


@pytest.mark.slow
def test_sharded_cc_sampling_real_ego_shapes():
    """Edge-sharded CC sampling at ego_small_CC's REAL dense shapes
    (N=18, E=153, K=12,444 — the config the reference cannot run at all)
    on a (data=2, edge=3) mesh: executes end-to-end and the scanned
    carry's rank-2 output is laid out at exactly B*E*K/p per device
    (VERDICT r3 missing #6).  edge=3 because jax only materializes an
    edge-sharded OUTPUT array when E is divisible by the axis size
    (153 = 3*51; with edge=4 the constraint silently falls back to
    edge-replicated output).  Reference counterpart being replaced:
    sampler.py:369-681 + divide_batch."""
    N_REAL, F_REAL, B_REAL, STEPS_REAL = 18, 17, 8, 3
    spec = get_spec(N_REAL, 3, 5)
    assert spec.num_cells == 12444 and spec.num_edges == 153
    models = {
        "x": load_model(dict(model_type="ScoreNetworkX", max_feat_num=F_REAL,
                             depth=2, nhid=8, use_bn=False, is_cc=True)),
        "adj": load_model(dict(
            model_type="ScoreNetworkA_CC", max_feat_num=F_REAL,
            max_node_num=N_REAL, d_min=3, d_max=5, nhid=8, nhid_h=4,
            num_layers=2, num_layers_h=1, num_linears=1, num_linears_h=1,
            c_init=2, c_hid=4, c_hid_h=2, c_final=2, c_final_h=2, adim=8,
            adim_h=4, num_heads=2, num_heads_h=2, conv="GCN",
            conv_hodge="HCN", use_bn=False, is_cc=True)),
        "rank2": load_model(dict(
            model_type="ScoreNetworkF", num_layers_mlp=1, num_layers=2,
            num_linears=1, nhid=4, c_hid=2, c_final=2, cnum=2,
            max_node_num=N_REAL, d_min=3, d_max=5, use_hodge_mask=True,
            use_bn=False, is_cc=True)),
    }
    key = jax.random.PRNGKey(0)
    params = {n: m.init(jax.random.fold_in(key, i))
              for i, (n, m) in enumerate(models.items())}
    # untrained ScoreNetworkF at K=12,444 emits O(1e4) scores (its Hodge
    # power features scale with K), which diverges the reverse SDE within a
    # few steps — a fixture artifact, not a production state (trained
    # scores are ~ -z/std).  Scale the rank-2 params so the integration
    # stays bounded while the full compute path + layout still execute.
    params["rank2"] = jax.tree.map(lambda a: a * 1e-2, params["rank2"])
    sde = VPSDE(N=STEPS_REAL, beta_min=0.1, beta_max=1.0)
    sampler = get_pc_sampler(
        sde, sde, (B_REAL, N_REAL, F_REAL), (B_REAL, N_REAL, N_REAL),
        predictor="Euler", corrector="Langevin", snr=0.05, scale_eps=0.7,
        n_steps=1, denoise=True, eps=1e-3, is_cc=True, sde_rank2=sde,
        shape_rank2=(B_REAL, spec.num_edges, spec.num_cells), spec=spec,
    )
    fns = [get_score_fn_cc(sde, models[n], params[n])
           for n in ("x", "adj", "rank2")]
    mesh = make_mesh(6, ("data", "edge"), shape=(2, 3))
    jitted = jit_sharded_sampling(mesh, sampler, fns, is_cc=True)
    flags = jnp.ones((B_REAL, N_REAL))
    out = jitted(shard_sampling_flags(mesh, flags), jax.random.PRNGKey(5))
    r2 = np.asarray(out.rank2)
    assert r2.shape == (B_REAL, 153, 12444) and np.isfinite(r2).all()
    # every device holds exactly B*E*K/6 = (4, 51, 12444)
    shard_shapes = {s.data.shape for s in out.rank2.addressable_shards}
    assert shard_shapes == {(B_REAL // 2, 51, 12444)}, shard_shapes


def test_mesh_from_config():
    assert mesh_from_config(AttrDict({"sample": {}}).sample) is None
    m = mesh_from_config(AttrDict({"mesh": {"data": 4, "edge": 2}}))
    assert dict(m.shape) == {"data": 4, "edge": 2}
    m2 = mesh_from_config(AttrDict({"mesh": "auto"}))
    assert m2 is not None and m2.size == 8
    with pytest.raises(ValueError):
        mesh_from_config(AttrDict({"mesh": {"data": 64}}))
