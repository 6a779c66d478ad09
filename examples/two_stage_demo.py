#!/usr/bin/env python
"""Two-stage open-universe CC generation demo (CPU-runnable, ~1 min).

Trains a tiny (X, A) pair on synthetic community graphs, trains an F-model
over per-sample candidate universes (cells = cycles of each TRAINING
graph's own adjacency), then generates: stage 1 samples (X, A); the bridge
enumerates candidate cells from each GENERATED adjacency; stage 2 diffuses
F over exactly those columns.  This is the ZINC-scale path — K is bounded
by the candidate count, not sum_k C(N, k).

Run: python examples/two_stage_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import networkx as nx
import numpy as np
import jax.numpy as jnp
import optax

from ccsd_tpu.diffusion.losses import (
    get_rank2_dynamic_loss_fn,
    get_score_fn,
    get_sde_loss_fn,
)
from ccsd_tpu.diffusion.sde import VPSDE
from ccsd_tpu.diffusion.solvers import get_pc_sampler
from ccsd_tpu.diffusion.two_stage import (
    dynamic_cells_from_adjs,
    get_rank2_sampler,
    incidence_from_dynamic,
    two_stage_sample,
)
from ccsd_tpu.models.registry import load_model
from ccsd_tpu.ops.cells import get_spec
from ccsd_tpu.ops.masks import node_flags
from ccsd_tpu.training.optim import make_optimizer

N, F_FEAT, D_MIN, D_MAX, B = 12, 6, 3, 4, 32
STEPS = 200
spec = get_spec(N, D_MIN, D_MAX)

# ---- data: two-community graphs, candidate cells = their cycles ----------
rng = np.random.default_rng(0)
adjs = np.zeros((B, N, N), np.float32)
for b in range(B):
    g = nx.random_partition_graph([N // 2, N // 2], 0.8, 0.1, seed=int(b))
    adjs[b] = nx.to_numpy_array(g)
adj = jnp.asarray(adjs)
flags = node_flags(adj)
x = jax.nn.one_hot(jnp.clip(adj.sum(-1).astype(jnp.int32), 0, F_FEAT - 1),
                   F_FEAT)
dyn_train = dynamic_cells_from_adjs(adjs, D_MIN, D_MAX)
rank2_train = incidence_from_dynamic(adj, spec, dyn_train)
print(f"train universes: K_max={dyn_train.k_max}, "
      f"mean candidates={float(dyn_train.valid.sum(-1).mean()):.1f} "
      f"(dense K would be {spec.num_cells})")

# ---- models ---------------------------------------------------------------
mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F_FEAT,
                     depth=2, nhid=16, use_bn=False, is_cc=False))
ma = load_model(dict(model_type="ScoreNetworkA", max_feat_num=F_FEAT,
                     max_node_num=N, nhid=16, num_layers=3, num_linears=2,
                     c_init=2, c_hid=6, c_final=3, adim=16, num_heads=4,
                     conv="GCN", use_bn=False, is_cc=False, fused=True))
mf = load_model(dict(model_type="ScoreNetworkF", num_layers_mlp=2,
                     num_layers=2, num_linears=2, nhid=8, c_hid=4,
                     c_final=4, cnum=2, max_node_num=N, d_min=D_MIN,
                     d_max=D_MAX, use_hodge_mask=True, use_bn=False,
                     is_cc=True, fused=True))
px, pa, pf = (m.init(jax.random.PRNGKey(i)) for i, m in
              enumerate((mx, ma, mf)))

sde = lambda: VPSDE(N=STEPS, beta_min=0.1, beta_max=1.0)
sde_x, sde_adj, sde_r2 = sde(), sde(), sde()

# ---- stage-1 training (joint X, A DSM) ------------------------------------
loss_ga = get_sde_loss_fn(sde_x, sde_adj, mx, ma)
loss_f = get_rank2_dynamic_loss_fn(sde_r2, mf, spec)
opt = make_optimizer(lr=5e-3, weight_decay=1e-4, grad_norm=1.0)
opt_f = make_optimizer(lr=5e-3, weight_decay=1e-4, grad_norm=1.0)
ostate = opt.init((px, pa))
ostate_f = opt_f.init(pf)


@jax.jit
def train_step(params, ostate, key):
    def tot(params):
        lx, la = loss_ga(params[0], params[1], x, adj, key)
        return lx.mean() + la.mean(), (lx.mean(), la.mean())

    (_, ls), g = jax.value_and_grad(tot, has_aux=True)(params)
    u, ostate = opt.update(g, ostate, params)
    return optax.apply_updates(params, u), ostate, ls


@jax.jit
def train_step_f(pf, ostate, key):
    lf, g = jax.value_and_grad(loss_f)(
        pf, rank2_train, flags, dyn_train.member, dyn_train.valid, key
    )
    u, ostate = opt_f.update(g, ostate, pf)
    return optax.apply_updates(pf, u), ostate, lf


key = jax.random.PRNGKey(42)
params = (px, pa)
for i in range(800):
    key, k1, k2 = jax.random.split(key, 3)
    params, ostate, ls = train_step(params, ostate, k1)
    pf, ostate_f, lf = train_step_f(pf, ostate_f, k2)
    if i % 200 == 0 or i == 799:
        print(f"step {i:3d}: loss_x={float(ls[0]):7.2f} "
              f"loss_adj={float(ls[1]):7.2f} loss_F={float(lf):9.1f}")
px, pa = params

# ---- two-stage generation -------------------------------------------------
graph_sampler = get_pc_sampler(
    sde_x, sde_adj, (B, N, F_FEAT), (B, N, N), predictor="Euler",
    corrector="Langevin", snr=0.1, scale_eps=0.7, n_steps=1, denoise=True,
    eps=1e-3,
)
rank2_sampler = get_rank2_sampler(
    sde_r2, spec, predictor="Euler", corrector="Langevin", snr=0.1,
    scale_eps=0.7, denoise=True, eps=1e-3,
)
xs, adj_q, rank2, dyn = two_stage_sample(
    graph_sampler, get_score_fn(sde_x, mx, px), get_score_fn(sde_adj, ma, pa),
    rank2_sampler, mf, pf, sde_r2, spec, flags, jax.random.PRNGKey(7),
    D_MIN, D_MAX,
)
edges = float(adj_q.sum() / 2 / B)
r2 = np.asarray(rank2)
cells = float((r2 > 0.5).any(axis=1).sum(axis=-1).mean())
print(f"rank2 stats: max={r2.max():.2f}, p99={np.quantile(r2, 0.99):.2f}")
print(f"\ngenerated: {edges:.1f} edges/graph "
      f"(train {float(adj.sum() / 2 / B):.1f}), "
      f"universe K_max={dyn.k_max}, {cells:.1f} active cells/sample")
print("two-stage open-universe generation: OK")
