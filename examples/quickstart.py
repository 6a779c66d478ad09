#!/usr/bin/env python
"""Minimal library-API walkthrough: build, train a few steps, sample, eval.

Run from the repo root:  python examples/quickstart.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from ccsd_tpu.diffusion.losses import get_score_fn, get_sde_loss_fn
from ccsd_tpu.diffusion.sde import VPSDE
from ccsd_tpu.diffusion.solvers import get_pc_sampler
from ccsd_tpu.models.registry import load_model

B, N, F = 16, 12, 6

# 1. models
mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F, depth=2,
                     nhid=16, use_bn=False, is_cc=False))
ma = load_model(dict(model_type="ScoreNetworkA", max_feat_num=F,
                     max_node_num=N, nhid=16, num_layers=3, num_linears=2,
                     c_init=2, c_hid=8, c_final=4, adim=16, num_heads=4,
                     conv="GCN", use_bn=False, is_cc=False))
px, pa = mx.init(jax.random.PRNGKey(0)), ma.init(jax.random.PRNGKey(1))

# 2. toy data: random graphs
key = jax.random.PRNGKey(2)
adj = (jax.random.uniform(key, (B, N, N)) > 0.7).astype(jnp.float32)
adj = jnp.triu(adj, 1); adj = adj + jnp.swapaxes(adj, -1, -2)
x = jax.nn.one_hot(jnp.clip(adj.sum(-1), 0, F - 1).astype(jnp.int32), F)

# 3. a few DSM training steps
sde = VPSDE(N=100, beta_min=0.1, beta_max=1.0)
loss_fn = get_sde_loss_fn(sde, sde, mx, ma)

import optax
from ccsd_tpu.training.optim import make_optimizer

opt = make_optimizer(lr=0.01, weight_decay=1e-4, grad_norm=1.0)
sx, sa = opt.init(px), opt.init(pa)

@jax.jit
def step(px, pa, sx, sa, k):
    def total(px_, pa_):
        lx, la = loss_fn(px_, pa_, x, adj, k)
        return lx + la, (lx, la)
    (_, (lx, la)), g = jax.value_and_grad(total, argnums=(0, 1), has_aux=True)(px, pa)
    ux, sx = opt.update(g[0], sx, px)
    ua, sa = opt.update(g[1], sa, pa)
    return optax.apply_updates(px, ux), optax.apply_updates(pa, ua), sx, sa, lx, la

for i in range(20):
    key, sub = jax.random.split(key)
    px, pa, sx, sa, lx, la = step(px, pa, sx, sa, sub)
print(f"final losses: x={float(lx):.2f} adj={float(la):.2f}")

# 4. sample
samp = get_pc_sampler(sde, sde, (B, N, F), (B, N, N),
                      predictor="Euler", corrector="Langevin",
                      snr=0.05, scale_eps=0.7)
out = jax.jit(lambda fl, k: samp(get_score_fn(sde, mx, px),
                                 get_score_fn(sde, ma, pa), fl, k))(
    jnp.ones((B, N)), jax.random.PRNGKey(3))
A = np.asarray(out.adj > 0.5).astype(int)
print(f"sampled {B} graphs; mean edges = {A.sum() / (2 * B):.1f}")
