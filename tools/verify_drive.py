#!/usr/bin/env python
"""The /verify drive recipe as a script: end-to-end mini-experiment through
the public library surface (train ~30 steps on community_small, PC-sample,
check symmetry/masking/edge statistics).  ~60 s on CPU.

Usage: python tools/verify_drive.py  (forces CPU in-process; safe anywhere)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import pickle

import networkx as nx
import numpy as np
import jax.numpy as jnp
import optax


def main():
    with open("/root/reference/data/community_small.pkl", "rb") as f:
        graphs = pickle.load(f)
    B, N = 64, 20
    adjs = np.zeros((len(graphs), N, N), np.float32)
    for i, g in enumerate(graphs):
        a = nx.to_numpy_array(g)
        adjs[i, : a.shape[0], : a.shape[1]] = a

    from ccsd_tpu.diffusion.losses import get_score_fn, get_sde_loss_fn
    from ccsd_tpu.diffusion.sde import VPSDE
    from ccsd_tpu.diffusion.solvers import get_pc_sampler
    from ccsd_tpu.models.registry import load_model
    from ccsd_tpu.ops.masks import node_flags, quantize
    from ccsd_tpu.training.optim import make_optimizer

    adj = jnp.asarray(adjs[:B])
    flags = node_flags(adj)
    deg = jnp.clip(jnp.sum(adj, -1), 0, 9).astype(jnp.int32)
    x = jax.nn.one_hot(deg, 10) * flags[..., None]

    mx = load_model({"model_type": "ScoreNetworkX", "max_feat_num": 10,
                     "depth": 2, "nhid": 16})
    ma = load_model({"model_type": "ScoreNetworkA", "max_feat_num": 10,
                     "max_node_num": N, "nhid": 16, "num_layers": 3,
                     "num_linears": 2, "c_init": 2, "c_hid": 8, "c_final": 4,
                     "adim": 16, "num_heads": 4, "conv": "GCN"})
    key = jax.random.PRNGKey(0)
    params = {"x": mx.init(key), "adj": ma.init(key)}
    sde_x = VPSDE(beta_min=0.1, beta_max=1.0, N=1000)
    sde_a = VPSDE(beta_min=0.1, beta_max=1.0, N=1000)
    loss_fn = get_sde_loss_fn(sde_x, sde_a, mx, ma, reduce_mean=True)
    opt = make_optimizer(lr=0.01, weight_decay=1e-4, grad_norm=1.0)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        def total(p):
            lx, la = loss_fn(p["x"], p["adj"], x, adj, k)
            return lx + la, (lx, la)

        (_, (lx, la)), g = jax.value_and_grad(total, has_aux=True)(params)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, lx, la

    first = last = None
    for i in range(30):
        key, k = jax.random.split(key)
        params, opt_state, lx, la = step(params, opt_state, k)
        if i == 0:
            first = float(lx) + float(la)
        last = float(lx) + float(la)
    assert last < first, f"loss did not fall: {first} -> {last}"
    print(f"train: loss {first:.2f} -> {last:.2f}")

    sampler = get_pc_sampler(
        sde_x, sde_a, (B, N, 10), (B, N, N), predictor="Euler",
        corrector="Langevin", snr=0.1, scale_eps=1.0, n_steps=1,
        denoise=True, eps=1e-3)
    sfx = get_score_fn(sde_x, mx, params["x"])
    sfa = get_score_fn(sde_a, ma, params["adj"])
    out = jax.jit(lambda fl, k: sampler(sfx, sfa, fl, k))(
        flags, jax.random.PRNGKey(7))
    aq = np.asarray(quantize(out.adj))
    assert np.allclose(aq, aq.transpose(0, 2, 1)), "not symmetric"
    mask = np.asarray(flags)
    assert (aq * (1 - mask)[:, None, :]).sum() == 0, "masked nodes have edges"
    ecount = aq.sum((1, 2)) / 2
    assert 1.0 < ecount.mean() < 200.0, f"degenerate edge count {ecount.mean()}"
    print(f"sample: edges/graph mean {ecount.mean():.1f} "
          f"(train {adjs[:B].sum((1, 2)).mean() / 2:.1f})")
    print("VERIFY OK")


if __name__ == "__main__":
    main()
