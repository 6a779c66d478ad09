#!/usr/bin/env python
"""Frobenius norm of the model Jacobian (model-complexity probe).

Parity: /root/reference/scripts/run_frobenius_complexity.py:21-111, done the
JAX way: `jax.jacfwd` of the flattened forward instead of
torch.autograd.functional.jacobian.
Usage: python scripts/run_frobenius_complexity.py --config community_small
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ccsd_tpu.models.registry import load_model, load_model_params
    from ccsd_tpu.ops.cells import get_spec
    from ccsd_tpu.utils.config import get_config

    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--folder", type=str, default="./")
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args()

    config = get_config(args.config, 42, args.folder)
    is_cc = bool(config.get("is_cc", False))
    defs = load_model_params(config, is_cc=is_cc)
    names = ("x", "adj", "rank2") if is_cc else ("x", "adj")

    N = config.data.max_node_num
    F = config.data.max_feat_num
    B = args.batch
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, F))
    adj = jnp.abs(jax.random.normal(key, (B, N, N)))
    adj = jnp.triu(adj, 1)
    adj = adj + jnp.swapaxes(adj, -1, -2)
    inputs = {"x": x, "adj": adj}
    if is_cc:
        spec = get_spec(N, config.data.d_min, config.data.d_max)
        inputs["rank2"] = jax.random.normal(
            key, (B, spec.num_edges, spec.num_cells)
        )

    for name, d in zip(names, defs):
        model = load_model(d)
        params = model.init(jax.random.PRNGKey(1))
        wrt = inputs[name if name != "rank2" else "rank2"]

        def fwd(v):
            kw = dict(inputs)
            kw[name] = v
            if is_cc:
                out = model.apply(params, kw["x"], kw["adj"], kw["rank2"])
            else:
                out = model.apply(params, kw["x"], kw["adj"])
            return out.reshape(-1)

        jac = jax.jacfwd(fwd)(wrt)
        frob = float(jnp.linalg.norm(jac.reshape(jac.shape[0], -1)))
        print(f"Complexity {name}: {frob:.6g}")


if __name__ == "__main__":
    main()
