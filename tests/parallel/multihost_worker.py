"""Multi-host equivalence worker: run the FULL Trainer (mode=train) or the
sharded production sampler (mode=sample) over a multi-controller mesh.

Launched by tests/parallel/test_multihost.py as N processes (CPU backend,
4 virtual devices each) plus one single-process run (8 virtual devices);
the parent asserts the loss histories / sampled tensors are identical.
Usage:

    python multihost_worker.py <process_id> <num_processes> <port> \
        <workdir> <outfile> [train|sample]

The caller must export JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=<n>, and clear
PALLAS_AXON_POOL_IPS (the axon sitecustomize otherwise initializes the
backend before jax.distributed can).
"""

from __future__ import annotations

import json
import os
import sys


def run_sampling(process_id: int, num_processes: int, outfile: str) -> None:
    """North-star leg: the SHARDED sampler at N hosts must equal 1 host.

    Every process builds the same tiny score models + global init flags,
    shards its local rows over DCN (shard_sampling_flags' multi-controller
    branch), runs the jitted sharded reverse diffusion, and dumps its
    addressable output rows keyed by global batch offset.  The parent
    reassembles and compares against the single-process run.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ccsd_tpu.diffusion.losses import get_score_fn
    from ccsd_tpu.diffusion.sde import VPSDE
    from ccsd_tpu.diffusion.solvers import get_pc_sampler
    from ccsd_tpu.models.registry import load_model
    from ccsd_tpu.parallel.multihost import global_mesh
    from ccsd_tpu.parallel.sampling import (
        jit_sharded_sampling,
        shard_sampling_flags,
    )

    B, N, F, STEPS = 16, 6, 4, 6
    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F,
                         depth=2, nhid=8, use_bn=False, is_cc=False))
    ma = load_model(dict(model_type="ScoreNetworkA", max_feat_num=F,
                         max_node_num=N, nhid=8, num_layers=2,
                         num_linears=1, c_init=2, c_hid=4, c_final=2,
                         adim=8, num_heads=2, conv="GCN", use_bn=False,
                         is_cc=False))
    px, pa = mx.init(jax.random.PRNGKey(0)), ma.init(jax.random.PRNGKey(1))
    sde = VPSDE(N=STEPS, beta_min=0.1, beta_max=1.0)
    sampler = get_pc_sampler(sde, sde, (B, N, F), (B, N, N),
                             predictor="Euler", corrector="Langevin",
                             snr=0.05, scale_eps=0.7, n_steps=1,
                             denoise=True, eps=1e-3)
    fns = [get_score_fn(sde, mx, px), get_score_fn(sde, ma, pa)]

    mesh = global_mesh(axis_names=("data",))
    jitted = jit_sharded_sampling(mesh, sampler, fns, is_cc=False)
    flags = jnp.ones((B, N))
    out = jitted(shard_sampling_flags(mesh, flags), jax.random.PRNGKey(3))

    rows = {}
    for name, arr in (("adj", out.adj), ("x", out.x)):
        for s in arr.addressable_shards:
            start = s.index[0].start or 0
            rows[f"{name}:{start}"] = np.asarray(s.data).tolist()
    with open(outfile, "w") as f:
        json.dump({"process_id": process_id, "rows": rows}, f)
    print(f"sample worker {process_id}/{num_processes}: OK", flush=True)


def main() -> None:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    workdir = sys.argv[4]
    outfile = sys.argv[5]
    mode = sys.argv[6] if len(sys.argv) > 6 else "train"

    import jax

    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=num_processes,
            process_id=process_id,
        )
    assert jax.device_count() == 8, jax.device_count()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))

    if mode == "sample":
        run_sampling(process_id, num_processes, outfile)
        return

    import numpy as np

    from ccsd_tpu.parallel.multihost import global_mesh
    from ccsd_tpu.training.trainer import Trainer
    from ccsd_tpu.utils.config import AttrDict

    config = AttrDict({
        "is_cc": False,
        "seed": 7,
        "folder": workdir,
        "data": {
            "data": "mh_synth", "dir": os.path.join(workdir, "data"),
            "batch_size": 16, "test_split": 0.2, "max_node_num": 8,
            "max_feat_num": 8, "init": "deg",
        },
        "sde": {
            "x": {"type": "VP", "beta_min": 0.1, "beta_max": 1.0,
                  "num_scales": 4},
            "adj": {"type": "VP", "beta_min": 0.1, "beta_max": 1.0,
                    "num_scales": 4},
        },
        "model": {
            "x": "ScoreNetworkX", "adj": "ScoreNetworkA", "conv": "GCN",
            "num_heads": 2, "depth": 2, "adim": 8, "nhid": 8,
            "num_layers": 2, "num_linears": 1, "c_init": 2, "c_hid": 4,
            "c_final": 2, "use_bn": False,
        },
        "train": {
            "name": "mh", "num_epochs": 2, "save_interval": 100,
            "print_interval": 100, "reduce_mean": False, "lr": 0.01,
            "lr_schedule": False, "ema": 0.999, "weight_decay": 0.0001,
            "grad_norm": 1.0, "lr_decay": 0.999, "eps": 1.0e-5,
        },
    })

    mesh = global_mesh(axis_names=("data",))
    trainer = Trainer(config, mesh=mesh, log=False)
    trainer.train()

    out = {
        "process_id": process_id,
        "num_processes": num_processes,
        "train": np.asarray(trainer.history["train"]).tolist(),
        "test": np.asarray(trainer.history["test"]).tolist(),
    }
    with open(outfile, "w") as f:
        json.dump(out, f)
    print(f"worker {process_id}/{num_processes}: OK", flush=True)


if __name__ == "__main__":
    main()
