"""Multi-host equivalence worker: run the FULL Trainer over a
multi-controller mesh and dump per-epoch losses.

Launched by tests/parallel/test_multihost.py as N processes (CPU backend,
4 virtual devices each) plus one single-process run (8 virtual devices);
the parent asserts the loss histories are identical.  Usage:

    python multihost_worker.py <process_id> <num_processes> <port> \
        <workdir> <outfile>

The caller must export JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=<n>, and clear
PALLAS_AXON_POOL_IPS (the axon sitecustomize otherwise initializes the
backend before jax.distributed can).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    workdir = sys.argv[4]
    outfile = sys.argv[5]

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
