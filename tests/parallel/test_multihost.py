"""Multi-host (multi-controller) equivalence: 2 processes x 4 CPU devices
runs the FULL Trainer to the same losses as 1 process x 8 CPU devices.

This is the test the reference could never have (its only multi-device
mechanism is single-process DataParallel, loader.py:124-141): the global
batch is assembled from per-host shards with
jax.make_array_from_process_local_data, gradients psum over the process
boundary (Gloo on CPU standing in for DCN), and the resulting training
trajectory must be identical to the single-process run.
"""

from __future__ import annotations

import json
import os
import pickle
import socket
import subprocess
import sys

import networkx as nx
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _make_dataset(workdir: str) -> None:
    """80 deterministic small graphs (max 8 nodes, max degree < 8)."""
    rng = np.random.default_rng(0)
    graphs = []
    for _ in range(80):
        n = int(rng.integers(5, 9))
        g = nx.gnp_random_graph(n, 0.45, seed=int(rng.integers(1 << 30)))
        while g.number_of_edges() == 0:
            g = nx.gnp_random_graph(n, 0.45, seed=int(rng.integers(1 << 30)))
        graphs.append(g)
    os.makedirs(os.path.join(workdir, "data"), exist_ok=True)
    with open(os.path.join(workdir, "data", "mh_synth.pkl"), "wb") as f:
        pickle.dump(graphs, f)


def _env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    # the axon sitecustomize initializes the backend at interpreter start
    # when this is set, which would pre-empt jax.distributed.initialize
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def _run_single(workdir: str, mode: str = "train") -> dict:
    out = os.path.join(workdir, f"single_{mode}.json")
    subprocess.run(
        [sys.executable, WORKER, "0", "1", "0", workdir, out, mode],
        env=_env(8), check=True, timeout=420, capture_output=True,
    )
    with open(out) as f:
        return json.load(f)


def _run_multi(workdir: str, nproc: int = 2, mode: str = "train") -> list:
    port = _free_port()
    procs, outs = [], []
    for pid in range(nproc):
        out = os.path.join(workdir, f"multi_{mode}_{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port),
             workdir, out, mode],
            env=_env(8 // nproc), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        ))
    results = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=420)
        if p.returncode != 0:
            raise RuntimeError(
                f"worker failed (rc={p.returncode}):\n"
                f"{stderr.decode()[-2000:]}"
            )
    for out in outs:
        with open(out) as f:
            results.append(json.load(f))
    return results


@pytest.mark.slow
@pytest.mark.slow
def test_two_process_trainer_matches_single_process(tmp_path):
    workdir = str(tmp_path)
    _make_dataset(workdir)
    single = _run_single(workdir)
    multi = _run_multi(workdir, nproc=2)

    # both multi-host processes observe the same (replicated) losses
    np.testing.assert_allclose(multi[0]["train"], multi[1]["train"],
                               rtol=1e-6, atol=1e-7)

    # and the 2-process trajectory equals the single-process one
    np.testing.assert_allclose(single["train"], multi[0]["train"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(single["test"], multi[0]["test"],
                               rtol=1e-5, atol=1e-6)

    assert np.isfinite(np.asarray(single["train"])).all()

@pytest.mark.slow
def test_two_process_sampler_matches_single_process(tmp_path):
    """The north-star's N-hosts leg: the sharded production sampler run as
    2 processes x 4 devices produces bit-close identical samples to the
    1-process x 8-device run (same key stream; only placement differs).
    The Langevin corrector's batch-coupled norms psum across the process
    boundary, so this exercises real cross-host collectives in the
    reverse diffusion."""
    workdir = str(tmp_path)
    single = _run_single(workdir, mode="sample")
    multi = _run_multi(workdir, nproc=2, mode="sample")

    def reassemble(results):
        rows = {}
        for r in results:
            rows.update(r["rows"])
        tensors = {}
        for name in ("adj", "x"):
            keys = sorted(
                (k for k in rows if k.startswith(name + ":")),
                key=lambda k: int(k.split(":")[1]),
            )
            tensors[name] = np.concatenate(
                [np.asarray(rows[k]) for k in keys], axis=0
            )
        return tensors

    s, m = reassemble([single]), reassemble(multi)
    # the two processes' shards are disjoint and cover the global batch
    assert s["adj"].shape == m["adj"].shape == (16, 6, 6)
    # cross-process psum reduction order shifts the float stream by ~1e-4
    # relative (same tolerance class as the single-process sharded test)
    np.testing.assert_allclose(m["adj"], s["adj"], rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(m["x"], s["x"], rtol=2e-4, atol=1e-4)
    assert np.isfinite(m["adj"]).all()
