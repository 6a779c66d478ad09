#!/usr/bin/env python
"""ZINC-shape two-stage proof: N=38, E=703, per-sample ring universes.

The charter's capstone config is zinc250k_CC (N=38, E=703, d_max=24,
BASELINE.json configs[4]); its raw data blobs are absent here AND in the
reference (.MISSING_LARGE_BLOBS), and its dense rank-2 column space is
astronomically large — the entire motivation for the two-stage open-universe
factorization (diffusion/two_stage.py).  This tool proves the pipeline AT
ZINC SHAPES on synthetic molecule-like graphs:

 1. generate M connected graphs with N in [28, 38], max degree 4, ring
    closures (random spanning tree + chord edges) and 9-way one-hot node
    types — ZINC's tensor shapes exactly;
 2. lift each to a CC via its cycle-basis rings (the mol loader's lifting,
    mol_loader.py:65-90 semantics);
 3. train the two-stage factorization p(X, A) * p(F | A)
    (TwoStageTrainer, full-batch) for --epochs;
 4. sample with TwoStageSampler (graph reverse diffusion at (B, 38, 38)
    + per-sample dynamic-universe rank-2 stage) and report quality stats
    + sampler throughput (steps/s, edges/s at E=703) as one JSON line.

Reference counterpart being replaced: config/zinc250k_CC.yaml +
data_loader_mol.py:425-546 (which cannot run without the blobs, and whose
dense-K path could not run at these shapes on any hardware).

Usage:
  python tools/zinc_shape_smoke.py --workdir /tmp/zincshape --epochs 100
  # CPU: prepend the virtual-mesh env; TPU: run as-is (one chip)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import networkx as nx
import numpy as np

N_MAX, FEAT = 38, 9
DATASET = "zinc_shape_synth_CC"


def gen_graph(rng: np.random.Generator) -> nx.Graph:
    """Connected molecule-like graph: spanning tree + ring-closing chords,
    degree capped at 4 (organic valence), N in [28, 38]."""
    n = int(rng.integers(28, N_MAX + 1))
    g = nx.Graph()
    g.add_nodes_from(range(n))
    order = rng.permutation(n)
    for i in range(1, n):
        # attach to a random earlier node with spare valence
        cands = [int(v) for v in order[:i] if g.degree[v] < 4]
        u = int(rng.choice(cands)) if cands else int(order[i - 1])
        g.add_edge(int(order[i]), u)
    # ring closures: chords between tree-distance 2..7 nodes
    n_chords = int(rng.integers(2, 6))
    for _ in range(n_chords * 4):
        if n_chords <= 0:
            break
        u, v = (int(x) for x in rng.integers(0, n, 2))
        if u == v or g.has_edge(u, v):
            continue
        if g.degree[u] >= 4 or g.degree[v] >= 4:
            continue
        try:
            d = nx.shortest_path_length(g, u, v)
        except nx.NetworkXNoPath:
            continue
        if 2 <= d <= 7:
            g.add_edge(u, v)
            n_chords -= 1
    return g


def gen_dataset(m: int, seed: int):
    """(x, adj, CC) triples at ZINC shapes; rings = cycle-basis cells."""
    from ccsd_tpu.data.complex import CombinatorialComplex

    rng = np.random.default_rng(seed)
    ccs = []
    ring_counts = []
    for _ in range(m):
        g = gen_graph(rng)
        cc = CombinatorialComplex()
        for v in g.nodes:
            cc.add_cell([int(v)], rank=0, symbol=int(rng.integers(0, FEAT)))
        for u, v in g.edges:
            cc.add_cell([int(u), int(v)], rank=1, bond_type=1)
        rings = [c for c in nx.cycle_basis(g) if 3 <= len(c) <= 24]
        ring_counts.append(len(rings))
        for c in rings:
            cc.add_cell([int(v) for v in c], rank=2)
        ccs.append(cc)
    return ccs, ring_counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/zincshape")
    ap.add_argument("--m", type=int, default=320)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=1000,
                    help="reverse-diffusion steps (sde num_scales)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")

    import yaml

    from ccsd_tpu.data.loader import save_dataset
    from ccsd_tpu.utils.config import AttrDict

    data_dir = os.path.join(args.workdir, "data")
    os.makedirs(data_dir, exist_ok=True)
    ccs, ring_counts = gen_dataset(args.m, args.seed)
    save_dataset(data_dir, ccs, DATASET, save_txt=False)
    print(f"dataset: {args.m} CCs, rings/graph mean "
          f"{np.mean(ring_counts):.1f} max {max(ring_counts)}", flush=True)

    raw = yaml.safe_load(open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "config", "zinc250k_CC.yaml")))
    cfg = AttrDict(raw)
    cfg.folder = args.workdir
    cfg.data.dir = data_dir  # generic (non-mol) loaders use dir as-is
    cfg.data.data = DATASET
    cfg.data.batch_size = args.batch_size
    cfg.data.test_split = 0.2
    cfg.data.init = "deg"          # synthetic: degree init, feat dim 9 kept
    cfg.data.lifting_procedure = "cycles"
    cfg.config_name = DATASET
    cfg.seed = args.seed
    # graph-mode adjacency model + slightly less tiny dims than the shipped
    # zinc config (nhid=2 there); still ZINC tensor shapes
    cfg.model.adj = "ScoreNetworkA"
    cfg.model.nhid = 8
    cfg.model.adim = 8
    cfg.model.num_heads = 4
    cfg.model.num_layers = 3
    cfg.model.c_hid = 4
    cfg.model.c_final = 4
    for k in ("x", "adj", "rank2"):
        cfg.sde[k].num_scales = args.steps
    cfg.train.two_stage = True
    cfg.train.num_epochs = args.epochs
    cfg.train.print_interval = max(1, args.epochs // 5)
    cfg.train.save_interval = args.epochs
    cfg.train.lr = 0.01
    cfg.train.name = "zinc_shape"
    cfg.sample.two_stage = True
    cfg.sample.seed = args.seed

    from ccsd_tpu.training.two_stage_trainer import TwoStageTrainer

    t0 = time.time()
    trainer = TwoStageTrainer(cfg, log=True)
    print(f"k_max (per-sample ring-universe slots): {trainer.k_max}",
          flush=True)
    ckpt_name = trainer.train()
    t_train = time.time() - t0

    scfg = AttrDict(json.loads(json.dumps(cfg)))  # deep copy
    scfg.ckpt = (ckpt_name or cfg.train.name) + "_final"
    from ccsd_tpu.sampling.two_stage_sampler import TwoStageSampler

    t0 = time.time()
    sampler = TwoStageSampler(scfg, log=True)
    out = sampler.sample()
    t_sample = time.time() - t0

    # throughput basis: graph-stage reverse diffusion dominates; report
    # model-sweep edges/s at ZINC shapes (E = 703 upper-tri entries)
    n_steps = args.steps
    steps_per_s = n_steps / t_sample
    edges_per_s = steps_per_s * args.batch_size * 703
    result = dict(
        shapes=dict(N=N_MAX, E=703, feat=FEAT, k_max=int(trainer.k_max)),
        train_s=round(t_train, 1), sample_s=round(t_sample, 1),
        steps_per_s=round(steps_per_s, 2),
        edges_per_s=round(edges_per_s, 1),
        quality={k: v for k, v in out.items()
                 if k in ("mmd", "cc_mmd", "n_samples")},
    )
    print("ZINC_SHAPE_RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
