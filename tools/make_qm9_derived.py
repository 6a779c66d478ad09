#!/usr/bin/env python
"""Build a QM9-format kekulized npz from the shipped qm9_test_nx.pkl.

The reference repo ships valid_idx_qm9.json + qm9_test_nx.pkl but the raw
qm9.csv / qm9_kekulized.npz blobs are .MISSING_LARGE_BLOBS — so the 13,082
test molecules (atom symbols + kekulized bond orders as nx graphs) are the
only molecule-level QM9 data available.  This tool re-encodes them in the
exact kekulized-npz format the loaders expect (reference
data/preprocess.py:25-86 output; load_mol data_loader_mol.py:31-69):

  arr_0: (M, 9)      atomic numbers, 0-padded (virtual atoms)
  arr_1: (M, 4, 9, 9) bond-order channels [single, double, triple, aromatic];
                      aromatic is all-zero (kekulized)

plus a valid_idx json marking the last 10% as the held-out split, so the
whole downstream pipeline (load_mol -> split -> transform -> init_flags ->
sample -> metrics) runs byte-for-byte the reference path.  Metrics computed
against this derived set are labeled as such in BASELINE.md.

Usage:  python tools/make_qm9_derived.py --out <dir>
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccsd_tpu.chem.mol import SYMBOL_TO_AN  # noqa: E402

N_MAX = 9


def graphs_to_kekulized(graphs):
    M = len(graphs)
    x = np.zeros((M, N_MAX), np.int8)
    adj = np.zeros((M, 4, N_MAX, N_MAX), np.int8)
    kept = 0
    for g in graphs:
        nodes = sorted(g.nodes())
        if len(nodes) > N_MAX:
            continue
        remap = {n: i for i, n in enumerate(nodes)}
        for n in nodes:
            x[kept, remap[n]] = SYMBOL_TO_AN[str(g.nodes[n]["label"])]
        ok = True
        for u, v, d in g.edges(data=True):
            o = int(d.get("label", 1))
            if not 1 <= o <= 3:
                ok = False  # non-kekulized label; skip molecule
                break
            adj[kept, o - 1, remap[u], remap[v]] = 1
            adj[kept, o - 1, remap[v], remap[u]] = 1
        if ok:
            kept += 1
        else:
            x[kept] = 0
            adj[kept] = 0
    return x[:kept], adj[:kept]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--test-nx", default="/root/reference/data/qm9_test_nx.pkl")
    p.add_argument("--out", required=True, help="output data dir")
    p.add_argument("--test-frac", type=float, default=0.1)
    args = p.parse_args()

    with open(args.test_nx, "rb") as f:
        graphs = pickle.load(f)
    x, adj = graphs_to_kekulized(graphs)
    os.makedirs(args.out, exist_ok=True)
    np.savez_compressed(
        os.path.join(args.out, "qm9_kekulized.npz"), arr_0=x, arr_1=adj
    )
    n = x.shape[0]
    n_test = int(args.test_frac * n)
    valid = {"valid_idxs": [str(i) for i in range(n - n_test, n)]}
    with open(os.path.join(args.out, "valid_idx_qm9.json"), "w") as f:
        json.dump(valid, f)
    print(f"wrote {n} molecules ({n - n_test} train / {n_test} test) "
          f"to {args.out}")


if __name__ == "__main__":
    main()
