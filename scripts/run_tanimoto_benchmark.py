#!/usr/bin/env python
"""Tanimoto-similarity histogram benchmark over multiple sample files.

Parity: /root/reference/scripts/run_tanimoto_benchmark.py.  Requires RDKit.
Usage: python scripts/run_tanimoto_benchmark.py --dataset QM9 \
           --files a.txt b.txt [--bins 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    from rdkit import Chem, DataStructs
    from rdkit.Chem import AllChem

    from ccsd_tpu.data.mol_utils import load_smiles

    p = argparse.ArgumentParser()
    p.add_argument("--files", nargs="+", required=True,
                   help="SMILES files (one molecule per line)")
    p.add_argument("--dataset", type=str, default="QM9",
                   choices=["QM9", "ZINC250k"])
    p.add_argument("--folder", type=str, default="./")
    p.add_argument("--bins", type=int, default=20)
    args = p.parse_args()

    train_smiles, _ = load_smiles(args.dataset, folder=args.folder)

    def fp(smi):
        mol = Chem.MolFromSmiles(smi)
        return None if mol is None else AllChem.GetMorganFingerprintAsBitVect(
            mol, 2, nBits=2048
        )

    train_fps = [f for f in map(fp, train_smiles) if f is not None]
    for path in args.files:
        with open(path) as f:
            gen = [s.strip() for s in f if s.strip()]
        sims = []
        for smi in gen:
            f_ = fp(smi)
            if f_ is None:
                continue
            sims.append(max(DataStructs.TanimotoSimilarity(f_, t)
                            for t in train_fps))
        hist, edges = np.histogram(sims, bins=args.bins, range=(0, 1))
        print(f"== {path}: n={len(sims)} mean={np.mean(sims):.4f} "
              f"median={np.median(sims):.4f}")
        for h, lo, hi in zip(hist, edges[:-1], edges[1:]):
            print(f"  [{lo:.2f},{hi:.2f}) {h}")


if __name__ == "__main__":
    main()
