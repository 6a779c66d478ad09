#!/usr/bin/env python
"""Dump (generated SMILES, max train Tanimoto) pairs for later analysis.

Parity: /root/reference/scripts/create_tanimoto_smiles.py.  Requires RDKit.
Usage: python scripts/create_tanimoto_smiles.py --smiles samples/QM9/smiles.txt \
           --dataset QM9 --out tanimoto_smiles.csv
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from rdkit import Chem, DataStructs
    from rdkit.Chem import AllChem

    from ccsd_tpu.data.mol_utils import load_smiles

    p = argparse.ArgumentParser()
    p.add_argument("--smiles", type=str, required=True)
    p.add_argument("--dataset", type=str, default="QM9",
                   choices=["QM9", "ZINC250k"])
    p.add_argument("--folder", type=str, default="./")
    p.add_argument("--out", type=str, default="tanimoto_smiles.csv")
    args = p.parse_args()

    with open(args.smiles) as f:
        gen = [s.strip() for s in f if s.strip()]
    train_smiles, _ = load_smiles(args.dataset, folder=args.folder)

    def fp(smi):
        mol = Chem.MolFromSmiles(smi)
        return None if mol is None else AllChem.GetMorganFingerprintAsBitVect(
            mol, 2, nBits=2048
        )

    train = [(s, fp(s)) for s in train_smiles]
    train = [(s, f) for s, f in train if f is not None]
    rows = []
    for smi in gen:
        f = fp(smi)
        if f is None:
            continue
        best_s, best = max(
            ((s, DataStructs.TanimotoSimilarity(f, tf)) for s, tf in train),
            key=lambda t: t[1],
        )
        rows.append((smi, best_s, best))
    with open(args.out, "w") as f:
        f.write("generated,closest_train,tanimoto\n")
        for smi, ts, v in rows:
            f.write(f"{smi},{ts},{v:.4f}\n")
    print(f"wrote {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()
