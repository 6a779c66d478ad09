#!/usr/bin/env python
"""Max Tanimoto similarity of generated molecules vs the training set.

Parity: /root/reference/scripts/run_tanimoto.py:26-180 (Morgan
fingerprints, radius 2, 2048 bits).  Requires RDKit.
Usage: python scripts/run_tanimoto.py --smiles samples/QM9/smiles.txt \
           --dataset QM9 [--folder ./]
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
    p.add_argument("--smiles", type=str, required=True,
                   help="file with one generated SMILES per line")
    p.add_argument("--dataset", type=str, default="QM9",
                   choices=["QM9", "ZINC250k"])
    p.add_argument("--folder", type=str, default="./")
    args = p.parse_args()

    with open(args.smiles) as f:
        gen = [s.strip() for s in f if s.strip()]
    train_smiles, _ = load_smiles(args.dataset, folder=args.folder)

    def fp(smi):
        mol = Chem.MolFromSmiles(smi)
        if mol is None:
            return None
        return AllChem.GetMorganFingerprintAsBitVect(mol, 2, nBits=2048)

    train_fps = [f for f in (fp(s) for s in train_smiles) if f is not None]
    for smi in gen:
        f = fp(smi)
        if f is None:
            print(f"{smi}\tinvalid")
            continue
        best = max(DataStructs.TanimotoSimilarity(f, t) for t in train_fps)
        print(f"{smi}\t{best:.4f}")


if __name__ == "__main__":
    main()
