"""Molecule preprocessing: SMILES CSV -> kekulized (x, adj) npz.

Parity targets: ccsd/data/preprocess.py:25-86 and
ccsd/data/utils/smile_to_graph.py:20-154 (GGNN-style featurization, MoFlow
lineage): atomic-number arrays padded to out_size, and a (4, N, N) one-hot
bond tensor over {single, double, triple, aromatic}; kekulized so aromatic
bonds become alternating single/double.  Also preprocess_for_nspdk
(ccsd/data/preprocess_for_nspdk.py:25-79).

Dual backend (round 3): RDKit when importable, else the vendored chem
kernel's SMILES parser + kekulizer (chem/parser.py) — the CSV -> npz path
now executes in RDKit-free environments (golden-tested in
tests/data/test_preprocess.py).

CLI: python -m ccsd_tpu.data.preprocess --dataset QM9 [--folder ./]
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional, Tuple

import numpy as np


def smiles_to_graph_arrays(
    smiles: str, max_atoms: int, out_size: int, kekulize: bool = True
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """One SMILES -> (atomic-number array (out_size,), bond tensor (4,N,N))."""
    from ccsd_tpu.data.mol_utils import has_rdkit

    if not has_rdkit():
        return _smiles_to_graph_arrays_chem(smiles, max_atoms, out_size)
    from rdkit import Chem

    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        return None
    canonical = Chem.MolToSmiles(mol, isomericSmiles=False, canonical=True)
    mol = Chem.MolFromSmiles(canonical)
    if mol is None or mol.GetNumAtoms() > max_atoms:
        return None
    if kekulize:
        Chem.Kekulize(mol)
    n = mol.GetNumAtoms()
    atom_array = np.zeros(out_size, dtype=np.int32)
    atom_array[:n] = np.array(
        [a.GetAtomicNum() for a in mol.GetAtoms()], dtype=np.int32
    )
    adjs = np.zeros((4, out_size, out_size), dtype=np.float32)
    channel = {
        Chem.BondType.SINGLE: 0,
        Chem.BondType.DOUBLE: 1,
        Chem.BondType.TRIPLE: 2,
        Chem.BondType.AROMATIC: 3,
    }
    for bond in mol.GetBonds():
        ch = channel[bond.GetBondType()]
        i, j = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
        adjs[ch, i, j] = adjs[ch, j, i] = 1.0
    return atom_array, adjs


def _smiles_to_graph_arrays_chem(
    smiles: str, max_atoms: int, out_size: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Chem-kernel backend: vendored parser emits kekulized bond orders
    directly, so the aromatic channel (3) stays empty — exactly what the
    reference produces after Chem.Kekulize (smile_to_graph.py:20-154)."""
    from ccsd_tpu.chem import from_smiles

    mol = from_smiles(smiles)
    if mol is None or mol.GetNumAtoms() > max_atoms:
        return None
    n = mol.GetNumAtoms()
    atom_array = np.zeros(out_size, dtype=np.int32)
    atom_array[:n] = np.array(
        [a.GetAtomicNum() for a in mol.GetAtoms()], dtype=np.int32
    )
    adjs = np.zeros((4, out_size, out_size), dtype=np.float32)
    for bond in mol.GetBonds():
        order = int(bond.GetBondTypeAsDouble())
        if order not in (1, 2, 3):
            return None
        i, j = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
        adjs[order - 1, i, j] = adjs[order - 1, j, i] = 1.0
    return atom_array, adjs


DATASET_SPECS = {
    "QM9": dict(col="SMILES1", max_atoms=9, out_size=9),
    "ZINC250k": dict(col="smiles", max_atoms=38, out_size=38),
}


def preprocess_dataset(dataset: str, folder: str = "./") -> str:
    """CSV -> <dataset>_kekulized.npz in the data dir."""
    import pandas as pd

    spec = DATASET_SPECS[dataset]
    csv_path = os.path.join(folder, "data", f"{dataset.lower()}.csv")
    df = pd.read_csv(csv_path)
    xs: List[np.ndarray] = []
    adjs: List[np.ndarray] = []
    for smi in df[spec["col"]]:
        out = smiles_to_graph_arrays(
            smi, spec["max_atoms"], spec["out_size"]
        )
        if out is None:
            continue
        xs.append(out[0])
        adjs.append(out[1])
    out_path = os.path.join(folder, "data", f"{dataset.lower()}_kekulized.npz")
    np.savez(out_path, np.asarray(xs), np.asarray(adjs))
    return out_path


def preprocess_for_nspdk(dataset: str, folder: str = "./") -> str:
    """Test SMILES -> nx graph pickle <dataset>_test_nx.pkl for NSPDK MMD."""
    import pickle

    from ccsd_tpu.data.mol_utils import load_smiles, mols_to_nx, smiles_to_mols

    _, test_smiles = load_smiles(dataset, folder)
    graphs = mols_to_nx(smiles_to_mols(test_smiles))
    out_path = os.path.join(
        folder, "data", f"{dataset.lower()}_test_nx.pkl"
    )
    with open(out_path, "wb") as f:
        pickle.dump(graphs, f)
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, required=True,
                   choices=sorted(DATASET_SPECS))
    p.add_argument("--folder", type=str, default="./")
    p.add_argument("--nspdk", action="store_true",
                   help="also build the NSPDK test-graph pickle")
    args = p.parse_args()
    print(preprocess_dataset(args.dataset, args.folder))
    if args.nspdk:
        print(preprocess_for_nspdk(args.dataset, args.folder))


if __name__ == "__main__":
    main()
