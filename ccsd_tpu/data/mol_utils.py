"""Molecule utilities — valency repair, SMILES IO (dual backend).

Parity target: ccsd/src/utils/mol_utils.py:24-362.  Two interchangeable
backends: RDKit when importable, else the vendored minimal kernel
(ccsd_tpu.chem) which implements the same construct/correct/segment
algorithms and a canonical SMILES writer — the QM9/ZINC pipelines run
end-to-end either way.
"""

from __future__ import annotations

import json
import os
import re
from typing import List, Optional, Tuple, Union

import networkx as nx
import numpy as np

ATOM_VALENCY = {6: 4, 7: 3, 8: 2, 9: 1, 15: 3, 16: 2, 17: 1, 35: 1, 53: 1}
AN_TO_SYMBOL = {6: "C", 7: "N", 8: "O", 9: "F", 15: "P", 16: "S", 17: "Cl",
                35: "Br", 53: "I"}
SYMBOL_TO_AN = {v: k for k, v in AN_TO_SYMBOL.items()}

QM9_ATOMIC_NUM_LIST = [6, 7, 8, 9, 0]
ZINC250K_ATOMIC_NUM_LIST = [6, 7, 8, 9, 15, 16, 17, 35, 53, 0]


def has_rdkit() -> bool:
    try:
        import rdkit

        # Reject test stubs (tests/ref_compat.py) that persist in
        # sys.modules after reference-parity tests run.
        return not getattr(rdkit, "__ccsd_stub__", False)
    except ImportError:
        return False


def _bond_decoder():
    from rdkit import Chem

    B = Chem.rdchem.BondType
    return {
        0: B.ZERO, 0.0: B.ZERO, 1: B.SINGLE, 1.0: B.SINGLE, 1.5: B.AROMATIC,
        2: B.DOUBLE, 2.0: B.DOUBLE, 2.5: B.TWOANDAHALF, 3: B.TRIPLE,
        3.0: B.TRIPLE, 3.5: B.THREEANDAHALF, 4: B.QUADRUPLE,
        4.0: B.QUADRUPLE, 4.5: B.FOURANDAHALF, 5: B.QUINTUPLE,
        5.0: B.QUINTUPLE, 5.5: B.FIVEANDAHALF,
    }


def is_molecular_config(config) -> bool:
    return str(config.data.data) in ("QM9", "ZINC250k")


def mols_to_smiles(mols) -> List[str]:
    if has_rdkit():
        from rdkit import Chem

        return [Chem.MolToSmiles(mol) for mol in mols]
    from ccsd_tpu.chem import to_smiles

    return [to_smiles(mol) for mol in mols]


def smiles_to_mols(smiles: List[str]):
    if has_rdkit():
        from rdkit import Chem

        return [Chem.MolFromSmiles(s) for s in smiles]
    from ccsd_tpu.chem import from_smiles

    return [from_smiles(s) for s in smiles]


def canonicalize_smiles(smiles: List[str]) -> List[str]:
    """Re-canonicalize SMILES strings through whichever backend is live
    (RDKit, else the vendored parser + canonical writer — round 3; strings
    that fail to parse pass through unchanged)."""
    if has_rdkit():
        from rdkit import Chem

        return [Chem.MolToSmiles(Chem.MolFromSmiles(s)) for s in smiles]
    from ccsd_tpu.chem import from_smiles, to_smiles

    out = []
    for s in smiles:
        mol = from_smiles(s)
        out.append(to_smiles(mol) if mol is not None else s)
    return out


def load_smiles(dataset: str = "QM9", folder: str = "./"):
    """Train/test SMILES from the csv + valid_idx json.  (mol_utils.py:108-141)

    Fallback when the raw csv blob is absent (as shipped): derive the TEST
    split's SMILES from the {dataset}_test_nx.pkl graphs through the
    vendored writer and return an empty train list — novelty is then
    reported against the test set and flagged by the metrics layer.
    """
    csv_path = os.path.join(folder, "data", f"{dataset.lower()}.csv")
    if not os.path.exists(csv_path):
        # fallback 1: a (derived) kekulized npz + valid_idx — canonical
        # SMILES per split through the vendored writer
        npz_path = os.path.join(folder, "data",
                                f"{dataset.lower()}_kekulized.npz")
        vidx_path = os.path.join(folder, "data",
                                 f"valid_idx_{dataset.lower()}.json")
        if os.path.exists(npz_path) and os.path.exists(vidx_path):
            from ccsd_tpu.data.mol_loader import load_mol

            mols = load_mol(npz_path)
            with open(vidx_path) as f:
                test_idx = json.load(f)
            if dataset == "QM9":
                test_idx = [int(i) for i in test_idx["valid_idxs"]]
            test_set = set(test_idx)
            smiles = [smiles_from_kekulized(x, adj) for x, adj in mols]
            train = [s for i, s in enumerate(smiles) if i not in test_set]
            test = [s for i, s in enumerate(smiles) if i in test_set]
            return train, test
        # fallback 2: the shipped test-split nx graphs only (no train set;
        # novelty is then unavailable)
        import pickle

        nx_path = os.path.join(folder, "data", f"{dataset.lower()}_test_nx.pkl")
        if not os.path.exists(nx_path):
            raise FileNotFoundError(
                f"None of {csv_path}, {npz_path}, {nx_path} exist; cannot "
                f"build SMILES sets for {dataset}"
            )
        from ccsd_tpu.chem import mol_from_nx, to_smiles

        with open(nx_path, "rb") as f:
            graphs = pickle.load(f)
        test = [to_smiles(mol_from_nx(g)) for g in graphs]
        return [], test
    import pandas as pd

    col = {"QM9": "SMILES1", "ZINC250k": "smiles"}.get(dataset)
    if col is None:
        raise ValueError(f"Wrong dataset name {dataset} in load_smiles")
    df = pd.read_csv(csv_path)
    with open(os.path.join(folder, "data", f"valid_idx_{dataset.lower()}.json")) as f:
        test_idx = json.load(f)
    if dataset == "QM9":
        test_idx = [int(i) for i in test_idx["valid_idxs"]]
    test_set = set(test_idx)
    train_idx = [i for i in range(len(df)) if i not in test_set]
    return list(df[col].loc[train_idx]), list(df[col].loc[test_idx])


def check_valency(mol) -> Tuple[bool, Optional[List[int]]]:
    """Sanitize-properties check returning the offending (atom, valence)."""
    import rdkit
    from rdkit import Chem

    try:
        result = Chem.SanitizeMol(
            mol, sanitizeOps=Chem.SanitizeFlags.SANITIZE_PROPERTIES
        )
        if result != rdkit.Chem.rdmolops.SanitizeFlags.SANITIZE_NONE:
            return False, []
        return True, None
    except ValueError as e:
        e = str(e)
        p = e.find("#")
        atomid_valence = list(map(int, re.findall(r"\d+", e[p:])))
        return False, atomid_valence


def construct_mol(x: np.ndarray, adj: np.ndarray, atomic_num_list: List[int]):
    """Dense one-hot (x, adj) -> RWMol with formal-charge fixes.

    Parity: mol_utils.py:144-188.
    """
    from rdkit import Chem

    bond_decoder = _bond_decoder()
    mol = Chem.RWMol()
    atoms = np.argmax(x, axis=1)
    atoms_exist = atoms != len(atomic_num_list) - 1
    for atom in atoms[atoms_exist]:
        mol.AddAtom(Chem.Atom(int(atomic_num_list[atom])))
    adj = np.argmax(adj, axis=0)
    adj = adj[atoms_exist, :][:, atoms_exist]
    adj = np.where(adj == 3, -1, adj) + 1
    for start, end in zip(*np.nonzero(adj)):
        if start > end:
            mol.AddBond(int(start), int(end), bond_decoder[adj[start, end]])
            flag, atomid_valence = check_valency(mol)
            if flag:
                continue
            assert len(atomid_valence) == 2
            idx, v = atomid_valence
            an = mol.GetAtomWithIdx(idx).GetAtomicNum()
            if an in (7, 8, 16) and (v - ATOM_VALENCY[an]) == 1:
                mol.GetAtomWithIdx(idx).SetFormalCharge(1)
    return mol


def correct_mol(mol) -> Tuple[object, bool]:
    """Iterative valency repair (drop/downgrade highest bonds).

    Parity: mol_utils.py:256-300.  Inherently sequential host code — kept
    off the device on purpose.
    """
    bond_decoder = _bond_decoder()
    no_correct = check_valency(mol)[0]
    while True:
        flag, atomid_valence = check_valency(mol)
        if flag:
            break
        assert len(atomid_valence) == 2
        idx = atomid_valence[0]
        queue = [
            (b.GetIdx(), int(b.GetBondType()), b.GetBeginAtomIdx(), b.GetEndAtomIdx())
            for b in mol.GetAtomWithIdx(idx).GetBonds()
        ]
        queue.sort(key=lambda tup: tup[1], reverse=True)
        if queue:
            start, end, t = queue[0][2], queue[0][3], queue[0][1] - 1
            mol.RemoveBond(start, end)
            if t >= 1:
                mol.AddBond(start, end, bond_decoder[t])
    return mol, no_correct


def valid_mol_can_with_seg(m, largest_connected_comp: bool = True):
    """Canonical validity + largest fragment.  (mol_utils.py:303-326)"""
    from rdkit import Chem

    if m is None:
        return None
    sm = Chem.MolToSmiles(m, isomericSmiles=True)
    if largest_connected_comp and "." in sm:
        vsm = sorted(((s, len(s)) for s in sm.split(".")),
                     key=lambda t: t[1], reverse=True)
        return Chem.MolFromSmiles(vsm[0][0])
    return Chem.MolFromSmiles(sm)


def gen_mol(x, adj, dataset: str, largest_connected_comp: bool = True):
    """Model output -> valid molecules + no-correction count.

    Parity: mol_utils.py:191-229 signature/semantics (jnp/np inputs).
    """
    x = np.asarray(x)
    adj = np.asarray(adj)
    atomic_num_list = (
        QM9_ATOMIC_NUM_LIST if dataset == "QM9" else ZINC250K_ATOMIC_NUM_LIST
    )
    if has_rdkit():
        _construct, _correct, _seg = (
            construct_mol, correct_mol, valid_mol_can_with_seg
        )
    else:
        from ccsd_tpu.chem.pipeline import (
            construct_mol as _construct,
            correct_mol as _correct,
            valid_mol_can_with_seg as _seg,
        )
    mols, num_no_correct = [], 0
    for x_elem, adj_elem in zip(x, adj):
        mol = _construct(x_elem, adj_elem, atomic_num_list)
        cmol, no_correct = _correct(mol)
        if no_correct:
            num_no_correct += 1
        vcmol = _seg(cmol, largest_connected_comp=largest_connected_comp)
        mols.append(vcmol)
    return [m for m in mols if m is not None], num_no_correct


def smiles_from_kekulized(x: np.ndarray, adj: np.ndarray) -> str:
    """Canonical SMILES of one kekulized-npz entry (atomic numbers +
    bond-order channels) through the vendored writer."""
    from ccsd_tpu.chem import Atom, Mol, to_smiles

    mol = Mol()
    remap = {}
    for i in np.nonzero(np.asarray(x))[0]:
        remap[int(i)] = mol.AddAtom(Atom(int(x[i])))
    orders = adj[0] + 2 * adj[1] + 3 * adj[2]
    for i in remap:
        for j in remap:
            if i < j and orders[i, j]:
                mol.AddBond(remap[i], remap[j], int(orders[i, j]))
    return to_smiles(mol)


def model_output_to_mol_inputs(x: np.ndarray, adj: np.ndarray
                               ) -> Tuple[np.ndarray, np.ndarray]:
    """Sampler output -> construct_mol inputs.

    Parity: ccsd/src/sampler.py:814-827.  adj (B, N, N) continuous bond
    orders are rounded (quantize_mol thresholds .5/1.5/2.5), shifted so the
    channel order becomes (single, double, triple, virtual), and one-hot
    expanded to (B, 4, N, N); x (B, N, F) is binarized at 0.5 and the
    virtual-atom class column 1 - sum is appended.
    """
    from ccsd_tpu.ops.masks import quantize_mol

    adj_int = np.asarray(quantize_mol(adj))  # (B, N, N) ints 0..3
    adj_oh = np.zeros((*adj_int.shape, 4), np.float32)
    for order in (1, 2, 3):
        adj_oh[..., order - 1] = adj_int == order
    adj_oh[..., 3] = adj_int == 0  # virtual-bond channel
    adj_ch = np.moveaxis(adj_oh, -1, 1)  # (B, 4, N, N)

    x_bin = (np.asarray(x) > 0.5).astype(np.float32)
    x_full = np.concatenate(
        [x_bin, 1.0 - x_bin.sum(-1, keepdims=True)], axis=-1
    )
    return x_full, adj_ch


def mols_to_nx(mols) -> List[nx.Graph]:
    """Molecules -> labeled nx graphs.  (mol_utils.py:329-362)"""
    out = []
    for mol in mols:
        G = nx.Graph()
        for atom in mol.GetAtoms():
            G.add_node(atom.GetIdx(), label=atom.GetSymbol())
        for bond in mol.GetBonds():
            G.add_edge(bond.GetBeginAtomIdx(), bond.GetEndAtomIdx(),
                       label=int(bond.GetBondTypeAsDouble()))
        out.append(G)
    return out


def nxs_to_mols(graphs: List[nx.Graph]) -> list:
    """Labeled nx graphs -> molecules.  Parity: graph_utils.py:402-419."""
    if has_rdkit():
        from rdkit import Chem

        bond_decoder = _bond_decoder()
        mols = []
        for g in graphs:
            mol = Chem.RWMol()
            for _, symbol in g.nodes.data("label"):
                mol.AddAtom(Chem.Atom(symbol))
            for a, b, bond_type in g.edges.data("label"):
                mol.AddBond(a, b, bond_decoder[bond_type])
            mols.append(mol)
        return mols
    from ccsd_tpu.chem import mol_from_nx

    return [mol_from_nx(g) for g in graphs]


def get_mol_from_x_adj(x: np.ndarray, adj: np.ndarray, dataset: str = "QM9"):
    """(x one-hot over DIC_MOL_CONV types, adj integer bond orders) -> Mol.

    Parity: cc_utils.py:286-315 — the post-``get_transform_fn`` decode
    (atoms 0:C 1:N 2:O 3:F 4:P 5:S 6:Cl 7:Br 8:I; bonds 1/2/3).
    """
    from ccsd_tpu.data.cc_codec import DIC_MOL_CONV

    x = np.asarray(x)
    adj = np.asarray(adj)
    if has_rdkit():
        from rdkit import Chem

        bond_decoder = _bond_decoder()
        mol = Chem.RWMol()
        for i in range(x.shape[0]):
            if x[i].any():
                mol.AddAtom(Chem.Atom(DIC_MOL_CONV[int(np.argmax(x[i]))]))
        for i in range(adj.shape[0]):
            for j in range(i + 1, adj.shape[1]):
                if adj[i, j]:
                    mol.AddBond(i, j, bond_decoder[float(adj[i, j])])
        return mol.GetMol()
    from ccsd_tpu.chem import Atom, Mol

    mol = Mol()
    for i in range(x.shape[0]):
        if x[i].any():
            mol.AddAtom(Atom(DIC_MOL_CONV[int(np.argmax(x[i]))]))
    for i in range(adj.shape[0]):
        for j in range(i + 1, adj.shape[1]):
            if adj[i, j]:
                mol.AddBond(i, j, int(adj[i, j]))
    return mol


def get_all_mol_rings(mol) -> list:
    """All rings of a molecule as frozensets of atom indices.

    Parity: cc_utils.py:317-334 (RDKit GetSymmSSSR).  Chem-backend
    fallback: networkx minimum cycle basis over the bond graph — the same
    ring content as SSSR for molecular graphs (both are minimum cycle
    bases; tests/data/test_mol_cc.py pins fixture molecules).
    """
    if has_rdkit() and not isinstance(mol, _chem_mol_types()):
        from rdkit import Chem

        Chem.GetSymmSSSR(mol)
        return [frozenset(sorted(r)) for r in mol.GetRingInfo().AtomRings()]
    G = nx.Graph()
    G.add_nodes_from(a.GetIdx() for a in mol.GetAtoms())
    G.add_edges_from(
        (b.GetBeginAtomIdx(), b.GetEndAtomIdx()) for b in mol.GetBonds())
    return [frozenset(c) for c in nx.minimum_cycle_basis(G)]


def _chem_mol_types() -> tuple:
    from ccsd_tpu.chem import Mol as ChemMol

    return (ChemMol,)


def mols_to_cc(mols) -> list:
    """Molecules -> CCs with rings as rank-2 cells (a lift operation).

    Parity: cc_utils.py:337-380.  Atoms become rank-0 cells with a
    ``symbol`` attr (atomic number), bonds rank-1 cells with ``bond_type``,
    SSSR rings rank-2 cells.  Works on either chemistry backend.
    """
    from ccsd_tpu.data.complex import CombinatorialComplex

    ccs = []
    for mol in mols:
        CC = CombinatorialComplex()
        for atom in mol.GetAtoms():
            CC.add_cell((atom.GetIdx(),), rank=0,
                        symbol=SYMBOL_TO_AN[atom.GetSymbol()])
        for bond in mol.GetBonds():
            CC.add_cell((bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()),
                        rank=1, bond_type=bond.GetBondTypeAsDouble())
        for ring in get_all_mol_rings(mol):
            CC.add_cell(ring, rank=2)
        ccs.append(CC)
    return ccs


def ccs_to_mol(ccs) -> list:
    """CCs (with symbol / bond_type attrs) -> molecules.

    Parity: cc_utils.py:460-490.  Inverse of mols_to_cc up to ring cells
    (rank-2 cells carry no molecular information).
    """
    mols = []
    use_rdkit = has_rdkit()
    if use_rdkit:
        from rdkit import Chem

        bond_decoder = _bond_decoder()
    else:
        from ccsd_tpu.chem import Atom, Mol
    for cc in ccs:
        atoms = cc.cells.hyperedge_dict.get(0, {})
        bonds = cc.cells.hyperedge_dict.get(1, {})
        if use_rdkit:
            mol = Chem.RWMol()
            for atom in atoms:
                mol.AddAtom(Chem.Atom(AN_TO_SYMBOL[atoms[atom]["symbol"]]))
            for b in bonds:
                u, v = tuple(b)
                mol.AddBond(u, v, bond_decoder[bonds[b]["bond_type"]])
            mols.append(mol.GetMol())
        else:
            mol = Mol()
            for atom in atoms:
                mol.AddAtom(Atom(AN_TO_SYMBOL[atoms[atom]["symbol"]]))
            for b in bonds:
                u, v = tuple(b)
                mol.AddBond(u, v, int(bonds[b]["bond_type"]))
            mols.append(mol)
    return mols
