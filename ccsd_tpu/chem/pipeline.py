"""RDKit-free implementations of the CCSD molecule-generation pipeline.

Same algorithms as the reference (ccsd/src/utils/mol_utils.py:144-326), run
on the minimal kernel in ccsd_tpu.chem.mol — used whenever RDKit is absent
(data/mol_utils.py dispatches per backend).  Every step mirrors the
reference exactly:

  construct_mol : argmax decode + incremental N/O/S formal-charge fix
                  (mol_utils.py:144-188)
  correct_mol   : valency-repair loop, highest-order bond downgraded first
                  (mol_utils.py:256-300)
  valid_mol_can_with_seg : largest fragment by longest fragment-SMILES
                  (mol_utils.py:303-326)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import networkx as nx
import numpy as np

from ccsd_tpu.chem.mol import (
    AN_TO_SYMBOL,
    Atom,
    Mol,
    check_valency,
    permitted_valences,
)
from ccsd_tpu.chem.smiles import largest_fragment, to_smiles

ATOM_VALENCY = {6: 4, 7: 3, 8: 2, 9: 1, 15: 3, 16: 2, 17: 1, 35: 1, 53: 1}


def construct_mol(x: np.ndarray, adj: np.ndarray,
                  atomic_num_list: List[int]) -> Mol:
    """Dense one-hot (x, adj) -> Mol with incremental formal-charge fixes.

    Parity: mol_utils.py:144-188 — bonds are added in np.nonzero order with
    start > end, and after each addition a failed valency check on an
    N/O/S atom exactly one over its valence sets formal charge +1.
    """
    mol = Mol()
    atoms = np.argmax(x, axis=1)
    atoms_exist = atoms != len(atomic_num_list) - 1
    for atom in atoms[atoms_exist]:
        mol.AddAtom(Atom(int(atomic_num_list[atom])))
    adj = np.argmax(adj, axis=0)
    adj = adj[atoms_exist, :][:, atoms_exist]
    adj = np.where(adj == 3, -1, adj) + 1
    for start, end in zip(*np.nonzero(adj)):
        if start > end:
            mol.AddBond(int(start), int(end), int(adj[start, end]))
            flag, atomid_valence = check_valency(mol)
            if flag:
                continue
            assert len(atomid_valence) == 2
            idx, v = atomid_valence
            an = mol.GetAtomWithIdx(idx).GetAtomicNum()
            if an in (7, 8, 16) and (v - ATOM_VALENCY[an]) == 1:
                mol.GetAtomWithIdx(idx).SetFormalCharge(1)
    return mol


def correct_mol(mol: Mol) -> Tuple[Mol, bool]:
    """Iterative valency repair.  Parity: mol_utils.py:256-300 — at each
    failure the offending atom's highest-order bond is downgraded by one
    (removed when it reaches zero)."""
    no_correct = check_valency(mol)[0]
    while True:
        flag, atomid_valence = check_valency(mol)
        if flag:
            break
        assert len(atomid_valence) == 2
        idx = atomid_valence[0]
        queue = [
            (b.GetIdx(), int(b.GetBondType()), b.GetBeginAtomIdx(),
             b.GetEndAtomIdx())
            for b in mol.GetAtomWithIdx(idx).GetBonds()
        ]
        queue.sort(key=lambda tup: tup[1], reverse=True)
        if queue:
            start, end, t = queue[0][2], queue[0][3], queue[0][1] - 1
            mol.RemoveBond(start, end)
            if t >= 1:
                mol.AddBond(start, end, t)
    return mol, no_correct


def valid_mol_can_with_seg(m: Optional[Mol],
                           largest_connected_comp: bool = True
                           ) -> Optional[Mol]:
    """Largest-fragment filter.  Parity: mol_utils.py:303-326 (fragment
    chosen by longest fragment-SMILES string)."""
    if m is None:
        return None
    if largest_connected_comp:
        return largest_fragment(m)
    return m


def mol_to_nx(mol: Mol) -> nx.Graph:
    """Labeled nx graph (node label = symbol, edge label = int bond order).
    Parity: mol_utils.py:329-362."""
    G = nx.Graph()
    for atom in mol.GetAtoms():
        G.add_node(atom.GetIdx(), label=atom.GetSymbol())
    for bond in mol.GetBonds():
        G.add_edge(bond.GetBeginAtomIdx(), bond.GetEndAtomIdx(),
                   label=int(bond.GetBondTypeAsDouble()))
    return G


def mol_from_nx(g: nx.Graph) -> Mol:
    """Inverse of mol_to_nx — used to canonicalize the shipped
    {qm9,zinc250k}_test_nx.pkl graphs without RDKit."""
    mol = Mol()
    remap = {}
    for node in sorted(g.nodes()):
        remap[node] = mol.AddAtom(Atom(str(g.nodes[node]["label"])))
    for u, v, data in g.edges(data=True):
        mol.AddBond(remap[u], remap[v], int(data.get("label", 1)))
    return mol


def mol_to_smiles(mol: Optional[Mol]) -> Optional[str]:
    return to_smiles(mol)
