"""Golden tests for the molecule <-> combinatorial-complex lift.

Parity targets: cc_utils.py:286-490 (get_mol_from_x_adj, get_all_mol_rings,
mols_to_cc, ccs_to_mol) and graph_utils.py:402-419 (nxs_to_mols).  Fixtures
are hand-built kekulized molecules (benzene, naphthalene, toluene) whose
ring sets, symbols and bond orders are known exactly.
"""

import numpy as np
import pytest

from ccsd_tpu.chem import Atom, Mol
from ccsd_tpu.data.mol_utils import (
    ccs_to_mol,
    get_all_mol_rings,
    get_mol_from_x_adj,
    mols_to_cc,
    mols_to_nx,
    nxs_to_mols,
)


def _benzene() -> Mol:
    """Kekulized benzene: alternating single/double 6-ring."""
    m = Mol()
    for _ in range(6):
        m.AddAtom(Atom("C"))
    for i in range(6):
        m.AddBond(i, (i + 1) % 6, 1 + (i % 2))
    return m


def _naphthalene() -> Mol:
    """Kekulized naphthalene: two fused 6-rings sharing atoms 0, 5."""
    m = Mol()
    for _ in range(10):
        m.AddAtom(Atom("C"))
    ring1 = [(0, 1, 2), (1, 2, 1), (2, 3, 2), (3, 4, 1), (4, 5, 2), (5, 0, 1)]
    ring2 = [(0, 6, 1), (6, 7, 2), (7, 8, 1), (8, 9, 2), (9, 5, 1)]
    for u, v, o in ring1 + ring2:
        m.AddBond(u, v, o)
    return m


def _toluene() -> Mol:
    m = _benzene()
    m.AddAtom(Atom("C"))
    m.AddBond(0, 6, 1)
    return m


def test_get_all_mol_rings_benzene():
    assert get_all_mol_rings(_benzene()) == [frozenset(range(6))]


def test_get_all_mol_rings_naphthalene():
    rings = get_all_mol_rings(_naphthalene())
    assert len(rings) == 2
    assert all(len(r) == 6 for r in rings)
    shared = rings[0] & rings[1]
    assert shared == frozenset({0, 5})


def test_get_all_mol_rings_acyclic():
    m = Mol()
    for _ in range(3):
        m.AddAtom(Atom("C"))
    m.AddBond(0, 1, 1)
    m.AddBond(1, 2, 1)
    assert get_all_mol_rings(m) == []


def test_mols_to_cc_structure():
    ccs = mols_to_cc([_toluene(), _naphthalene()])
    tol, naph = ccs

    # toluene: 7 atoms (all C -> symbol 6), 7 bonds, 1 ring
    assert len(tol.cells.hyperedge_dict[0]) == 7
    assert all(a["symbol"] == 6 for a in tol.cells.hyperedge_dict[0].values())
    assert len(tol.cells.hyperedge_dict[1]) == 7
    assert list(tol.cells.hyperedge_dict[2]) == [frozenset(range(6))]
    # bond types preserved as doubles (ring alternation + methyl single)
    bt = tol.cells.hyperedge_dict[1]
    assert bt[frozenset({0, 6})]["bond_type"] == 1.0
    assert bt[frozenset({1, 2})]["bond_type"] == 2.0

    assert len(naph.cells.hyperedge_dict[2]) == 2


def test_ccs_to_mol_roundtrip():
    orig = [_toluene(), _naphthalene()]
    back = ccs_to_mol(mols_to_cc(orig))
    for m0, m1 in zip(orig, back):
        assert [a.GetSymbol() for a in m1.GetAtoms()] == [
            a.GetSymbol() for a in m0.GetAtoms()
        ]
        b0 = {frozenset((b.GetBeginAtomIdx(), b.GetEndAtomIdx())):
              b.GetBondTypeAsDouble() for b in m0.GetBonds()}
        b1 = {frozenset((b.GetBeginAtomIdx(), b.GetEndAtomIdx())):
              b.GetBondTypeAsDouble() for b in m1.GetBonds()}
        assert b0 == b1


def test_get_mol_from_x_adj():
    # 3 atoms: C, N, O one-hot over DIC_MOL_CONV; C=N single, N-O double
    x = np.zeros((4, 9), np.float32)
    x[0, 0] = 1  # C
    x[1, 1] = 1  # N
    x[2, 2] = 1  # O  (row 3 all-zero: absent atom, must be skipped)
    adj = np.zeros((4, 4), np.float32)
    adj[0, 1] = adj[1, 0] = 1
    adj[1, 2] = adj[2, 1] = 2
    mol = get_mol_from_x_adj(x, adj)
    assert [a.GetSymbol() for a in mol.GetAtoms()] == ["C", "N", "O"]
    bonds = {(b.GetBeginAtomIdx(), b.GetEndAtomIdx()): int(
        b.GetBondTypeAsDouble()) for b in mol.GetBonds()}
    assert bonds == {(0, 1): 1, (1, 2): 2}


def test_nxs_to_mols_roundtrip():
    graphs = mols_to_nx([_toluene()])
    (back,) = nxs_to_mols(graphs)
    orig = _toluene()
    assert [a.GetSymbol() for a in back.GetAtoms()] == [
        a.GetSymbol() for a in orig.GetAtoms()
    ]
    assert len(back.GetBonds()) == len(orig.GetBonds())


def test_mols_to_cc_feeds_cc_eval():
    """The lifted CCs must be consumable by eval_CC_list (the sampler path:
    reference sampler.py:869-877)."""
    from ccsd_tpu.eval.cc_stats import eval_CC_list

    ccs = mols_to_cc([_benzene(), _naphthalene(), _toluene()])
    out = eval_CC_list(
        ccs, ccs,
        dict(min_node_val=6, max_node_val=9, node_label="symbol",
             min_edge_val=1, max_edge_val=3, edge_label="bond_type",
             d_min=3, d_max=6, N=10),
        cc_nb_eval=3,
    )
    # identical sets -> every MMD ~ 0
    for k, v in out.items():
        assert v == pytest.approx(0.0, abs=1e-9), k
