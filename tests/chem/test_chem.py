"""Vendored chemistry kernel: valence model, repair loop, canonical SMILES.

Reference-parity semantics from ccsd/src/utils/mol_utils.py:24-326 (RDKit
is absent in this environment; these tests pin the vendored backend's
behavior to the documented reference algorithms).
"""

import itertools

import networkx as nx
import numpy as np
import pytest

from ccsd_tpu.chem import (
    Atom,
    Mol,
    check_valency,
    construct_mol,
    correct_mol,
    mol_from_nx,
    mol_to_nx,
    to_smiles,
    valid_mol_can_with_seg,
)
from ccsd_tpu.chem.mol import permitted_valences


def _chain(symbols, orders):
    m = Mol()
    for s in symbols:
        m.AddAtom(Atom(s))
    for i, o in enumerate(orders):
        m.AddBond(i, i + 1, o)
    return m


def test_valence_model():
    assert permitted_valences("C", 0) == (4,)
    assert permitted_valences("N", 1) == (4,)
    assert permitted_valences("O", 1) == (3,)
    assert permitted_valences("S", 0) == (2, 4, 6)


def test_check_valency_flags_first_overvalent_atom():
    m = _chain(["C", "N", "C"], [2, 3])  # N has valence 5 > 3
    ok, payload = check_valency(m)
    assert not ok
    assert payload == [1, 5]  # same [atom_idx, valence] RDKit's error carries


def test_check_valency_respects_formal_charge():
    m = Mol()
    m.AddAtom(Atom("N", charge=1))
    for _ in range(4):
        m.AddAtom(Atom("C"))
        m.AddBond(0, m.GetNumAtoms() - 1, 1)
    assert check_valency(m) == (True, None)


def test_correct_mol_downgrades_highest_order_bond_first():
    # N with a triple and a double bond (v=5): the triple is downgraded
    # first (queue sorted by bond-type int desc, mol_utils.py:283-295);
    # still over-valent at 4, the repaired bond was re-added at the END of
    # the bond list (RDKit RWMol semantics), so the second iteration's
    # stable sort downgrades the ORIGINAL double next, ending at v=3
    m = _chain(["C", "N", "C"], [3, 2])
    fixed, no_correct = correct_mol(m)
    assert not no_correct
    assert check_valency(fixed) == (True, None)
    b01 = fixed.bond_between(0, 1)
    b12 = fixed.bond_between(1, 2)
    assert b01.order == 2 and b12.order == 1  # 3->2 kept; 2->1


def test_correct_mol_removes_single_bonds_entirely():
    m = Mol()
    m.AddAtom(Atom("F"))
    m.AddAtom(Atom("C"))
    m.AddAtom(Atom("C"))
    m.AddBond(0, 1, 1)
    m.AddBond(0, 2, 1)  # F valence 2 > 1
    fixed, no_correct = correct_mol(m)
    assert not no_correct
    assert check_valency(fixed) == (True, None)
    assert len(fixed.GetBonds()) == 1


def test_construct_mol_charge_fix():
    # trimethylamine N-oxide-like: N bonded to 4 neighbors one over valence
    # by exactly 1 => +1 formal charge (mol_utils.py:180-186)
    x = np.zeros((9, 5))
    x[0, 1] = 1  # N
    for i in (1, 2, 3, 4):
        x[i, 0] = 1  # C
    x[5:, 4] = 1  # virtual
    adj = np.zeros((4, 9, 9))
    adj[3] = 1
    for j in (1, 2, 3, 4):
        adj[0, 0, j] = adj[0, j, 0] = 1
        adj[3, 0, j] = adj[3, j, 0] = 0
    mol = construct_mol(x, adj, [6, 7, 8, 9, 0])
    assert mol.GetAtomWithIdx(0).GetFormalCharge() == 1
    assert check_valency(mol) == (True, None)
    assert to_smiles(mol) == "C[N+](C)(C)C"


def test_smiles_permutation_invariance():
    # toluene-like kekulized ring + substituent
    g = nx.Graph()
    labels = ["C"] * 7
    for i, s in enumerate(labels):
        g.add_node(i, label=s)
    ring = [(0, 1, 2), (1, 2, 1), (2, 3, 2), (3, 4, 1), (4, 5, 2), (5, 0, 1)]
    for u, v, o in ring:
        g.add_edge(u, v, label=o)
    g.add_edge(0, 6, label=1)
    base = to_smiles(mol_from_nx(g))
    rng = np.random.default_rng(0)
    for _ in range(20):
        perm = rng.permutation(7)
        h = nx.relabel_nodes(g, {i: int(perm[i]) for i in range(7)})
        assert to_smiles(mol_from_nx(h)) == base


def test_smiles_distinguishes_isomers():
    # n-butane vs isobutane
    n_but = _chain(["C"] * 4, [1, 1, 1])
    iso = Mol()
    for _ in range(4):
        iso.AddAtom(Atom("C"))
    for j in (1, 2, 3):
        iso.AddBond(0, j, 1)
    assert to_smiles(n_but) != to_smiles(iso)


def test_largest_fragment_by_smiles_length():
    m = Mol()
    for s in ("C", "C", "C", "O", "C"):
        m.AddAtom(Atom(s))
    m.AddBond(0, 1, 1)
    m.AddBond(1, 2, 1)  # fragment CCC
    m.AddBond(3, 4, 1)  # fragment CO
    biggest = valid_mol_can_with_seg(m)
    assert to_smiles(biggest) == "CCC"


def test_nx_roundtrip():
    m = _chain(["C", "N", "O"], [1, 2])
    g = mol_to_nx(m)
    m2 = mol_from_nx(g)
    assert to_smiles(m) == to_smiles(m2)


def test_ring_closure_digits():
    # two fused rings (bicyclic) exercise multiple closure digits
    g = nx.Graph()
    for i in range(6):
        g.add_node(i, label="C")
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (4, 5), (5, 3)]
    for u, v in edges:
        g.add_edge(u, v, label=1)
    s = to_smiles(mol_from_nx(g))
    assert s.count("1") == 2 and s.count("2") == 2
    # and invariant under relabeling
    h = nx.relabel_nodes(g, {i: (i * 5) % 6 for i in range(6)})
    assert to_smiles(mol_from_nx(h)) == s
