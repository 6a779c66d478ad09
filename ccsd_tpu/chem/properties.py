"""Molecular property descriptors for the MOSES-style property distances.

The reference's molecule samplers print MOSES ``get_all_metrics``
(reference ccsd/src/sampler.py:850-857), whose property block reports
1-D Wasserstein distances of logP / SA / QED / molecular-weight
distributions between generated and test sets, each computed with RDKit
descriptors.  This module provides the native counterparts:

  * :func:`molecular_weight` — exact average-isotope molecular weight
    including implicit hydrogens (standard IUPAC 2021 atomic weights).
  * :func:`crippen_logp` — Wildman–Crippen atom-contribution logP on a
    COARSENED atom typing (element + ring membership + neighbor
    composition instead of the paper's 68 SMARTS classes), using the
    published contribution values for each coarse class.  Absolute values
    are therefore stack-local (same caveat as the FNV Morgan
    fingerprints, DESIGN_NOTES.md); the Wasserstein property DISTANCE is
    meaningful because both distributions run through this one function.
  * :func:`passes_filters` — MOSES "Filters"-lite: allowed-atom set
    {C, N, S, O, F, Cl, Br, H}, zero formal charge on every atom, and no
    ring larger than 8 atoms (the ring-size guard stands in for the MCF
    SMARTS list; PAINS/MCF substructure screens need a SMARTS engine and
    are documented as excluded).

SA and QED are documented exclusions: SA requires RDKit's ~500k-entry
fragment-score pickle and QED a set of RDKit descriptor models — neither
is re-derivable offline; see DESIGN_NOTES.md.

All functions accept ``ccsd_tpu.chem.Mol`` or an RDKit ``Mol`` (duck-typed
accessors, like the rest of the chem kernel).
"""

from __future__ import annotations

from typing import Set

import networkx as nx

# IUPAC 2021 standard atomic weights (conventional), the element set of the
# QM9 / ZINC250k vocabularies.
ATOMIC_WEIGHT = {
    "H": 1.008, "B": 10.81, "C": 12.011, "N": 14.007, "O": 15.999,
    "F": 18.998, "Si": 28.085, "P": 30.974, "S": 32.06, "Cl": 35.45,
    "Br": 79.904, "I": 126.904,
}


def _implicit_hs(atom) -> int:
    get = getattr(atom, "GetNumImplicitHs", None)  # RDKit name
    if get is not None:
        return int(get())
    get = getattr(atom, "num_implicit_hs", None)  # chem kernel name
    return int(get()) if get is not None else 0


def _ring_atoms(mol) -> Set[int]:
    G = nx.Graph()
    G.add_nodes_from(a.GetIdx() for a in mol.GetAtoms())
    G.add_edges_from(
        (b.GetBeginAtomIdx(), b.GetEndAtomIdx()) for b in mol.GetBonds())
    out: Set[int] = set()
    for cyc in nx.cycle_basis(G):
        out.update(cyc)
    return out


def molecular_weight(mol) -> float:
    """Molecular weight in g/mol including implicit hydrogens."""
    w = 0.0
    for a in mol.GetAtoms():
        w += ATOMIC_WEIGHT.get(a.GetSymbol(), 0.0)
        w += ATOMIC_WEIGHT["H"] * _implicit_hs(a)
    return w


# Wildman & Crippen (1999) contribution values for the coarse classes the
# native typing distinguishes.  Keys: see _logp_atom_class.
_CRIPPEN = {
    "C_sp3": 0.1441,        # C1/C2 primary/secondary aliphatic
    "C_ring": 0.2955,       # C3/C4-style ring carbon
    "C_unsat": 0.2955,      # sp2/sp carbon (C5/C6 family representative)
    "C_carbonyl": 0.0,      # C=O carbon (C5 class, ~0)
    "N_amine": -1.0190,     # N1 aliphatic amine
    "N_ring": -0.3239,      # N11/N12 ring nitrogen
    "N_amide": -0.5188,     # N2-style amide/conjugated N
    "O_hydroxyl": -0.2893,  # O2 alcohol
    "O_ether": -0.0684,     # O3 aliphatic ether
    "O_carbonyl": -0.1526,  # O9/O10 carbonyl oxygen
    "F": 0.4202,
    "Cl": 0.6895,
    "Br": 0.8456,
    "I": 0.8857,
    "P": 0.8612,
    "S": 0.6482,
    "B": -0.3187,           # boron (rare; representative value)
    "Si": 0.0,
    "H_on_C": 0.1230,       # H46 hydrocarbon H
    "H_on_hetero": -0.2677, # H50-style polar H
    "other": 0.0,
}


def _logp_atom_class(atom, mol, rings: Set[int]) -> str:
    sym = atom.GetSymbol()
    i = atom.GetIdx()
    bonds = [b for b in mol.GetBonds()
             if b.GetBeginAtomIdx() == i or b.GetEndAtomIdx() == i]

    def other_sym(b):
        j = b.GetEndAtomIdx() if b.GetBeginAtomIdx() == i else b.GetBeginAtomIdx()
        return mol.GetAtomWithIdx(j).GetSymbol()

    has_double = any(b.GetBondTypeAsDouble() >= 2.0 for b in bonds)
    dbl_to_o = any(b.GetBondTypeAsDouble() >= 2.0 and other_sym(b) == "O"
                   for b in bonds)
    if sym == "C":
        if dbl_to_o:
            return "C_carbonyl"
        if i in rings:
            return "C_ring"
        if has_double:
            return "C_unsat"
        return "C_sp3"
    if sym == "N":
        # amide: single-bonded to a carbonyl carbon
        for b in bonds:
            j = b.GetEndAtomIdx() if b.GetBeginAtomIdx() == i else b.GetBeginAtomIdx()
            nb = mol.GetAtomWithIdx(j)
            if nb.GetSymbol() == "C":
                for b2 in mol.GetBonds():
                    if j in (b2.GetBeginAtomIdx(), b2.GetEndAtomIdx()) \
                            and b2.GetBondTypeAsDouble() >= 2.0:
                        k = b2.GetEndAtomIdx() if b2.GetBeginAtomIdx() == j \
                            else b2.GetBeginAtomIdx()
                        if mol.GetAtomWithIdx(k).GetSymbol() == "O":
                            return "N_amide"
        if i in rings:
            return "N_ring"
        return "N_amine"
    if sym == "O":
        if has_double:
            return "O_carbonyl"
        if len(bonds) >= 2:
            return "O_ether"
        return "O_hydroxyl"
    if sym in _CRIPPEN:
        return sym
    return "other"


def crippen_logp(mol) -> float:
    """Coarse Wildman–Crippen logP (see module docstring for caveats)."""
    rings = _ring_atoms(mol)
    total = 0.0
    for a in mol.GetAtoms():
        cls = _logp_atom_class(a, mol, rings)
        total += _CRIPPEN[cls]
        h = _CRIPPEN["H_on_C"] if a.GetSymbol() == "C" else _CRIPPEN["H_on_hetero"]
        total += h * _implicit_hs(a)
    return total


_FILTER_ALLOWED = {"C", "N", "S", "O", "F", "Cl", "Br", "H"}
_FILTER_MAX_RING = 8


def passes_filters(mol) -> bool:
    """MOSES Filters-lite (allowed atoms, neutral, ring size ≤ 8)."""
    for a in mol.GetAtoms():
        if a.GetSymbol() not in _FILTER_ALLOWED:
            return False
        if a.GetFormalCharge() != 0:
            return False
    G = nx.Graph()
    G.add_nodes_from(a.GetIdx() for a in mol.GetAtoms())
    G.add_edges_from(
        (b.GetBeginAtomIdx(), b.GetEndAtomIdx()) for b in mol.GetBonds())
    try:
        for cyc in nx.minimum_cycle_basis(G):
            if len(cyc) > _FILTER_MAX_RING:
                return False
    except nx.NetworkXError:
        pass
    return True
