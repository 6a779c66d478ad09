"""Minimal RDKit-free molecular kernel (valence model, repair pipeline,
canonical SMILES) — the fallback backend for the QM9/ZINC pipelines.

See mol.py (structures + valence), smiles.py (canonical writer),
pipeline.py (reference-parity construct/correct/segment functions).
"""

from ccsd_tpu.chem.mol import Atom, Bond, Mol, check_valency, permitted_valences
from ccsd_tpu.chem.parser import SmilesError, from_smiles
from ccsd_tpu.chem.pipeline import (
    construct_mol,
    correct_mol,
    mol_from_nx,
    mol_to_nx,
    mol_to_smiles,
    valid_mol_can_with_seg,
)
from ccsd_tpu.chem.smiles import canonical_ranks, largest_fragment, to_smiles

__all__ = [
    "Atom", "Bond", "Mol", "check_valency", "permitted_valences",
    "construct_mol", "correct_mol", "valid_mol_can_with_seg",
    "mol_to_nx", "mol_from_nx", "mol_to_smiles",
    "to_smiles", "largest_fragment", "canonical_ranks",
    "from_smiles", "SmilesError",
]
