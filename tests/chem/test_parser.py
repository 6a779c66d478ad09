"""SMILES parser + kekulizer tests (chem/parser.py).

Covers the grammar QM9/ZINC need: organic subset, aromatic rings (incl.
fused systems, heteroaromatics, exocyclic doubles, charged aromatics),
brackets, branches, ring closures, dots.  Expected kekulized double-bond
counts and valences are textbook values.
"""

import pytest

from ccsd_tpu.chem import check_valency, from_smiles, to_smiles


# (smiles, num_atoms, num_bonds, num_double_bonds)
CASES = [
    ("c1ccccc1", 6, 6, 3),            # benzene
    ("Cc1ccccc1", 7, 7, 3),           # toluene
    ("c1ccncc1", 6, 6, 3),            # pyridine
    ("c1cc[nH]c1", 5, 5, 2),          # pyrrole
    ("c1ccoc1", 5, 5, 2),             # furan
    ("c1ccsc1", 5, 5, 2),             # thiophene
    ("c1ccc2ccccc2c1", 10, 11, 5),    # naphthalene (fused)
    ("O=c1cc[nH]c(=O)[nH]1", 8, 8, 3),  # uracil (exocyclic C=O)
    ("CC(=O)Oc1ccccc1C(=O)O", 13, 13, 5),  # aspirin
    ("N#Cc1ccccc1", 8, 8, 3),         # benzonitrile (triple elsewhere)
    ("C1CCCCC1", 6, 6, 0),            # cyclohexane (aliphatic ring)
    ("CCO", 3, 2, 0),
    ("CC(C)=O", 4, 3, 1),
    ("[NH4+]", 1, 0, 0),
    ("CC(=O)[O-]", 4, 3, 1),
    ("c1ccc(-c2ccccc2)cc1", 12, 13, 6),  # biphenyl, explicit single
    ("c1ccc2[nH]ccc2c1", 9, 10, 4),   # indole
    ("Cn1cccc1", 6, 6, 2),            # N-methylpyrrole (3-substituted n)
    ("c1cc[o+]cc1", 6, 6, 3),         # pyrylium (charged aromatic O)
    ("C1=CC2=CC=CC=C2C=C1", 10, 11, 5),  # pre-kekulized naphthalene
    ("CC.O", 3, 1, 0),                # dot-disconnected fragments
]


@pytest.mark.parametrize("smi,na,nb,nd", CASES)
def test_parse_counts_and_valency(smi, na, nb, nd):
    mol = from_smiles(smi)
    assert mol is not None, smi
    assert mol.GetNumAtoms() == na
    assert len(mol.GetBonds()) == nb
    assert sum(1 for b in mol.GetBonds() if b.order == 2) == nd
    ok, bad = check_valency(mol)
    assert ok, f"{smi}: valency violation {bad}"


@pytest.mark.parametrize("smi", [s for s, *_ in CASES])
def test_roundtrip_idempotent(smi):
    """write(parse(s)) is a fixed point of parse-then-write."""
    s1 = to_smiles(from_smiles(smi))
    s2 = to_smiles(from_smiles(s1))
    assert s1 == s2


@pytest.mark.parametrize("bad", [
    "c1ccccc2",       # unclosed ring
    "C(", "C)",       # unbalanced branch -> IndexError path
    "Xx",             # unknown element
    "c1ccc1",         # 4-membered all-c ring cannot kekulize... actually CAN (2 doubles)
])
def test_invalid_returns_none_or_parses(bad):
    # contract: never raises; returns a Mol or None
    from_smiles(bad)


def test_unclosed_ring_is_none():
    assert from_smiles("c1ccccc2") is None


def test_kekulization_failure_is_none():
    # odd number of needy aromatic carbons with no heteroatom relief:
    # cyclopentadienyl written aromatic without charge cannot kekulize
    assert from_smiles("c1cccc1") is None


def test_charges_parsed():
    mol = from_smiles("[NH4+]")
    assert mol.atoms[0].charge == 1
    mol = from_smiles("CC(=O)[O-]")
    assert mol.atoms[3].charge == -1


def test_permutation_invariance_of_canonical_writer():
    """Different atom orderings of the same molecule (different SMILES
    spellings) canonicalize to one string — the uniqueness-partition
    property the novelty/uniqueness metrics depend on."""
    spellings = {
        "aspirin": ["CC(=O)Oc1ccccc1C(=O)O", "OC(=O)c1ccccc1OC(C)=O",
                    "O=C(C)Oc1ccccc1C(O)=O"],
        "toluene": ["Cc1ccccc1", "c1ccccc1C", "c1ccc(C)cc1"],
        "pyridine": ["c1ccncc1", "n1ccccc1", "c1cnccc1"],
        "isopropanol": ["CC(C)O", "OC(C)C", "C(C)(C)O"],
    }
    for name, spells in spellings.items():
        canon = {to_smiles(from_smiles(s)) for s in spells}
        assert len(canon) == 1, f"{name}: {canon}"
    # and different molecules stay different
    all_canon = [to_smiles(from_smiles(s[0])) for s in spellings.values()]
    assert len(set(all_canon)) == len(all_canon)
