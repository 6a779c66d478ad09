"""Canonical-SMILES partition pinning (VERDICT r2 item 9).

RDKit is not installed in this environment and there is no network egress,
so a machine-generated golden file of RDKit canonical strings cannot be
produced here (the attempt is documented in DESIGN_NOTES.md).  What the
uniqueness/novelty metrics actually depend on is the writer's PARTITION:
same molecule (any atom order, any SMILES spelling) -> same string;
different molecules -> different strings.  That property is pinned two
ways without RDKit:

1. exhaustive random atom-relabelings of fixture molecules must all
   canonicalize to one string (the parser round-trip makes the relabeling
   exact, not heuristic);
2. a hand-verified golden table of distinct molecules, each with several
   independent SMILES spellings (including RDKit's canonical spelling of
   that molecule, hand-checked), must form exactly one canonical class per
   molecule and distinct classes across molecules.
"""

import random

from ccsd_tpu.chem import Atom, Mol, from_smiles, to_smiles


def _permute(mol: Mol, rng: random.Random) -> Mol:
    """Exact atom relabeling of a Mol."""
    n = mol.GetNumAtoms()
    perm = list(range(n))
    rng.shuffle(perm)
    out = Mol()
    for new in range(n):
        a = mol.atoms[perm[new]]
        out.AddAtom(Atom(a.symbol, a.charge))
    inv = {old: new for new, old in enumerate(perm)}
    for b in mol.bonds:
        out.AddBond(inv[b.begin], inv[b.end], b.order)
    return out


# molecule name -> several spellings; the FIRST is RDKit's canonical form
# (hand-verified), the rest are alternative valid spellings.
GOLDEN = {
    "ethanol": ["CCO", "OCC", "C(O)C"],
    "acetic_acid": ["CC(=O)O", "OC(C)=O", "C(C)(=O)O"],
    "benzene": ["c1ccccc1", "C1=CC=CC=C1"],
    "toluene": ["Cc1ccccc1", "c1ccc(C)cc1", "CC1=CC=CC=C1"],
    "pyridine": ["c1ccncc1", "n1ccccc1", "C1=CC=NC=C1"],
    "pyrrole": ["c1cc[nH]c1", "[nH]1cccc1"],
    "furan": ["c1ccoc1", "o1cccc1"],
    "acetamide": ["CC(N)=O", "NC(C)=O", "CC(=O)N"],
    "glycine": ["NCC(=O)O", "OC(=O)CN", "C(N)C(O)=O"],
    "isobutane": ["CC(C)C", "C(C)(C)C"],
    "acetonitrile": ["CC#N", "N#CC"],
    "methylamine": ["CN", "NC"],
    "formaldehyde": ["C=O", "O=C"],
    "propene": ["C=CC", "CC=C"],
    "cyclopropane": ["C1CC1"],
    "naphthalene": ["c1ccc2ccccc2c1", "C1=CC2=CC=CC=C2C=C1"],
    "aspirin": ["CC(=O)Oc1ccccc1C(=O)O", "OC(=O)c1ccccc1OC(C)=O"],
    "acetate_anion": ["CC(=O)[O-]", "[O-]C(C)=O"],
    "ammonium": ["[NH4+]"],
    "dimethyl_ether": ["COC", "C(OC)"],
    "methanol": ["CO", "OC"],
    "urea": ["NC(N)=O", "O=C(N)N"],
    "ethylene_glycol": ["OCCO", "C(O)CO"],
    "oxirane": ["C1CO1", "O1CC1"],
    "imidazole": ["c1c[nH]cn1", "c1cnc[nH]1"],
}


def test_atom_relabeling_invariance():
    rng = random.Random(7)
    for name, spells in GOLDEN.items():
        mol = from_smiles(spells[0])
        assert mol is not None, name
        base = to_smiles(mol)
        for _ in range(8):
            assert to_smiles(_permute(mol, rng)) == base, name


def test_spellings_collapse_to_one_class():
    for name, spells in GOLDEN.items():
        canon = set()
        for s in spells:
            mol = from_smiles(s)
            assert mol is not None, (name, s)
            canon.add(to_smiles(mol))
        assert len(canon) == 1, (name, canon)


def test_distinct_molecules_stay_distinct():
    classes = {name: to_smiles(from_smiles(s[0]))
               for name, s in GOLDEN.items()}
    assert len(set(classes.values())) == len(classes), classes
