"""Minimal molecular kernel: editable molecule + RDKit-compatible valence
model, for environments without RDKit.

Implements exactly the subset of cheminformatics the CCSD molecule pipeline
needs (parity targets ccsd/src/utils/mol_utils.py:24-326):

  * an editable molecule (atoms with formal charges, integer-order bonds)
    mirroring the RWMol API surface used by construct/correct_mol;
  * RDKit's explicit-valence check (``SANITIZE_PROPERTIES``): an atom is
    over-valent when the sum of its bond orders exceeds the maximum
    permitted valence for (element, formal charge) — returned as
    ``(False, [atom_idx, valence])`` like the reference's regex-parsed
    RDKit error (mol_utils.py:230-252);
  * implicit-hydrogen counting by the "smallest permitted valence that
    fits" rule (what bare organic-subset SMILES atoms imply).

Only kekulized structures appear in this pipeline (the reference stores
QM9/ZINC kekulized and models bond orders 1/2/3), so aromatic perception is
intentionally out of scope.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

AN_TO_SYMBOL = {1: "H", 5: "B", 6: "C", 7: "N", 8: "O", 9: "F", 15: "P",
                16: "S", 17: "Cl", 35: "Br", 53: "I"}
SYMBOL_TO_AN = {v: k for k, v in AN_TO_SYMBOL.items()}

# Neutral default valences (organic subset reading rules; RDKit defaults).
DEFAULT_VALENCES: Dict[str, Tuple[int, ...]] = {
    "H": (1,), "B": (3,), "C": (4,), "N": (3,), "O": (2,), "F": (1,),
    "P": (3, 5), "S": (2, 4, 6), "Cl": (1,), "Br": (1,), "I": (1,),
}

# Charged-species permitted valences (isoelectronic shifts RDKit accepts;
# the construct_mol charge fix only ever produces N+/O+/S+,
# mol_utils.py:180-186).
CHARGED_VALENCES: Dict[Tuple[str, int], Tuple[int, ...]] = {
    ("N", 1): (4,), ("O", 1): (3,), ("S", 1): (3, 5), ("C", 1): (3,),
    ("P", 1): (4,),
    ("N", -1): (2,), ("O", -1): (1,), ("C", -1): (3,), ("S", -1): (1,),
    ("B", -1): (4,),
}


def permitted_valences(symbol: str, charge: int) -> Tuple[int, ...]:
    if charge == 0:
        return DEFAULT_VALENCES.get(symbol, (0,))
    return CHARGED_VALENCES.get((symbol, charge), DEFAULT_VALENCES.get(symbol, (0,)))


class Atom:
    """One atom: element symbol + formal charge (RDKit Atom API subset)."""

    __slots__ = ("symbol", "charge", "idx", "_mol")

    def __init__(self, symbol_or_an, charge: int = 0):
        if isinstance(symbol_or_an, int):
            self.symbol = AN_TO_SYMBOL[symbol_or_an]
        else:
            self.symbol = str(symbol_or_an)
        self.charge = charge
        self.idx = -1
        self._mol: Optional["Mol"] = None

    # RDKit-compatible accessors (used by construct/correct_mol)
    def GetIdx(self) -> int:
        return self.idx

    def GetSymbol(self) -> str:
        return self.symbol

    def GetAtomicNum(self) -> int:
        return SYMBOL_TO_AN[self.symbol]

    def GetFormalCharge(self) -> int:
        return self.charge

    def SetFormalCharge(self, c: int) -> None:
        self.charge = c

    def GetBonds(self) -> List["Bond"]:
        assert self._mol is not None
        return [b for b in self._mol.bonds if self.idx in (b.begin, b.end)]

    def explicit_valence(self) -> int:
        return sum(b.order for b in self.GetBonds())

    def num_implicit_hs(self) -> int:
        """Hydrogens implied by the smallest permitted valence that fits."""
        v = self.explicit_valence()
        fits = [p for p in permitted_valences(self.symbol, self.charge)
                if p >= v]
        return (min(fits) - v) if fits else 0


class Bond:
    """Integer-order bond (1=single, 2=double, 3=triple — the same ints
    RDKit's BondType casts to, which correct_mol sorts by)."""

    __slots__ = ("begin", "end", "order", "idx")

    def __init__(self, begin: int, end: int, order: int):
        self.begin = begin
        self.end = end
        self.order = int(order)
        self.idx = -1

    def GetIdx(self) -> int:
        return self.idx

    def GetBondType(self) -> int:
        return self.order

    def GetBondTypeAsDouble(self) -> float:
        return float(self.order)

    def GetBeginAtomIdx(self) -> int:
        return self.begin

    def GetEndAtomIdx(self) -> int:
        return self.end

    def other(self, idx: int) -> int:
        return self.end if idx == self.begin else self.begin


class Mol:
    """Editable molecule (RWMol API subset used by the CCSD pipeline)."""

    def __init__(self):
        self.atoms: List[Atom] = []
        self.bonds: List[Bond] = []

    # ---- construction -----------------------------------------------------

    def AddAtom(self, atom: Atom) -> int:
        atom.idx = len(self.atoms)
        atom._mol = self
        self.atoms.append(atom)
        return atom.idx

    def AddBond(self, begin: int, end: int, order) -> int:
        # RDKit raises on duplicate bonds; the pipeline never adds one.
        b = Bond(begin, end, int(order))
        b.idx = len(self.bonds)
        self.bonds.append(b)
        return b.idx

    def RemoveBond(self, begin: int, end: int) -> None:
        for i, b in enumerate(self.bonds):
            if {b.begin, b.end} == {begin, end}:
                del self.bonds[i]
                for j, bb in enumerate(self.bonds):
                    bb.idx = j
                return

    # ---- accessors ----------------------------------------------------------

    def GetNumAtoms(self) -> int:
        return len(self.atoms)

    def GetAtomWithIdx(self, idx: int) -> Atom:
        return self.atoms[idx]

    def GetAtoms(self) -> List[Atom]:
        return list(self.atoms)

    def GetBonds(self) -> List[Bond]:
        return list(self.bonds)

    def bond_between(self, i: int, j: int) -> Optional[Bond]:
        for b in self.bonds:
            if {b.begin, b.end} == {i, j}:
                return b
        return None

    def neighbors(self, idx: int) -> List[Tuple[int, int]]:
        """[(neighbor_idx, bond_order)] for atom idx."""
        out = []
        for b in self.bonds:
            if b.begin == idx:
                out.append((b.end, b.order))
            elif b.end == idx:
                out.append((b.begin, b.order))
        return out

    # ---- subsetting ---------------------------------------------------------

    def components(self) -> List[List[int]]:
        """Connected components as sorted atom-index lists."""
        seen = set()
        comps = []
        for start in range(len(self.atoms)):
            if start in seen:
                continue
            stack, comp = [start], []
            seen.add(start)
            while stack:
                i = stack.pop()
                comp.append(i)
                for j, _ in self.neighbors(i):
                    if j not in seen:
                        seen.add(j)
                        stack.append(j)
            comps.append(sorted(comp))
        return comps

    def submol(self, atom_indices: List[int]) -> "Mol":
        """Induced sub-molecule on the given atoms (preserving order)."""
        remap = {old: new for new, old in enumerate(atom_indices)}
        m = Mol()
        for old in atom_indices:
            a = self.atoms[old]
            m.AddAtom(Atom(a.symbol, a.charge))
        for b in self.bonds:
            if b.begin in remap and b.end in remap:
                m.AddBond(remap[b.begin], remap[b.end], b.order)
        return m


def check_valency(mol: Mol) -> Tuple[bool, Optional[List[int]]]:
    """RDKit ``SanitizeMol(SANITIZE_PROPERTIES)`` equivalent.

    Scans atoms in index order; the first atom whose explicit valence (sum
    of bond orders) exceeds the maximum permitted for its (element, charge)
    yields ``(False, [atom_idx, valence])`` — the same payload the reference
    regex-parses out of RDKit's AtomValenceException (mol_utils.py:230-252).
    """
    for atom in mol.atoms:
        v = atom.explicit_valence()
        if v > max(permitted_valences(atom.symbol, atom.charge)):
            return False, [atom.idx, v]
    return True, None
