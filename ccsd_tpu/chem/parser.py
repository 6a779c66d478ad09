"""SMILES parser + kekulizer for the minimal molecular kernel.

Completes the chem kernel's RDKit-free coverage of the CCSD data pipeline
(parity target: ccsd/data/preprocess.py:25-86, which calls
Chem.MolFromSmiles + Chem.Kekulize): parse the organic/aromatic SMILES
subset that QM9/ZINC use into a `Mol` with integer (kekulized) bond orders.

Supported grammar:
  * organic-subset atoms  B C N O P S F Cl Br I  and their aromatic
    lowercase forms  b c n o p s;
  * bracket atoms ``[<isotope?><symbol><chiral?><H count?><charge?>]``
    (isotope and chirality are parsed and dropped — the kekulized arrays
    carry neither);
  * bonds ``- = # $ :`` plus directional ``/ \\`` (read as single);
  * branches ``( )``, ring closures ``1``-``9`` and ``%nn``, dots ``.``.

Kekulization: every aromatic atom is assigned a required in-ring double-
bond count in {0, 1} from its sigma-bond count, bracket H count and charge
(pyridine-type n needs 1, pyrrole-type [nH]/3-substituted n needs 0,
aromatic o/s need 0, aromatic c needs 1 unless it already has an exocyclic
double bond, bracket atoms generally: the smallest permitted valence >= the
sigma count decides).  A backtracking perfect matching over the aromatic
bonds then places the double bonds; failure to match = invalid aromatic
SMILES (same rejection RDKit's kekulizer produces).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from ccsd_tpu.chem.mol import Atom, Mol, permitted_valences

ORGANIC = {"B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"}
AROMATIC = {"b": "B", "c": "C", "n": "N", "o": "O", "p": "P", "s": "S"}
_BOND_ORDER = {"-": 1, "=": 2, "#": 3, "$": 4, "/": 1, "\\": 1}

_BRACKET_RE = re.compile(
    r"^(?P<isotope>\d+)?"
    r"(?P<symbol>[A-Z][a-z]?|[bcnops])"
    r"(?P<chiral>@{1,2}(?:TH\d|AL\d|SP\d|TB\d+|OH\d+)?)?"
    r"(?P<hcount>H\d*)?"
    r"(?P<charge>\+{1,}|-{1,}|\+\d+|-\d+)?"
    r"(?::(?P<map>\d+))?$"
)


class SmilesError(ValueError):
    pass


def _parse_bracket(body: str) -> Tuple[str, bool, Optional[int], int]:
    """-> (symbol, aromatic, explicit_H or None, charge)."""
    m = _BRACKET_RE.match(body)
    if m is None:
        raise SmilesError(f"bad bracket atom [{body}]")
    sym = m.group("symbol")
    aromatic = sym in AROMATIC
    if aromatic:
        sym = AROMATIC[sym]
    h = m.group("hcount")
    hcount = 0 if h is None else (1 if h == "H" else int(h[1:]))
    c = m.group("charge")
    if c is None:
        charge = 0
    elif c[0] == "+":
        charge = int(c[1:]) if c[1:].isdigit() else len(c)
    else:
        charge = -(int(c[1:]) if c[1:].isdigit() else len(c))
    return sym, aromatic, hcount, charge


def _required_doubles(
    mol: Mol,
    idx: int,
    aromatic_flags: List[bool],
    explicit_h: List[Optional[int]],
    arom_bond_idx: List[int],
) -> int:
    """In-ring double bonds this aromatic atom must receive (0 or 1)."""
    atom = mol.atoms[idx]
    # sigma valence: every bond counts its (current) order; aromatic bonds
    # are order 1 until kekulization; explicit exocyclic doubles count 2.
    sigma = sum(o for _, o in mol.neighbors(idx))
    has_exo_double = any(
        b.order >= 2 and b.idx not in arom_bond_idx
        for b in mol.atoms[idx].GetBonds()
    )
    if has_exo_double:
        return 0
    h = explicit_h[idx]
    if h is None:
        # organic-subset aromatic atom: deterministic by element + degree
        if atom.symbol in ("O", "S"):
            return 0
        if atom.symbol in ("N", "P"):
            return 1 if sigma == 2 else 0  # pyridine-type vs 3-substituted
        return 1  # aromatic C / B
    total = sigma + h
    fits = [v for v in permitted_valences(atom.symbol, atom.charge)
            if v >= total]
    if not fits:
        raise SmilesError(
            f"aromatic atom {atom.symbol}{atom.charge:+d} with sigma {total} "
            f"exceeds permitted valence"
        )
    return min(1, min(fits) - total)


def _kekulize(
    mol: Mol,
    aromatic_flags: List[bool],
    aromatic_bonds: List[int],
    explicit_h: List[Optional[int]],
) -> None:
    """Assign alternating double bonds over the aromatic system in place."""
    if not aromatic_bonds:
        return
    arom_bond_idx = set(aromatic_bonds)
    need = {}
    for i, flag in enumerate(aromatic_flags):
        if flag:
            need[i] = _required_doubles(
                mol, i, aromatic_flags, explicit_h, arom_bond_idx)
    # perfect matching over atoms with need==1 using aromatic bonds only
    needy = [i for i, n in need.items() if n == 1]
    adj: Dict[int, List[Tuple[int, int]]] = {i: [] for i in needy}
    for bidx in aromatic_bonds:
        b = mol.bonds[bidx]
        if need.get(b.begin) == 1 and need.get(b.end) == 1:
            adj[b.begin].append((b.end, bidx))
            adj[b.end].append((b.begin, bidx))

    matched: Dict[int, int] = {}  # atom -> bond idx
    chosen: List[int] = []

    def backtrack(order: List[int]) -> bool:
        free = [i for i in order if i not in matched]
        if not free:
            return True
        i = min(free, key=lambda a: len([1 for j, _ in adj[a]
                                         if j not in matched]))
        for j, bidx in adj[i]:
            if j in matched:
                continue
            matched[i] = bidx
            matched[j] = bidx
            chosen.append(bidx)
            if backtrack(order):
                return True
            chosen.pop()
            del matched[i], matched[j]
        return False

    if not backtrack(needy):
        raise SmilesError("kekulization failed (no alternating assignment)")
    for bidx in set(chosen):
        mol.bonds[bidx].order = 2


def from_smiles(s: str) -> Optional[Mol]:
    """Parse one SMILES string to a kekulized Mol; None on failure."""
    try:
        return _from_smiles_strict(s)
    except (SmilesError, IndexError, KeyError):
        return None


def _from_smiles_strict(s: str) -> Mol:
    mol = Mol()
    aromatic_flags: List[bool] = []
    explicit_h: List[Optional[int]] = []
    aromatic_bonds: List[int] = []

    prev: Optional[int] = None
    stack: List[Optional[int]] = []
    pending_bond: Optional[str] = None
    # ring closure: number -> (atom, bond symbol or None, atom_is_aromatic)
    rings: Dict[int, Tuple[int, Optional[str]]] = {}

    def add_atom(sym: str, aromatic: bool, h: Optional[int],
                 charge: int) -> int:
        nonlocal prev, pending_bond
        idx = mol.AddAtom(Atom(sym, charge))
        aromatic_flags.append(aromatic)
        explicit_h.append(h)
        if prev is not None:
            _bond(prev, idx, pending_bond, aromatic)
        pending_bond = None
        prev = idx
        return idx

    def _bond(a: int, b: int, sym: Optional[str], b_arom: bool) -> None:
        if sym is None:
            if aromatic_flags[a] and b_arom:
                bidx = mol.AddBond(a, b, 1)
                aromatic_bonds.append(bidx)
            else:
                mol.AddBond(a, b, 1)
        elif sym == ":":
            bidx = mol.AddBond(a, b, 1)
            aromatic_bonds.append(bidx)
        else:
            mol.AddBond(a, b, _BOND_ORDER[sym])

    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "[":
            j = s.index("]", i)
            sym, arom, h, charge = _parse_bracket(s[i + 1:j])
            if sym == "H":
                # explicit-hydrogen atom: fold into the previous atom
                # (kekulized heavy-atom arrays never store H atoms)
                if prev is not None and explicit_h[prev] is not None:
                    explicit_h[prev] += 1
                elif prev is not None:
                    explicit_h[prev] = 1
                pending_bond = None
            else:
                add_atom(sym, arom, h, charge)
            i = j + 1
        elif ch in "-=#$:/\\":
            pending_bond = ch
            i += 1
        elif ch == "(":
            stack.append(prev)
            i += 1
        elif ch == ")":
            prev = stack.pop()
            i += 1
        elif ch == ".":
            prev = None
            pending_bond = None
            i += 1
        elif ch.isdigit() or ch == "%":
            if ch == "%":
                num = int(s[i + 1:i + 3])
                i += 3
            else:
                num = int(ch)
                i += 1
            if prev is None:
                raise SmilesError("ring closure before any atom")
            if num in rings:
                a, sym0 = rings.pop(num)
                sym = pending_bond or sym0
                _bond(a, prev, sym, aromatic_flags[prev])
                pending_bond = None
            else:
                rings[num] = (prev, pending_bond)
                pending_bond = None
        elif ch.isupper():
            two = s[i:i + 2]
            if two in ("Cl", "Br"):
                add_atom(two, False, None, 0)
                i += 2
            elif ch in ORGANIC:
                add_atom(ch, False, None, 0)
                i += 1
            else:
                raise SmilesError(f"unknown atom {ch!r} at {i}")
        elif ch in AROMATIC:
            add_atom(AROMATIC[ch], True, None, 0)
            i += 1
        elif ch == "@":
            i += 1  # stray chirality marker outside brackets
        else:
            raise SmilesError(f"unexpected character {ch!r} at {i}")

    if rings:
        raise SmilesError(f"unclosed ring bond(s): {sorted(rings)}")
    _kekulize(mol, aromatic_flags, aromatic_bonds, explicit_h)
    return mol
