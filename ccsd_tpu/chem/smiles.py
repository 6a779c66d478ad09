"""Canonical SMILES writer for the minimal molecular kernel.

Replaces the two RDKit services the CCSD pipeline uses SMILES for
(mol_utils.py:303-326, sampler.py:830-833): a canonical string per molecule
(uniqueness / novelty sets) and fragment splitting for the
largest-connected-component filter.

Canonicalization = Morgan-style iterative refinement of atom invariants
(element, charge, degree, bond-order sum, implicit-H count) with
deterministic tie-breaking, then a DFS emission whose branch order follows
the canonical ranks.  Atoms genuinely equivalent under the automorphism
group produce the same string for any tie-break choice; the pathological
refinement-failure cases (large regular graphs) do not occur at molecular
sizes.  Strings are canonical within THIS writer — not byte-identical to
RDKit's — which is exactly what uniqueness/novelty comparisons need as long
as both sides of the comparison run through the same writer.

The partition property (same molecule under any atom order / spelling ->
one string; different molecules -> different strings) is pinned in
tests/chem/test_canonical_partition.py via exact atom relabelings through
the round-3 parser (chem/parser.py) and a hand-verified golden table of
RDKit-canonical spellings.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ccsd_tpu.chem.mol import Atom, Mol

ORGANIC_SUBSET = {"B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"}
_BOND_SYM = {1: "", 2: "=", 3: "#", 4: "$"}


def _dense_rank(keys: List) -> List[int]:
    order = {k: r for r, k in enumerate(sorted(set(keys)))}
    return [order[k] for k in keys]


def canonical_ranks(mol: Mol) -> List[int]:
    """Morgan refinement + deterministic tie-break to discrete ranks."""
    n = mol.GetNumAtoms()
    if n == 0:
        return []
    inv = [
        (a.symbol, a.charge, len(mol.neighbors(i)), a.explicit_valence(),
         a.num_implicit_hs())
        for i, a in enumerate(mol.atoms)
    ]
    ranks = _dense_rank(inv)

    def refine(ranks: List[int]) -> List[int]:
        while True:
            keys = [
                (ranks[i],
                 tuple(sorted((o, ranks[j]) for j, o in mol.neighbors(i))))
                for i in range(n)
            ]
            new = _dense_rank(keys)
            if new == ranks:
                return ranks
            ranks = new

    ranks = refine(ranks)
    while len(set(ranks)) < n:
        # split the smallest non-discrete class at its lowest atom index
        by_rank = {}
        for i, r in enumerate(ranks):
            by_rank.setdefault(r, []).append(i)
        r, members = min(
            (r, m) for r, m in by_rank.items() if len(m) > 1
        )
        chosen = min(members)
        keys = [(ranks[i], 0 if i == chosen else 1) for i in range(n)]
        ranks = refine(_dense_rank(keys))
    return ranks


def _atom_token(atom: Atom) -> str:
    if atom.charge == 0 and atom.symbol in ORGANIC_SUBSET:
        return atom.symbol
    h = atom.num_implicit_hs()
    hpart = "" if h == 0 else ("H" if h == 1 else f"H{h}")
    if atom.charge == 0:
        cpart = ""
    elif atom.charge > 0:
        cpart = "+" if atom.charge == 1 else f"+{atom.charge}"
    else:
        cpart = "-" if atom.charge == -1 else f"-{-atom.charge}"
    return f"[{atom.symbol}{hpart}{cpart}]"


def _fragment_smiles(frag: Mol) -> str:
    """Canonical SMILES of one connected molecule."""
    n = frag.GetNumAtoms()
    if n == 0:
        return ""
    ranks = canonical_ranks(frag)
    root = min(range(n), key=lambda i: ranks[i])

    def nbrs(i: int):
        return sorted(frag.neighbors(i), key=lambda jo: (ranks[jo[0]], jo[0]))

    # pass 1: classify tree vs ring-closure bonds along the canonical DFS
    import sys

    visited = {root}
    tree_children = {i: [] for i in range(n)}  # i -> [(child, order)]
    ring_bonds: List[Tuple[int, int, int]] = []  # (a, b, order)
    seen_edges = set()

    def dfs(i: int) -> None:
        for j, o in nbrs(i):
            e = frozenset((i, j))
            if e in seen_edges:
                continue
            seen_edges.add(e)
            if j in visited:
                ring_bonds.append((i, j, o))
            else:
                visited.add(j)
                tree_children[i].append((j, o))
                dfs(j)

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 4 * n + 100))
    try:
        dfs(root)
    finally:
        sys.setrecursionlimit(old_limit)

    # ring-closure digit assignment per atom
    closures = {i: [] for i in range(n)}  # atom -> [(digit, order)]
    for d, (a, b, o) in enumerate(ring_bonds, start=1):
        closures[a].append((d, o))
        closures[b].append((d, o))

    def digit_token(d: int, o: int) -> str:
        sym = _BOND_SYM[o]
        return f"{sym}{d}" if d < 10 else f"{sym}%{d:02d}"

    def emit(i: int) -> str:
        out = [_atom_token(frag.atoms[i])]
        for d, o in closures[i]:
            out.append(digit_token(d, o))
        children = tree_children[i]
        for k, (j, o) in enumerate(children):
            sub = _BOND_SYM[o] + emit(j)
            if k < len(children) - 1:
                out.append(f"({sub})")
            else:
                out.append(sub)
        return "".join(out)

    sys.setrecursionlimit(max(old_limit, 4 * n + 100))
    try:
        return emit(root)
    finally:
        sys.setrecursionlimit(old_limit)


def to_smiles(mol: Optional[Mol]) -> Optional[str]:
    """Canonical SMILES; multi-fragment molecules join with '.' in sorted
    order (deterministic; RDKit uses its own fragment order)."""
    if mol is None:
        return None
    frags = [
        _fragment_smiles(mol.submol(comp)) for comp in mol.components()
    ]
    return ".".join(sorted(frags))


def largest_fragment(mol: Optional[Mol]) -> Optional[Mol]:
    """Largest connected component, by LONGEST fragment-SMILES string —
    the reference's exact tie semantics (mol_utils.py:303-326 sorts
    fragments by SMILES length, not atom count)."""
    if mol is None:
        return None
    comps = mol.components()
    if not comps:
        return mol
    scored = [
        (mol.submol(c), _fragment_smiles(mol.submol(c))) for c in comps
    ]
    scored.sort(key=lambda t: len(t[1]), reverse=True)
    return scored[0][0]
