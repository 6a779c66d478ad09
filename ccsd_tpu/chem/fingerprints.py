"""Molecular fingerprints for the SNN / Frag / Scaf metrics (MOSES family).

The reference gets these from MOSES (sampler.py:850-857), which computes
them on RDKit Morgan fingerprints, BRICS fragments and Bemis-Murcko
scaffolds.  This module implements the same objects natively on the chem
kernel so the metrics run in RDKit-free environments:

  * ``morgan_fingerprint`` — ECFP-style circular fingerprint: initial atom
    invariants (element, charge, degree, valence, implicit H, in-ring),
    iterated neighbor hashing with bond orders, every radius-0..r
    environment hashed into ``n_bits`` (deterministic 64-bit FNV-1a — NOT
    RDKit's hash, so absolute bit patterns differ from RDKit while the
    similarity STRUCTURE is the same; fine for SNN whose both sides use
    this function).
  * ``bemis_murcko_scaffold`` — ring systems + linker atoms between them,
    plus atoms multiply-bonded to that framework; identity = canonical
    SMILES of the induced sub-molecule ("" for acyclic molecules).
  * ``fragment_counts`` — BRICS-lite decomposition: cut every acyclic
    single bond that (a) joins a ring atom to a non-ring atom, or (b)
    separates a carbonyl/imine carbon from a hetero neighbor (ester/amide
    style cleavage).  A documented simplification of the 16-rule BRICS
    table; fragment identity = canonical SMILES.

All functions accept chem.Mol (and anything exposing the same RDKit-like
accessors).
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Sequence, Set

import networkx as nx
import numpy as np

from ccsd_tpu.chem.mol import Mol
from ccsd_tpu.chem.smiles import to_smiles

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def _fnv(ints: Sequence[int]) -> int:
    h = _FNV_OFFSET
    for v in ints:
        for b in (int(v) & _MASK64).to_bytes(8, "little"):
            h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def _ring_atoms(mol) -> Set[int]:
    G = nx.Graph()
    G.add_nodes_from(a.GetIdx() for a in mol.GetAtoms())
    G.add_edges_from(
        (b.GetBeginAtomIdx(), b.GetEndAtomIdx()) for b in mol.GetBonds())
    out: Set[int] = set()
    for cyc in nx.cycle_basis(G):
        out.update(cyc)
    return out


def morgan_fingerprint(mol, radius: int = 2, n_bits: int = 2048
                       ) -> np.ndarray:
    """ECFP bit vector (bool array of length n_bits)."""
    n = mol.GetNumAtoms()
    bits = np.zeros(n_bits, dtype=bool)
    if n == 0:
        return bits
    rings = _ring_atoms(mol)
    neighbors: List[List] = [[] for _ in range(n)]
    for b in mol.GetBonds():
        i, j = b.GetBeginAtomIdx(), b.GetEndAtomIdx()
        o = int(b.GetBondTypeAsDouble())
        neighbors[i].append((j, o))
        neighbors[j].append((i, o))
    inv = []
    for a in mol.GetAtoms():
        i = a.GetIdx()
        inv.append(_fnv((
            a.GetAtomicNum(), a.GetFormalCharge(), len(neighbors[i]),
            sum(o for _, o in neighbors[i]),
            getattr(a, "num_implicit_hs", lambda: 0)(),
            int(i in rings),
        )))
    for h in inv:
        bits[h % n_bits] = True
    for _ in range(radius):
        new = []
        for i in range(n):
            env = sorted((o, inv[j]) for j, o in neighbors[i])
            h = _fnv([inv[i]] + [x for pair in env for x in pair])
            new.append(h)
            bits[h % n_bits] = True
        inv = new
    return bits


def tanimoto_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Tanimoto of two stacked bool fingerprint matrices
    (n, bits) x (m, bits) -> (n, m), via two matmuls."""
    a_f = a.astype(np.float32)
    b_f = b.astype(np.float32)
    inter = a_f @ b_f.T
    pop_a = a_f.sum(1, keepdims=True)
    pop_b = b_f.sum(1, keepdims=True)
    union = pop_a + pop_b.T - inter
    # MOSES maps 0/0 similarities (both fingerprints empty) to 1, not 0
    # (fixes/utils.py jac[np.isnan(jac)] = 1); match that convention.
    return np.where(union > 0, inter / np.maximum(union, 1e-9), 1.0)


def internal_diversity(gen_mols, p: int = 1, radius: int = 2,
                       n_bits: int = 2048, block: int = 2048) -> float:
    """MOSES IntDiv (p=1) / IntDiv2 (p=2):
    ``1 - mean_i (mean_j T(m_i, m_j)^p)^(1/p)``, self-pairs included —
    exactly MOSES's average_agg_tanimoto(agg='mean') convention (the 1/p
    root is taken PER MOLECULE before the outer mean, fixes/utils.py
    average_agg_tanimoto; reference emits these via get_all_metrics,
    sampler.py:850-857)."""
    if not gen_mols:
        return 0.0
    fps = np.stack([morgan_fingerprint(m, radius, n_bits) for m in gen_mols])
    n = len(fps)
    row_means = np.zeros(n, dtype=np.float64)
    for s in range(0, n, block):
        sim = tanimoto_matrix(fps[s:s + block], fps)
        row_means[s:s + block] = (sim.astype(np.float64) ** p).mean(axis=1)
    return float(1.0 - (row_means ** (1.0 / p)).mean())


def snn_similarity(gen_mols, ref_mols, radius: int = 2,
                   n_bits: int = 2048, block: int = 2048) -> float:
    """MOSES SNN: mean over generated molecules of the max Tanimoto
    similarity to any reference molecule."""
    if not gen_mols or not ref_mols:
        return 0.0
    gen = np.stack([morgan_fingerprint(m, radius, n_bits) for m in gen_mols])
    ref = np.stack([morgan_fingerprint(m, radius, n_bits) for m in ref_mols])
    best = np.zeros(len(gen), dtype=np.float32)
    for s in range(0, len(ref), block):
        sim = tanimoto_matrix(gen, ref[s:s + block])
        best = np.maximum(best, sim.max(1))
    return float(best.mean())


# ------------------------------------------------------------- scaffolds --

def bemis_murcko_scaffold(mol) -> str:
    """Canonical SMILES of the Murcko framework ('' if acyclic)."""
    rings = _ring_atoms(mol)
    if not rings:
        return ""
    G = nx.Graph()
    G.add_nodes_from(a.GetIdx() for a in mol.GetAtoms())
    border = {}
    for b in mol.GetBonds():
        i, j = b.GetBeginAtomIdx(), b.GetEndAtomIdx()
        G.add_edge(i, j)
        border[frozenset((i, j))] = int(b.GetBondTypeAsDouble())
    # framework = ring atoms + atoms on shortest paths between ring systems
    keep: Set[int] = set(rings)
    ring_comps = [c & rings for c in nx.connected_components(G.subgraph(rings))]
    comps = [next(iter(c)) for c in ring_comps]
    for a in range(len(comps)):
        for bidx in range(a + 1, len(comps)):
            try:
                path = nx.shortest_path(G, comps[a], comps[bidx])
            except nx.NetworkXNoPath:
                continue
            keep.update(path)
    # atoms multiply-bonded to the framework ride along (e.g. exocyclic =O)
    for e, order in border.items():
        if order >= 2:
            i, j = tuple(e)
            if i in keep or j in keep:
                keep.update((i, j))
    sub = _induced_submol(mol, sorted(keep))
    return to_smiles(sub) or ""


def _induced_submol(mol, atom_indices: List[int]) -> Mol:
    if isinstance(mol, Mol):
        return mol.submol(atom_indices)
    # RDKit path (used only when RDKit mols are passed in)
    from ccsd_tpu.chem.mol import Atom

    remap = {old: new for new, old in enumerate(atom_indices)}
    m = Mol()
    for old in atom_indices:
        a = mol.GetAtomWithIdx(old)
        m.AddAtom(Atom(a.GetSymbol(), a.GetFormalCharge()))
    for b in mol.GetBonds():
        i, j = b.GetBeginAtomIdx(), b.GetEndAtomIdx()
        if i in remap and j in remap:
            m.AddBond(remap[i], remap[j], int(b.GetBondTypeAsDouble()))
    return m


# ------------------------------------------------------------- fragments --

def fragment_counts(mol) -> Dict[str, int]:
    """BRICS-lite fragments of one molecule, as {canonical smiles: count}."""
    rings = _ring_atoms(mol)
    ring_bonds: Set[FrozenSet[int]] = set()
    G = nx.Graph()
    G.add_nodes_from(a.GetIdx() for a in mol.GetAtoms())
    for b in mol.GetBonds():
        G.add_edge(b.GetBeginAtomIdx(), b.GetEndAtomIdx())
    for cyc in nx.cycle_basis(G):
        for k in range(len(cyc)):
            ring_bonds.add(frozenset((cyc[k], cyc[(k + 1) % len(cyc)])))

    orders = {}
    nbr_orders: Dict[int, List[int]] = {}
    for b in mol.GetBonds():
        i, j = b.GetBeginAtomIdx(), b.GetEndAtomIdx()
        o = int(b.GetBondTypeAsDouble())
        orders[frozenset((i, j))] = o
        nbr_orders.setdefault(i, []).append(o)
        nbr_orders.setdefault(j, []).append(o)

    def is_carbonyl_like(idx: int) -> bool:
        a = mol.GetAtomWithIdx(idx)
        return a.GetSymbol() == "C" and any(
            o >= 2 for o in nbr_orders.get(idx, []))

    cuts = []
    for e, o in orders.items():
        if o != 1 or e in ring_bonds:
            continue
        i, j = tuple(e)
        si = mol.GetAtomWithIdx(i).GetSymbol()
        sj = mol.GetAtomWithIdx(j).GetSymbol()
        if (i in rings) != (j in rings):
            cuts.append(e)  # ring <-> side chain
        elif (is_carbonyl_like(i) and sj in ("N", "O", "S")) or (
                is_carbonyl_like(j) and si in ("N", "O", "S")):
            cuts.append(e)  # ester / amide style cleavage
    H = G.copy()
    for e in cuts:
        H.remove_edge(*tuple(e))
    counts: Dict[str, int] = {}
    for comp in nx.connected_components(H):
        smi = to_smiles(_induced_submol(mol, sorted(comp)))
        if smi:
            counts[smi] = counts.get(smi, 0) + 1
    return counts


def _count_vector_cosine(gen_counts: Dict[str, float],
                         ref_counts: Dict[str, float]) -> float:
    keys = set(gen_counts) | set(ref_counts)
    if not keys:
        return 0.0
    g = np.array([gen_counts.get(k, 0.0) for k in keys], dtype=np.float64)
    r = np.array([ref_counts.get(k, 0.0) for k in keys], dtype=np.float64)
    den = np.linalg.norm(g) * np.linalg.norm(r)
    return float(g @ r / den) if den > 0 else 0.0


def _aggregate(mols, fn) -> Dict[str, float]:
    total: Dict[str, float] = {}
    for m in mols:
        for k, v in fn(m).items():
            total[k] = total.get(k, 0.0) + v
    return total


def frag_similarity(gen_mols, ref_mols) -> float:
    """Cosine similarity of aggregate fragment count vectors (MOSES Frag)."""
    return _count_vector_cosine(
        _aggregate(gen_mols, fragment_counts),
        _aggregate(ref_mols, fragment_counts),
    )


def scaf_similarity(gen_mols, ref_mols) -> float:
    """Cosine similarity of scaffold count vectors (MOSES Scaf)."""
    def scaff_count(m):
        return {bemis_murcko_scaffold(m): 1}

    return _count_vector_cosine(
        _aggregate(gen_mols, scaff_count),
        _aggregate(ref_mols, scaff_count),
    )
