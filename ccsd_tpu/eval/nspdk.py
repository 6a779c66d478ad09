"""NSPDK graph vectorizer (Neighborhood Subgraph Pairwise Distance Kernel).

Clean-room implementation of the kernel of Costa & De Grave (2010), filling
the role of the vendored EDeN vectorizer the reference uses
(ccsd/src/evaluation/eden.py, called from mmd.py:309-349 with
complexity=4, discrete=True).

For every pair of vertices (u, v) at shortest-path distance d <= D, and
every radius r <= R, the feature is
    hash( canonical(N_r(u)), canonical(N_r(v)), d )
where N_r(x) is the subgraph induced by vertices within distance r of x and
`canonical` is a fast invariant: vertices are relabeled by
(distance-from-root, node label) and the subgraph is encoded as the sorted
multiset of edge triples.  Counts are L2-normalized per (r, d) block and
then globally, yielding a sparse CSR matrix whose linear kernel is the
NSPDK similarity.

This is the same construction as EDeN up to the concrete hash; since both
the reference and generated sets are vectorized identically, the MMD
protocol is preserved.
"""

from __future__ import annotations

import hashlib
from collections import deque
from typing import Dict, List

import networkx as nx
import numpy as np
from scipy import sparse

_FEATURE_SPACE = 1 << 20


def _hash(*parts) -> int:
    h = hashlib.blake2b(repr(parts).encode(), digest_size=8).digest()
    return int.from_bytes(h, "little") % _FEATURE_SPACE


def _bfs_dists(adj: Dict[int, List[int]], root: int, max_d: int) -> Dict[int, int]:
    dist = {root: 0}
    q = deque([root])
    while q:
        u = q.popleft()
        if dist[u] >= max_d:
            continue
        for w in adj[u]:
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


def _node_label(G: nx.Graph, n) -> str:
    d = G.nodes[n]
    return str(d.get("label", d.get("symbol", G.degree[n])))


def _edge_label(G: nx.Graph, u, v) -> str:
    return str(G.edges[u, v].get("label", 1))


def _neighborhood_code(
    G: nx.Graph,
    adj: Dict[int, List[int]],
    root: int,
    radius: int,
    dist_cache: Dict[int, Dict[int, int]],
) -> int:
    """Invariant code of the radius-r rooted neighborhood subgraph."""
    dist = dist_cache[root]
    members = [n for n, d in dist.items() if d <= radius]
    if len(members) == 1:
        return _hash("v", _node_label(G, root))
    member_set = set(members)
    vlab = {n: (dist[n], _node_label(G, n)) for n in members}
    triples = []
    for u in members:
        for w in adj[u]:
            if w in member_set and u < w:
                a, b = sorted((vlab[u], vlab[w]))
                triples.append((a, b, _edge_label(G, u, w)))
    triples.sort()
    return _hash("g", tuple(triples))


def vectorize(
    graphs: List[nx.Graph],
    complexity: int = 4,
    discrete: bool = True,
) -> sparse.csr_matrix:
    """Graph list -> sparse NSPDK feature matrix (rows L2-normalized)."""
    del discrete
    R = D = complexity
    rows, cols, vals = [], [], []
    indptr = [0]
    for G in graphs:
        feat: Dict[int, float] = {}
        block: Dict[tuple, Dict[int, float]] = {}
        nodes = list(G.nodes())
        adj = {n: list(G.neighbors(n)) for n in nodes}
        dist_cache = {n: _bfs_dists(adj, n, max(R, D)) for n in nodes}
        codes = {
            (n, r): _neighborhood_code(G, adj, n, r, dist_cache)
            for n in nodes
            for r in range(R + 1)
        }
        for u in nodes:
            for v, d in dist_cache[u].items():
                if d > D or v < u:
                    continue
                for r in range(R + 1):
                    cu, cv = codes[(u, r)], codes[(v, r)]
                    if cu > cv:
                        cu, cv = cv, cu
                    idx = _hash("f", cu, cv, d, r)
                    block.setdefault((r, d), {})
                    block[(r, d)][idx] = block[(r, d)].get(idx, 0.0) + 1.0
        # per-(r, d) block L2 normalization, then global L2
        for _, bd in block.items():
            norm = np.sqrt(sum(x * x for x in bd.values())) or 1.0
            for idx, x in bd.items():
                feat[idx] = feat.get(idx, 0.0) + x / norm
        gnorm = np.sqrt(sum(x * x for x in feat.values())) or 1.0
        for idx in sorted(feat):
            rows.append(idx)
            vals.append(feat[idx] / gnorm)
        indptr.append(len(rows))
    mat = sparse.csr_matrix(
        (vals, rows, indptr), shape=(len(graphs), _FEATURE_SPACE)
    )
    return mat
