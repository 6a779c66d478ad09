"""Static combinatorial-complex index structures.

The reference (ccsd/src/utils/cc_utils.py:44-96 `get_cells`) builds Python
dictionaries mapping cells/edges to incidence-matrix rows/columns and then
*iterates over them in Python* inside the masking functions
(cc_utils.py:527-557, 1591-1612).  That pattern cannot be jit-compiled.

Here we precompute, once per (N, d_min, d_max), small static integer/boolean
arrays on the host.  All flag-masking then becomes pure gathers + one matmul
against the static cell-membership matrix, which XLA maps onto the MXU/VPU.

Conventions (identical to the reference):
  * edges are the C(N,2) 2-subsets of [0..N) in `itertools.combinations`
    (lexicographic) order -> row index of the rank-2 incidence matrix,
  * rank-2 cells are all k-subsets for k in [d_min, d_max], enumerated for
    increasing k and lexicographically within k -> column index.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from itertools import combinations
from math import comb

import numpy as np


@functools.lru_cache(maxsize=32)
def rank2_dim(N: int, d_min: int, d_max: int) -> tuple[int, int]:
    """(rows, cols) of the rank-2 incidence matrix.

    Parity: ccsd/src/utils/cc_utils.py:268-283 (`get_rank2_dim`).
    """
    rows = (N * (N - 1)) // 2
    cols = sum(comb(N, k) for k in range(d_min, d_max + 1))
    return rows, cols


@functools.lru_cache(maxsize=8)
def edge_index(N: int) -> np.ndarray:
    """(E, 2) int32 array of edge endpoints in lexicographic order."""
    return np.array(list(combinations(range(N), 2)), dtype=np.int32).reshape(-1, 2)


@dataclass(frozen=True)
class ComplexSpec:
    """Static index structure for a rank-2 combinatorial complex family.

    Attributes:
      N, d_min, d_max: the (max nodes, min cell size, max cell size) family.
      custom_cells: optional explicit cell universe (tuple of sorted node
        tuples).  When given, the incidence columns are exactly these cells
        in this order ("active-cell" representation) instead of the full
        k-subset enumeration — this is what makes large-K configs (e.g.
        ego_small_CC's K=12444, or ZINC-scale) tractable: K shrinks to the
        number of cells that can actually occur.  The reference has no
        counterpart (its K explodes combinatorially, SURVEY.md §2.6).
      num_edges: E = C(N, 2).
      num_cells: K (full enumeration) or len(custom_cells).
      edge_u / edge_v: (E,) endpoints of each edge row.
      cell_mask: (K, N) float32 0/1 membership matrix (cell c contains node n).
      cell_sizes: (K,) int32 cell cardinalities.
      edge_in_cell: (E, K) float32 0/1 "edge row e lies inside cell column c"
        (both endpoints members).  Used by the incidence builder.
    """

    N: int
    d_min: int
    d_max: int
    custom_cells: tuple = None
    num_edges: int = field(init=False)
    num_cells: int = field(init=False)

    def __post_init__(self):
        E, K = rank2_dim(self.N, self.d_min, self.d_max)
        if self.custom_cells is not None:
            K = len(self.custom_cells)
        object.__setattr__(self, "num_edges", E)
        object.__setattr__(self, "num_cells", K)

    # ---- cached heavy arrays (host numpy; shipped to device on demand) ----

    @functools.cached_property
    def edge_uv(self) -> np.ndarray:
        return edge_index(self.N)

    @property
    def edge_u(self) -> np.ndarray:
        return self.edge_uv[:, 0]

    @property
    def edge_v(self) -> np.ndarray:
        return self.edge_uv[:, 1]

    @functools.cached_property
    def cells(self) -> list[tuple[int, ...]]:
        """All rank-2 cells in column order (reference enumeration, or the
        custom universe)."""
        if self.custom_cells is not None:
            return [tuple(sorted(c)) for c in self.custom_cells]
        out: list[tuple[int, ...]] = []
        for k in range(self.d_min, self.d_max + 1):
            out.extend(combinations(range(self.N), k))
        return out

    @functools.cached_property
    def cell_col(self) -> dict[frozenset, int]:
        return {frozenset(c): j for j, c in enumerate(self.cells)}

    @functools.cached_property
    def edge_row(self) -> dict[frozenset, int]:
        return {
            frozenset((int(u), int(v))): i
            for i, (u, v) in enumerate(self.edge_uv)
        }

    @functools.cached_property
    def cell_mask(self) -> np.ndarray:
        M = np.zeros((self.num_cells, self.N), dtype=np.float32)
        for j, c in enumerate(self.cells):
            M[j, list(c)] = 1.0
        return M

    @functools.cached_property
    def cell_sizes(self) -> np.ndarray:
        return self.cell_mask.sum(axis=1).astype(np.int32)

    @functools.cached_property
    def edge_in_cell(self) -> np.ndarray:
        # (E, K): edge (u, v) is inside cell c iff both u and v are members.
        M = self.cell_mask  # (K, N)
        return (M[:, self.edge_u] * M[:, self.edge_v]).T.copy()  # (E, K)


@functools.lru_cache(maxsize=16)
def get_spec(N: int, d_min: int, d_max: int, cells: tuple = None) -> ComplexSpec:
    """Spec for the full k-subset enumeration, or (with `cells`, a hashable
    tuple of node tuples) an explicit active-cell universe."""
    return ComplexSpec(N, d_min, d_max, custom_cells=cells)


def observed_cell_universe(ccs) -> tuple:
    """Union of rank-2 cells observed in a CC dataset, as a canonical,
    deterministically-ordered tuple of node tuples (sorted by size then
    lexicographically) — the active-cell universe for training on datasets
    whose full K would be intractable."""
    seen = set()
    for cc in ccs:
        for cell in cc.cells.hyperedge_dict.get(2, {}):
            seen.add(tuple(sorted(cell)))
    return tuple(sorted(seen, key=lambda c: (len(c), c)))


def n_nodes_from_edges(nb_edges: int) -> int:
    """Invert E = N(N-1)/2.  Parity: cc_utils.py:493-504."""
    return int((1 + np.sqrt(1 + 8 * nb_edges)) / 2)
