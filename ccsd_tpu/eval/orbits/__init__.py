"""ctypes binding for the native graphlet-orbit counter.

Replaces the reference's ORCA subprocess contract (stats.py:343-379: write a
temp edge-list file, fork a process, parse stdout) with one in-process C call
per graph — no file I/O, no fork, no text parsing.

The shared library is compiled on demand with g++ -O2; a pure-Python ESU
fallback (used in tests as a cross-check) covers environments without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from itertools import combinations
from typing import Optional

import networkx as nx
import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graphlet_orbits.cpp")
_LIB_PATH = os.path.join(_HERE, "_graphlet_orbits.so")
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build_lib() -> Optional[ctypes.CDLL]:
    global _lib_failed
    _table = os.path.join(_HERE, "orbit5_table.inc")
    src_mtime = max(os.path.getmtime(_SRC), os.path.getmtime(_table))
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < src_mtime:
        try:
            with tempfile.NamedTemporaryFile(
                suffix=".so", dir=_HERE, delete=False
            ) as tmp:
                tmp_path = tmp.name
            subprocess.check_call(
                ["g++", "-O2", "-shared", "-fPIC", "-o", tmp_path, _SRC],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            os.replace(tmp_path, _LIB_PATH)
        except Exception:
            _lib_failed = True
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.count_orbits.argtypes = [
        ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.count_orbits.restype = None
    lib.count_orbits5.argtypes = lib.count_orbits.argtypes
    lib.count_orbits5.restype = None
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _lib_failed:
        _lib = _build_lib()
    return _lib


def orbit_counts(G: nx.Graph, graphlet_size: int = 4) -> np.ndarray:
    """Per-node graphlet-orbit counts, node order = G.nodes() order.

    graphlet_size=4 -> (n, 15) orbits 0-14 (the reference's "orca node 4"
    protocol, stats.py:343-379); graphlet_size=5 -> (n, 73) orbits 0-72
    (the "node 5" mode the reference's vendored ORCA supports but never
    invokes).
    """
    if graphlet_size not in (4, 5):
        raise ValueError("graphlet_size must be 4 or 5")
    nodes = list(G.nodes())
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    edges = [(idx[u], idx[v]) for u, v in G.edges() if u != v]
    m = len(edges)
    eu = np.array([e[0] for e in edges], np.int32)
    ev = np.array([e[1] for e in edges], np.int32)
    lib = _get_lib()
    if lib is not None:
        width = 73 if graphlet_size == 5 else 15
        out = np.zeros((n, width), np.int64)
        fn = lib.count_orbits5 if graphlet_size == 5 else lib.count_orbits
        fn(n, m, eu, ev, out.reshape(-1))
        return out
    if graphlet_size == 5:
        raise RuntimeError(
            "native graphlet_orbits library unavailable; the pure-Python "
            "fallback only implements graphlet_size=4"
        )
    return orbit_counts_py(n, edges)


# ------------------------------------------------- pure-Python reference ----

def orbit_counts_py(n: int, edges) -> np.ndarray:
    """Brute-force oracle: classify every connected induced <=4-subset."""
    adj = [set() for _ in range(n)]
    eset = set()
    for u, v in edges:
        if u == v:
            continue
        adj[u].add(v)
        adj[v].add(u)
        eset.add((min(u, v), max(u, v)))
    out = np.zeros((n, 15), np.int64)
    for v in range(n):
        out[v, 0] = len(adj[v])

    def internal(sub):
        return [(a, b) for a, b in combinations(sub, 2)
                if (min(a, b), max(a, b)) in eset]

    def is_connected(sub, es):
        seen = {sub[0]}
        frontier = [sub[0]]
        nbrs = {s: set() for s in sub}
        for a, b in es:
            nbrs[a].add(b)
            nbrs[b].add(a)
        while frontier:
            x = frontier.pop()
            for y in nbrs[x]:
                if y not in seen:
                    seen.add(y)
                    frontier.append(y)
        return len(seen) == len(sub)

    for sub in combinations(range(n), 3):
        es = internal(sub)
        if len(es) < 2 or not is_connected(sub, es):
            continue
        deg = {s: 0 for s in sub}
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        if len(es) == 2:
            for s in sub:
                out[s, 2 if deg[s] == 2 else 1] += 1
        else:
            for s in sub:
                out[s, 3] += 1

    for sub in combinations(range(n), 4):
        es = internal(sub)
        if len(es) < 3 or not is_connected(sub, es):
            continue
        deg = {s: 0 for s in sub}
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        ne = len(es)
        maxd = max(deg.values())
        for s in sub:
            if ne == 3:
                orbit = (5 if deg[s] == 2 else 4) if maxd == 2 else (
                    7 if deg[s] == 3 else 6)
            elif ne == 4:
                if maxd == 2:
                    orbit = 8
                else:
                    orbit = 9 if deg[s] == 1 else (11 if deg[s] == 3 else 10)
            elif ne == 5:
                orbit = 13 if deg[s] == 3 else 12
            else:
                orbit = 14
            out[s, orbit] += 1
    return out
