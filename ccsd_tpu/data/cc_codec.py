"""Host-side codecs between CombinatorialComplex objects and dense tensors.

Parity targets (numpy semantics, exact):
  * create_incidence_1_2      — cc_utils.py:99-153
  * cc_from_incidence         — cc_utils.py:156-265
  * CC_to_incidence_matrices  — cc_utils.py:380-457
  * pad_adjs / pad_rank2      — graph_utils.py:295-321, cc_utils.py:618-657
  * ccs_to_tensors / cc_to_tensor — cc_utils.py:686-785
  * convert_CC_to_graphs / convert_graphs_to_CCs — cc_utils.py:788-880
  * get_global_cc_properties  — cc_utils.py:660-683

These run on the host as dataset preprocessing (they are not jit'd); the
device-side representation is the padded dense (X, A, F) batch.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import networkx as nx
import numpy as np

from ccsd_tpu.data.complex import CombinatorialComplex
from ccsd_tpu.ops.cells import get_spec

# atom-index convention shared with the reference (cc_utils.py:31-41)
DIC_MOL_CONV = {0: "C", 1: "N", 2: "O", 3: "F", 4: "P", 5: "S", 6: "Cl",
                7: "Br", 8: "I"}
AN_TO_SYMBOL = {6: "C", 7: "N", 8: "O", 9: "F", 15: "P", 16: "S", 17: "Cl",
                35: "Br", 53: "I"}
SYMBOL_TO_AN = {v: k for k, v in AN_TO_SYMBOL.items()}


def create_incidence_1_2(
    N: int,
    A: np.ndarray,
    d_min: int,
    d_max: int,
    two_rank_cells: Dict[frozenset, Dict[str, Any]],
    spec=None,
) -> np.ndarray:
    """Rank-1→rank-2 incidence matrix from A and the rank-2 cell dict.

    With an explicit `spec` (e.g. an active-cell universe) columns follow
    spec.cells; otherwise the full reference enumeration for (N, d_min, d_max).
    """
    if spec is None:
        spec = get_spec(N, d_min, d_max)
    A = np.asarray(A)
    if not two_rank_cells:
        f = 1
        attributes_names: List[str] = []
    else:
        first = two_rank_cells[next(iter(two_rank_cells))]
        attributes_names = [k for k in first.keys() if k != "weight"]
        f = max(1, len(attributes_names))
    F = np.zeros((spec.num_edges, spec.num_cells, f), dtype=np.float32)
    for c, attrs in two_rank_cells.items():
        if frozenset(c) not in spec.cell_col:
            # cells outside the configured universe are dropped (the
            # reference raises a KeyError here, cc_utils.py:135)
            continue
        j = spec.cell_col[frozenset(c)]
        combi = tuple(c)
        for k in range(len(combi) - 1):
            for l in range(k + 1, len(combi)):
                if A[combi[k], combi[l]].any() or A[combi[l], combi[k]].any():
                    i = spec.edge_row[frozenset((combi[k], combi[l]))]
                    if not attributes_names:
                        F[i, j, 0] = 1.0
                    else:
                        for attr_id, attr in enumerate(attributes_names):
                            F[i, j, attr_id] = attrs[attr]
    if F.shape[-1] == 1:
        F = F[..., 0]
    return F


def CC_to_incidence_matrices(
    CC: CombinatorialComplex,
    d_min: Optional[int],
    d_max: Optional[int],
    N: Optional[int] = None,
    spec=None,
) -> List[np.ndarray]:
    """CC -> [X, A, F] dense matrices."""
    if not CC.cells.hyperedge_dict:
        return [np.array([]), np.array([]), np.array([])]

    nodes = CC.cells.hyperedge_dict[0]
    if N is None:
        N = len(nodes)
    first = nodes[next(iter(nodes))] if nodes else {}
    attributes_names = [k for k in first.keys() if k != "weight"]
    f = max(1, len(attributes_names))
    X = np.zeros((N, f), dtype=np.float32)
    for k in nodes:
        node = tuple(k)[0]
        if not attributes_names:
            X[node, 0] = 1
        else:
            for attr_id, attr in enumerate(attributes_names):
                X[node, attr_id] = nodes[k][attr]

    if 1 not in CC.cells.hyperedge_dict:
        return [X, np.array([]), np.array([])]
    edges = CC.cells.hyperedge_dict[1]
    first = edges[next(iter(edges))] if edges else {}
    attributes_names = [k for k in first.keys() if k != "weight"]
    f = max(1, len(attributes_names))
    A = np.zeros((N, N, f), dtype=np.float32)
    for k in edges:
        u, v = tuple(k)
        if not attributes_names:
            A[u, v, 0] = A[v, u, 0] = 1.0
        else:
            for attr_id, attr in enumerate(attributes_names):
                A[u, v, attr_id] = A[v, u, attr_id] = edges[k][attr]
    if A.shape[-1] == 1:
        A = A[..., 0]

    if 2 not in CC.cells.hyperedge_dict:
        return [X, A, np.array([])]
    rank2 = CC.cells.hyperedge_dict[2]
    d_min = min(len(c) for c in rank2) if d_min is None else d_min
    d_max = min(len(c) for c in rank2) if d_max is None else d_max
    F = create_incidence_1_2(N, A, d_min, d_max, rank2, spec=spec)
    return [X, A, F]


def cc_from_incidence(
    incidence_matrices: Optional[List[Optional[np.ndarray]]],
    d_min: int,
    d_max: int,
    is_molecule: bool = False,
    spec=None,
) -> CombinatorialComplex:
    """[X, A, F] -> CombinatorialComplex, molecule-aware attributes."""
    CC = CombinatorialComplex()
    if (
        incidence_matrices is None
        or len(incidence_matrices) == 0
        or all(m is None for m in incidence_matrices)
    ):
        return CC
    mats = []
    for m in incidence_matrices:
        if m is None:
            break
        mats.append(np.asarray(m))

    X = mats[0]
    N = X.shape[0]
    for i in range(N):
        if X[i, :].any():
            if not is_molecule:
                attr = {f"label_{j}": float(X[i, j]) for j in range(X.shape[1])}
            else:
                attr = {"symbol": SYMBOL_TO_AN[DIC_MOL_CONV[int(np.argmax(X[i]))]]}
            CC.add_cell((i,), rank=0, **attr)
    if len(mats) == 1:
        return CC

    A = mats[1]
    many = A.ndim > 2
    for i in range(N):
        for j in range(i + 1, N):
            if np.any(A[i, j]):
                if not is_molecule:
                    if not many:
                        attr = {"label": float(A[i, j])}
                    else:
                        attr = {
                            f"label_{k}": float(A[i, j, k])
                            for k in range(A.shape[2])
                        }
                else:
                    if not many:
                        attr = {"bond_type": float(A[i, j])}
                    else:
                        attr = {"bond_type": int(np.argmax(A[i, j]))}
                CC.add_cell((i, j), rank=1, **attr)
    if len(mats) == 2:
        return CC

    F = mats[2]
    many = F.ndim > 2
    if spec is None:
        spec = get_spec(N, d_min, d_max)
    for i, combi in enumerate(spec.cells):
        col = F[:, i]
        if np.any(col):
            label_index = int(np.argmax(np.abs(col)))
            if not many:
                attr = {"label": float(F[label_index, i])}
            else:
                label_index = label_index // F.shape[2]
                attr = {
                    f"label_{k}": float(F[label_index, i, k])
                    for k in range(F.shape[2])
                }
            CC.add_cell(frozenset(combi), 2, **attr)
    if len(mats) == 3:
        return CC
    raise NotImplementedError("Combinatorial Complexes of dimension > 2 not implemented")


def pad_adjs(ori_adj: np.ndarray, node_number: int) -> np.ndarray:
    """Zero-pad an adjacency matrix to node_number."""
    a = np.asarray(ori_adj)
    if not a.size:
        return np.zeros((node_number, node_number), dtype=np.float32)
    ori_len = a.shape[-1]
    if ori_len == node_number:
        return a
    if ori_len > node_number:
        raise ValueError(
            f"Original number of nodes {ori_len} is greater (>) than the "
            f"desired number of nodes after padding {node_number}"
        )
    out = np.zeros((node_number, node_number), dtype=a.dtype)
    out[:ori_len, :ori_len] = a
    return out


def pad_rank2(
    ori_rank2: np.ndarray, node_number: int, d_min: int, d_max: int
) -> np.ndarray:
    """Re-index a rank-2 incidence matrix from its native N to node_number.

    Unlike adjacency padding this is a scatter: edge rows and cell columns
    are renumbered through the two ComplexSpec index maps.
    """
    r = np.asarray(ori_rank2)
    big = get_spec(node_number, d_min, d_max)
    if not r.size:
        return np.zeros((big.num_edges, big.num_cells), dtype=np.float32)
    from ccsd_tpu.ops.cells import n_nodes_from_edges

    ori_len = n_nodes_from_edges(r.shape[-2] if r.ndim >= 2 else r.shape[0])
    if ori_len == node_number:
        return r
    if ori_len > node_number:
        raise ValueError(
            f"Original number of nodes {ori_len} is greater (>) than the "
            f"desired number of nodes after padding {node_number}"
        )
    small = get_spec(ori_len, d_min, d_max)
    # vectorized scatter via precomputed row/col renumbering
    row_map = np.array(
        [big.edge_row[frozenset((int(u), int(v)))] for u, v in small.edge_uv],
        dtype=np.int64,
    )
    col_map = np.array(
        [big.cell_col[frozenset(c)] for c in small.cells], dtype=np.int64
    )
    out = np.zeros((big.num_edges, big.num_cells), dtype=np.float32)
    out[np.ix_(row_map, col_map)] = r
    return out


def get_global_cc_properties(ccs: List[CombinatorialComplex]):
    """(max_node_num, d_min, d_max) over a CC list."""
    max_node_num = max(len(cc.cells.hyperedge_dict.get(0, [])) for cc in ccs)
    d_min = min(
        min(len(c) for c in cc.cells.hyperedge_dict.get(2, [])) for cc in ccs
    )
    d_max = max(
        max(len(c) for c in cc.cells.hyperedge_dict.get(2, [])) for cc in ccs
    )
    return max_node_num, d_min, d_max


def ccs_to_tensors(
    cc_list: List[CombinatorialComplex],
    max_node_num: Optional[int] = None,
    d_min: Optional[int] = None,
    d_max: Optional[int] = None,
    spec=None,
):
    """CC list -> (adjs (B,N,N), rank2 (B,E,K)) float32 numpy arrays.

    With an explicit `spec` (active-cell universe at max_node_num) the
    incidence is built directly at the padded node count, skipping the
    re-index scatter.
    """
    if max_node_num is None or d_min is None or d_max is None:
        max_node_num, d_min, d_max = get_global_cc_properties(cc_list)
    adjs, rank2s = [], []
    for cc in cc_list:
        if spec is not None:
            _, adj, rank2 = CC_to_incidence_matrices(
                cc, d_min, d_max, N=max_node_num, spec=spec
            )
            adjs.append(pad_adjs(adj, max_node_num))
            if not rank2.size:
                rank2 = np.zeros((spec.num_edges, spec.num_cells), np.float32)
            rank2s.append(rank2)
        else:
            _, adj, rank2 = CC_to_incidence_matrices(cc, d_min, d_max)
            adjs.append(pad_adjs(adj, max_node_num))
            rank2s.append(pad_rank2(rank2, max_node_num, d_min, d_max))
    return (
        np.asarray(adjs, dtype=np.float32),
        np.asarray(rank2s, dtype=np.float32),
    )


def cc_to_tensor(cc, max_node_num=None, d_min=None, d_max=None):
    adjs, rank2s = ccs_to_tensors([cc], max_node_num, d_min, d_max)
    return adjs[0], rank2s[0]


def graphs_to_tensor(graph_list: List[nx.Graph], max_node_num: int) -> np.ndarray:
    """nx graphs -> padded (B, N, N) float32 adjacency tensor."""
    adjs = []
    for g in graph_list:
        node_list = [v for v, _ in g.nodes.data("feature")]
        a = nx.to_numpy_array(g, nodelist=node_list)
        adjs.append(pad_adjs(a, max_node_num))
    return np.asarray(adjs, dtype=np.float32)


def convert_CC_to_graphs(
    ccs: List[CombinatorialComplex], undirected: bool = True
) -> List[nx.Graph]:
    """Project CCs to their 1-skeleton graphs."""
    graphs = []
    for cc in ccs:
        g = nx.Graph()
        for node in cc.cells.hyperedge_dict.get(0, {}):
            n = tuple(node)[0]
            g.add_node(n, **cc.cells.hyperedge_dict[0][node])
        for edge in cc.cells.hyperedge_dict.get(1, {}):
            u, v = tuple(edge)
            g.add_edge(u, v, **cc.cells.hyperedge_dict[1][edge])
        graphs.append(g)
    return graphs


def convert_graphs_to_CCs(
    graphs: List[nx.Graph],
    is_molecule: bool = False,
    lifting_procedure: Optional[str] = None,
    lifting_procedure_kwargs=None,
    **kwargs,
) -> List[CombinatorialComplex]:
    """Graphs -> CCs, optionally lifted to rank 2 (paths / cycles)."""
    from ccsd_tpu.data.lifts import cycles_lift_CC, path_based_lift_CC

    ccs = []
    for graph in graphs:
        # The dense incidence codec indexes X/A rows by node label, so
        # labels must be contiguous 0..n-1.  Generated graphs violate this
        # after isolated-node removal (e.g. a 1-node graph whose surviving
        # node is labeled 1), which crashed the lifted-CC eval path.
        if set(graph.nodes) != set(range(graph.number_of_nodes())):
            graph = nx.convert_node_labels_to_integers(
                graph, ordering="sorted"
            )
        CC = CombinatorialComplex()
        for node in graph.nodes:
            attr = dict(graph.nodes[node])
            if is_molecule and isinstance(attr.get("label"), str):
                attr["symbol"] = SYMBOL_TO_AN[attr.pop("label")]
            CC.add_cell((node,), rank=0, **attr)
        for edge in graph.edges:
            attr = dict(graph.edges[edge])
            if is_molecule and "label" in attr:
                attr["bond_type"] = float(attr.pop("label"))
            CC.add_cell(edge, rank=1, **attr)

        if lifting_procedure is not None:
            kw = lifting_procedure_kwargs
            if kw is None:
                kw = {}
            if lifting_procedure == "path_based":
                if isinstance(kw, str):
                    if kw == "basic":
                        max_nb_nodes = kwargs.get(
                            "max_nb_nodes",
                            max(g.number_of_nodes() for g in graphs),
                        )
                        kw = {
                            "sources_nodes": list(range(max_nb_nodes)),
                            "path_length": 3,
                        }
                    else:
                        raise NotImplementedError(
                            f"Lifting procedure kwargs {kw} not implemented"
                        )
                CC = path_based_lift_CC(CC, **kw)
            elif lifting_procedure == "cycles":
                if isinstance(kw, str):
                    raise NotImplementedError(
                        f"Lifting procedure kwargs {kw} not implemented"
                    )
                CC = cycles_lift_CC(CC, **kw)
            else:
                raise NotImplementedError(
                    f"Lifting procedure {lifting_procedure} not implemented"
                )
        ccs.append(CC)
    return ccs
