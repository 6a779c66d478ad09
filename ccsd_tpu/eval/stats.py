"""Graph MMD statistics: degree / clustering / spectral / orbit / NSPDK.

Parity target: ccsd/src/evaluation/stats.py:36-570.  Per-graph descriptor
extraction is embarrassingly parallel host work; we keep it serial-vectorized
(numpy) since the kernel matrices dominate, and the MMD layer is already
vectorized.  Orbit counts come from our native C++ graphlet counter
(ccsd_tpu/eval/orbits/) — same 15-orbit convention as the reference's ORCA.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import networkx as nx
import numpy as np

from ccsd_tpu.eval.mmd import compute_mmd, compute_nspdk_mmd, gaussian, gaussian_emd


def degree_worker(G: nx.Graph) -> np.ndarray:
    return np.array(nx.degree_histogram(G))


def degree_stats(
    graph_ref_list, graph_pred_list, kernel=gaussian_emd, **_,
) -> float:
    pred = [G for G in graph_pred_list if G.number_of_nodes() > 0]
    sample_ref = [degree_worker(G) for G in graph_ref_list]
    sample_pred = [degree_worker(G) for G in pred]
    return compute_mmd(sample_ref, sample_pred, kernel=kernel)


def spectral_worker(G: nx.Graph) -> np.ndarray:
    eigs = np.linalg.eigvalsh(nx.normalized_laplacian_matrix(G).todense())
    spectral_pmf, _ = np.histogram(eigs, bins=200, range=(-1e-5, 2), density=False)
    return spectral_pmf / spectral_pmf.sum()


def spectral_stats(
    graph_ref_list, graph_pred_list, kernel=gaussian_emd, **_,
) -> float:
    pred = [G for G in graph_pred_list if G.number_of_nodes() > 0]
    sample_ref = [spectral_worker(G) for G in graph_ref_list]
    sample_pred = [spectral_worker(G) for G in pred]
    return compute_mmd(sample_ref, sample_pred, kernel=kernel)


def clustering_worker(G: nx.Graph, bins: int = 100) -> np.ndarray:
    coeffs = list(nx.clustering(G).values())
    hist, _ = np.histogram(coeffs, bins=bins, range=(0.0, 1.0), density=False)
    return hist


def clustering_stats(
    graph_ref_list, graph_pred_list, kernel=gaussian_emd, bins: int = 100, **_,
) -> float:
    pred = [G for G in graph_pred_list if G.number_of_nodes() > 0]
    sample_ref = [clustering_worker(G, bins) for G in graph_ref_list]
    sample_pred = [clustering_worker(G, bins) for G in pred]
    try:
        return compute_mmd(
            sample_ref, sample_pred, kernel=kernel, sigma=1.0 / 10,
            distance_scaling=bins,
        )
    except TypeError:
        return compute_mmd(sample_ref, sample_pred, kernel=kernel, sigma=1.0 / 10)


def orbit_stats_all(
    graph_ref_list, graph_pred_list, kernel=gaussian, **_,
) -> float:
    """4-node graphlet-orbit MMD (per-node counts averaged per graph).

    Parity: stats.py:382-435; orbit counting by our native counter.
    """
    from ccsd_tpu.eval.orbits import orbit_counts

    def totals(graphs):
        out = []
        for G in graphs:
            if G.number_of_nodes() == 0:
                continue
            try:
                counts = orbit_counts(G)
            except Exception as e:  # mirror the reference's swallow (stats.py:417-422)
                print(f"orbit counting failed: {e}")
                continue
            out.append(counts.sum(axis=0) / G.number_of_nodes())
        return np.array(out)

    ref = totals(graph_ref_list)
    pred = totals(graph_pred_list)
    return compute_mmd(ref, pred, kernel=kernel, is_hist=False, sigma=30.0)


def nspdk_stats(graph_ref_list, graph_pred_list) -> float:
    pred = [G for G in graph_pred_list if G.number_of_nodes() > 0]
    return compute_nspdk_mmd(graph_ref_list, pred, metric="nspdk",
                             is_hist=False, n_jobs=None)


METHOD_NAME_TO_FUNC = {
    "degree": degree_stats,
    "cluster": clustering_stats,
    "orbit": orbit_stats_all,
    "spectral": spectral_stats,
    "nspdk": nspdk_stats,
}


def load_eval_settings(data: str = "", orbit_on: bool = True):
    """Default generic-graph eval settings.  Parity: loader.py:660-684."""
    methods = ["degree", "cluster", "orbit", "spectral"]
    kernels = {
        "degree": gaussian_emd,
        "cluster": gaussian_emd,
        "orbit": gaussian,
        "spectral": gaussian_emd,
    }
    return methods, kernels


def eval_graph_list(
    graph_ref_list: List[nx.Graph],
    graph_pred_list: List[nx.Graph],
    methods: Optional[List[str]] = None,
    kernels: Optional[Dict[str, Callable]] = None,
    folder: str = "./",
) -> Dict[str, float]:
    """Evaluate generated graphs against a reference set.  (stats.py:480-544)"""
    if methods is None:
        methods = ["degree", "cluster", "orbit"]
    if kernels is None:
        kernels = load_eval_settings()[1]
    results: Dict[str, float] = {}
    for method in methods:
        if method == "nspdk":
            results[method] = METHOD_NAME_TO_FUNC[method](
                graph_ref_list, graph_pred_list
            )
        else:
            results[method] = round(
                METHOD_NAME_TO_FUNC[method](
                    graph_ref_list, graph_pred_list, kernels[method]
                ),
                6,
            )
    return results


def adjs_to_graphs(adjs) -> List[nx.Graph]:
    """Adjacency batch -> cleaned nx graphs.  Parity: graph_utils.py:216-251."""
    graphs = []
    for adj in np.asarray(adjs):
        G = nx.from_numpy_array(adj)
        G.remove_edges_from(nx.selfloop_edges(G))
        G.remove_nodes_from(list(nx.isolates(G)))
        if G.number_of_nodes() < 1:
            G.add_node(1)
        graphs.append(G)
    return graphs


def eval_array_batch(ref_batch, pred_batch, methods=None, folder="./"):
    """Adjacency-tensor variant.  Parity: stats.py:547-570."""
    return eval_graph_list(
        adjs_to_graphs(ref_batch), adjs_to_graphs(pred_batch),
        methods=methods, folder=folder,
    )
