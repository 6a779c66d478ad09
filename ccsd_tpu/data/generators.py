"""Synthetic graph dataset generators and real-dataset extractors.

Parity targets: ccsd/data/data_generators.py:33-605 (community generator,
generator registry, gen_graph_list, ENZYMES batch loader, citeseer ego
extraction, per-dataset generation recipes).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional, Union

import networkx as nx
import numpy as np

from ccsd_tpu.data.cc_codec import convert_graphs_to_CCs
from ccsd_tpu.data.loader import save_dataset


def n_community(
    num_communities: int, max_nodes: int, p_inter: float = 0.05
) -> nx.Graph:
    """Multi-community graph (Niu et al. 2020 recipe).

    Parity: data_generators.py:33-83.
    """
    assert num_communities > 1
    one_community_size = max_nodes // num_communities
    c_sizes = [one_community_size] * num_communities
    p_make_a_bridge = p_inter * 2 / ((num_communities - 1) * one_community_size)
    graphs = [
        nx.gnp_random_graph(c_sizes[i], 0.7, seed=i) for i in range(len(c_sizes))
    ]
    G = nx.disjoint_union_all(graphs)
    communities = [G.subgraph(c) for c in nx.connected_components(G)]
    for i in range(len(communities)):
        nodes1 = list(communities[i].nodes())
        for j in range(i + 1, len(communities)):
            nodes2 = list(communities[j].nodes())
            has_inter_edge = False
            for n1 in nodes1:
                for n2 in nodes2:
                    if np.random.rand() < p_make_a_bridge:
                        G.add_edge(n1, n2)
                        has_inter_edge = True
            if not has_inter_edge:
                G.add_edge(nodes1[0], nodes2[0])
    return G


NAME_TO_NX_GENERATOR: Dict[str, Callable[..., nx.Graph]] = {
    "community": n_community,
    "grid": nx.generators.grid_2d_graph,
    "gnp": nx.generators.fast_gnp_random_graph,
    "ba": nx.generators.barabasi_albert_graph,
    "pow_law": lambda **kw: nx.configuration_model(
        nx.generators.random_powerlaw_tree_sequence(**kw, gamma=3, tries=2000)
    ),
    "except_deg": lambda **kw: nx.expected_degree_graph(**kw, selfloops=False),
    "cycle": nx.cycle_graph,
    "c_l": nx.circular_ladder_graph,
    "lobster": nx.random_lobster,
}


class GraphGenerator:
    """Random-parameter graph generator.  Parity: data_generators.py:102-152."""

    def __init__(
        self,
        graph_type: str = "grid",
        possible_params_dict: Optional[Dict[str, Any]] = None,
        corrupt_func: Optional[Callable[[Any], nx.Graph]] = None,
    ):
        self.possible_params = possible_params_dict or {}
        self.corrupt_func = corrupt_func
        self.nx_generator = NAME_TO_NX_GENERATOR[graph_type]

    def __call__(self) -> nx.Graph:
        params = {k: np.random.choice(v) for k, v in self.possible_params.items()}
        graph = self.nx_generator(**params)
        graph = nx.relabel.convert_node_labels_to_integers(graph)
        if self.corrupt_func is not None:
            graph = self.corrupt_func(graph)
        return graph


def gen_graph_list(
    graph_type: str = "grid",
    possible_params_dict: Optional[Dict[str, Any]] = None,
    corrupt_func=None,
    length: int = 1024,
    save_dir: Optional[str] = None,
    file_name: Optional[str] = None,
    max_node: Optional[int] = None,
    min_node: Optional[int] = None,
) -> List[nx.Graph]:
    """Generate `length` graphs within node bounds.  Parity: :155-214."""
    if file_name is None:
        file_name = f"{graph_type}_{length}"
    gen = GraphGenerator(graph_type, possible_params_dict, corrupt_func)
    out: List[nx.Graph] = []
    while len(out) < length:
        g = gen()
        n = g.number_of_nodes()
        if max_node is not None and n > max_node:
            continue
        if min_node is not None and n < min_node:
            continue
        if n <= 1:
            continue
        out.append(nx.convert_node_labels_to_integers(g))
    if save_dir is not None:
        save_dataset(save_dir, out, file_name)
    return out


def graph_load_batch(
    min_num_nodes: int = 20,
    max_num_nodes: int = 1000,
    name: str = "ENZYMES",
    node_attributes: bool = True,
    graph_labels: bool = True,
    folder: str = "./",
) -> List[nx.Graph]:
    """Load TU-format datasets (ENZYMES / PROTEINS / DD).  Parity: :235-314."""
    path = os.path.join(folder, "data", "dataset", name)
    data_adj = np.loadtxt(os.path.join(path, f"{name}_A.txt"), delimiter=",").astype(int)
    data_node_att = (
        np.loadtxt(os.path.join(path, f"{name}_node_attributes.txt"), delimiter=",")
        if node_attributes else []
    )
    data_node_label = np.loadtxt(
        os.path.join(path, f"{name}_node_labels.txt"), delimiter=","
    ).astype(int)
    data_graph_indicator = np.loadtxt(
        os.path.join(path, f"{name}_graph_indicator.txt"), delimiter=","
    ).astype(int)
    if graph_labels:
        data_graph_labels = np.loadtxt(
            os.path.join(path, f"{name}_graph_labels.txt"), delimiter=","
        ).astype(int)

    G = nx.Graph()
    G.add_edges_from(map(tuple, data_adj))
    for i in range(data_node_label.shape[0]):
        if node_attributes:
            G.add_node(i + 1, feature=data_node_att[i])
        G.add_node(i + 1, label=data_node_label[i])
    G.remove_nodes_from(list(nx.isolates(G)))

    node_list = np.arange(data_graph_indicator.shape[0]) + 1
    graphs = []
    for i in range(data_graph_indicator.max()):
        nodes = node_list[data_graph_indicator == i + 1]
        sub = G.subgraph(nodes)
        if graph_labels:
            sub.graph["label"] = data_graph_labels[i]
        if min_num_nodes <= sub.number_of_nodes() <= max_num_nodes:
            graphs.append(nx.convert_node_labels_to_integers(sub))
    return graphs


def citeseer_ego(
    radius: int = 3, node_min: int = 50, node_max: int = 400, folder: str = "./"
) -> List[nx.Graph]:
    """Ego graphs from the citeseer citation network.  Parity: :332-410."""
    import pickle

    import scipy.sparse as sp

    names = ["x", "tx", "allx", "graph"]
    objects = []
    for nm in names:
        with open(
            os.path.join(folder, "data", "dataset", f"ind.citeseer.{nm}"), "rb"
        ) as f:
            objects.append(pickle.load(f, encoding="latin1"))
    _, _, _, graph = objects
    G = nx.from_dict_of_lists(graph)
    G = max((G.subgraph(c) for c in nx.connected_components(G)), key=len)
    G = nx.convert_node_labels_to_integers(G)
    out = []
    for i in range(G.number_of_nodes()):
        ego = nx.ego_graph(G, i, radius=radius)
        if node_min <= ego.number_of_nodes() <= node_max:
            ego.remove_edges_from(nx.selfloop_edges(ego))
            out.append(nx.convert_node_labels_to_integers(ego))
    return out


# per-dataset generation recipes (data_generators.py:439-605)
def generate_dataset(
    dataset: str, data_dir: str = "./data", is_cc: bool = False, folder: str = "./"
) -> None:
    if dataset == "community_small":
        graphs = gen_graph_list(
            graph_type="community",
            possible_params_dict={
                "num_communities": [2],
                "max_nodes": np.arange(12, 21).tolist(),
            },
            length=100,
        )
        lift = ("path_based", "basic")
    elif dataset == "grid":
        graphs = gen_graph_list(
            graph_type="grid",
            possible_params_dict={
                "m": np.arange(10, 20).tolist(),
                "n": np.arange(10, 20).tolist(),
            },
            length=100,
        )
        lift = ("path_based", "basic")
    elif dataset == "grid_small":
        graphs = gen_graph_list(
            graph_type="grid",
            possible_params_dict={
                "m": np.arange(4, 8).tolist(),
                "n": np.arange(4, 8).tolist(),
            },
            length=100,
        )
        lift = ("path_based", "basic")
    elif dataset == "ego_small":
        graphs = citeseer_ego(radius=1, node_min=4, node_max=18, folder=folder)[:200]
        lift = ("cycles", None)
    elif dataset == "ENZYMES":
        graphs = graph_load_batch(
            min_num_nodes=10, max_num_nodes=1000, name="ENZYMES",
            node_attributes=False, graph_labels=True, folder=folder,
        )
        lift = ("cycles", None)
    elif dataset == "ENZYMES_small":
        graphs = graph_load_batch(
            min_num_nodes=1, max_num_nodes=12, name="ENZYMES",
            node_attributes=False, graph_labels=True, folder=folder,
        )
        lift = ("cycles", None)
    else:
        raise NotImplementedError(f"Dataset {dataset} not supported.")

    if not is_cc:
        save_dataset(data_dir, graphs, dataset)
        return
    max_nb_nodes = max(g.number_of_nodes() for g in graphs)
    procedure, kwargs = lift
    if procedure == "path_based":
        kwargs = {"sources_nodes": list(range(max_nb_nodes)), "path_length": 3}
    ccs = convert_graphs_to_CCs(
        graphs, is_molecule=False, lifting_procedure=procedure,
        lifting_procedure_kwargs=kwargs, max_nb_nodes=max_nb_nodes,
    )
    save_dataset(data_dir, ccs, f"{dataset}_CC")


def main():
    """CLI.  Parity: ccsd/src/parsers/parser_generator.py:10-72."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="community_small")
    p.add_argument("--data-dir", type=str, default="data")
    p.add_argument("--is_cc", action="store_true")
    p.add_argument("--folder", type=str, default="./")
    args = p.parse_args()
    generate_dataset(
        args.dataset,
        data_dir=os.path.join(args.folder, args.data_dir),
        is_cc=args.is_cc,
        folder=args.folder,
    )


if __name__ == "__main__":
    main()
