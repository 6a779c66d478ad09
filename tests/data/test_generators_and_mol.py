"""Generators, molecular transforms (synthetic, RDKit-free paths), loaders."""

import json
import os

import networkx as nx
import numpy as np
import pytest


def test_n_community_structure():
    np.random.seed(0)
    from ccsd_tpu.data.generators import n_community

    g = n_community(2, 16, p_inter=0.05)
    assert g.number_of_nodes() == 16
    assert nx.number_connected_components(g) == 1


def test_graph_generator_registry():
    from ccsd_tpu.data.generators import NAME_TO_NX_GENERATOR, GraphGenerator

    assert set(NAME_TO_NX_GENERATOR) == {
        "community", "grid", "gnp", "ba", "pow_law", "except_deg", "cycle",
        "c_l", "lobster",
    }
    gen = GraphGenerator("cycle", {"n": [5]})
    g = gen()
    assert g.number_of_nodes() == 5 and g.number_of_edges() == 5


def test_gen_graph_list_bounds(tmp_path):
    np.random.seed(1)
    from ccsd_tpu.data.generators import gen_graph_list

    graphs = gen_graph_list(
        "gnp", {"n": [6, 8], "p": [0.5]}, length=5, save_dir=str(tmp_path),
        file_name="toy", min_node=2,
    )
    assert len(graphs) == 5
    assert os.path.exists(tmp_path / "toy.pkl")
    from ccsd_tpu.data.loader import load_dataset

    assert len(load_dataset(str(tmp_path), "toy")) == 5


def test_generate_dataset_community(tmp_path):
    np.random.seed(2)
    from ccsd_tpu.data.generators import generate_dataset
    from ccsd_tpu.data.loader import load_dataset

    generate_dataset("community_small", data_dir=str(tmp_path), is_cc=False)
    graphs = load_dataset(str(tmp_path), "community_small")
    assert len(graphs) == 100
    assert all(12 <= g.number_of_nodes() <= 20 for g in graphs)


def test_mol_graph_transform_qm9_synthetic():
    """QM9 transform semantics on a hand-built molecule array (no RDKit)."""
    from ccsd_tpu.data.mol_loader import _transform_graph

    # atoms: C, N, O, F, then padding (0)
    x = np.array([6, 7, 8, 9, 0, 0, 0, 0, 0])
    adj = np.zeros((4, 9, 9), np.float32)
    adj[0, 0, 1] = adj[0, 1, 0] = 1  # single C-N
    adj[1, 1, 2] = adj[1, 2, 1] = 1  # double N-O
    adj[2, 2, 3] = adj[2, 3, 2] = 1  # triple O-F
    x_, a = _transform_graph(x, adj, "QM9")
    assert x_.shape == (9, 4)
    assert x_[0, 0] == 1 and x_[1, 1] == 1 and x_[2, 2] == 1 and x_[3, 3] == 1
    assert not x_[4:].any()  # virtual atoms one-hot removed with last column
    assert a[0, 1] == 1.0 and a[1, 2] == 2.0 and a[2, 3] == 3.0
    assert a[0, 2] == 0.0


def test_mol_loader_end_to_end_synthetic(tmp_path):
    """dataloader_mol on a synthetic kekulized npz + valid_idx json."""
    from ccsd_tpu.data.mol_loader import dataloader_mol
    from ccsd_tpu.utils.config import AttrDict

    rng = np.random.default_rng(0)
    n_mols = 12
    xs = np.zeros((n_mols, 9), np.int64)
    adjs = np.zeros((n_mols, 4, 9, 9), np.float32)
    for i in range(n_mols):
        n = rng.integers(3, 6)
        xs[i, :n] = rng.choice([6, 7, 8, 9], n)
        for j in range(n - 1):
            adjs[i, 0, j, j + 1] = adjs[i, 0, j + 1, j] = 1
    os.makedirs(tmp_path / "data")
    np.savez(tmp_path / "data" / "qm9_kekulized.npz", xs, adjs)
    with open(tmp_path / "data" / "valid_idx_qm9.json", "w") as f:
        json.dump({"valid_idxs": ["0", "5"]}, f)

    cfg = AttrDict({
        "folder": str(tmp_path),
        "data": {"data": "QM9", "dir": "data", "batch_size": 4},
    })
    train, test = dataloader_mol(cfg)
    xb, ab = next(iter(train))
    assert xb.shape == (4, 9, 4) and ab.shape == (4, 9, 9)
    assert train.n == 10 and test.n == 2


def test_array_dataset_batching():
    from ccsd_tpu.data.loader import ArrayDataset

    a = np.arange(10)[:, None]
    ds = ArrayDataset((a,), batch_size=4, shuffle=False)
    batches = list(ds)
    assert [b[0].shape[0] for b in batches] == [4, 4, 2]
    ds2 = ArrayDataset((a,), batch_size=4, shuffle=True, drop_last=True, seed=1)
    assert [b[0].shape[0] for b in ds2] == [4, 4]
    # shuffle changes order between epochs
    e1 = np.concatenate([b[0][:, 0] for b in ds2])
    e2 = np.concatenate([b[0][:, 0] for b in ds2])
    assert not np.array_equal(e1, e2)


def test_nspdk_deterministic():
    from ccsd_tpu.eval.nspdk import vectorize

    g = nx.gnp_random_graph(8, 0.4, seed=0)
    for n in g:
        g.nodes[n]["label"] = "C"
    for e in g.edges:
        g.edges[e]["label"] = 1
    a = vectorize([g]).toarray()
    b = vectorize([g]).toarray()
    np.testing.assert_array_equal(a, b)


def test_enzymes_loader_matches_shipped_pickle():
    """graph_load_batch on the reference's raw TU files reproduces the
    shipped ENZYMES_small pickle exactly (isomorphism check)."""
    import os

    if not os.path.isdir("/root/reference/data/dataset/ENZYMES"):
        pytest.skip("raw ENZYMES files unavailable")
    from ccsd_tpu.data.generators import graph_load_batch
    from ccsd_tpu.data.loader import load_dataset

    graphs = graph_load_batch(
        min_num_nodes=1, max_num_nodes=12, name="ENZYMES",
        node_attributes=False, graph_labels=True, folder="/root/reference",
    )
    ref = load_dataset("/root/reference/data", "ENZYMES_small")
    assert len(graphs) == len(ref) == 35
    assert all(nx.is_isomorphic(a, b) for a, b in zip(graphs, ref))
