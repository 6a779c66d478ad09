"""Data-layer tests: codecs, lifts, loaders (against reference pickles)."""

import os

import networkx as nx
import numpy as np
import pytest

from ccsd_tpu.data.cc_codec import (
    CC_to_incidence_matrices,
    cc_from_incidence,
    ccs_to_tensors,
    convert_CC_to_graphs,
    convert_graphs_to_CCs,
    create_incidence_1_2,
    pad_adjs,
    pad_rank2,
)
from ccsd_tpu.data.complex import CombinatorialComplex
from ccsd_tpu.data.loader import init_features, load_dataset

REF_DATA = "/root/reference/data"


def _tiny_cc():
    """The reference test fixture: 5 nodes, edges {01,12,23,30,34,40},
    rank-2 cells {0,1,2,3} and {0,3,4} (test_ScoreNetwork_A_CC.py:28-45)."""
    cc = CombinatorialComplex()
    for i in range(5):
        cc.add_cell((i,), rank=0, label=1.0)
    for e in [(0, 1), (1, 2), (2, 3), (3, 0), (3, 4), (4, 0)]:
        cc.add_cell(e, rank=1, label=1.0)
    cc.add_cell(frozenset({0, 1, 2, 3}), rank=2, label=1.0)
    cc.add_cell(frozenset({0, 3, 4}), rank=2, label=1.0)
    return cc


def test_incidence_roundtrip_tiny():
    cc = _tiny_cc()
    X, A, F = CC_to_incidence_matrices(cc, 3, 4)
    assert X.shape == (5, 1)
    assert A.shape == (5, 5)
    from ccsd_tpu.ops.cells import rank2_dim

    assert F.shape == rank2_dim(5, 3, 4)
    # exactly two nonzero columns (the two cells)
    assert (np.abs(F).sum(0) > 0).sum() == 2
    cc2 = cc_from_incidence([X, A, F], 3, 4)
    assert set(cc2.cells.hyperedge_dict[2]) == set(cc.cells.hyperedge_dict[2])
    assert set(cc2.cells.hyperedge_dict[1]) == set(cc.cells.hyperedge_dict[1])


def test_incidence_entries():
    cc = _tiny_cc()
    _, A, F = CC_to_incidence_matrices(cc, 3, 4)
    from ccsd_tpu.ops.cells import get_spec

    spec = get_spec(5, 3, 4)
    j = spec.cell_col[frozenset({0, 3, 4})]
    # edges inside {0,3,4} that exist in A: (0,3), (3,4), (0,4)
    rows = np.nonzero(F[:, j])[0]
    expected = {spec.edge_row[frozenset(e)] for e in [(0, 3), (3, 4), (0, 4)]}
    assert set(rows) == expected


def test_pad_rank2_reindexes():
    cc = _tiny_cc()
    _, A, F = CC_to_incidence_matrices(cc, 3, 4)
    F8 = pad_rank2(F, 8, 3, 4)
    from ccsd_tpu.ops.cells import get_spec

    s5, s8 = get_spec(5, 3, 4), get_spec(8, 3, 4)
    assert F8.shape == (s8.num_edges, s8.num_cells)
    # the cell {0,1,2,3} keeps its value at the re-indexed location
    j5 = s5.cell_col[frozenset({0, 1, 2, 3})]
    j8 = s8.cell_col[frozenset({0, 1, 2, 3})]
    i5 = s5.edge_row[frozenset((0, 1))]
    i8 = s8.edge_row[frozenset((0, 1))]
    assert F8[i8, j8] == F[i5, j5] != 0


def test_pad_adjs():
    a = np.ones((3, 3), np.float32)
    out = pad_adjs(a, 5)
    assert out.shape == (5, 5)
    assert out[:3, :3].sum() == 9 and out.sum() == 9
    with pytest.raises(ValueError):
        pad_adjs(np.ones((6, 6)), 5)


def test_lifts_cycles_and_paths():
    g = nx.cycle_graph(4)
    cc = convert_graphs_to_CCs([g], lifting_procedure="cycles")[0]
    assert frozenset({0, 1, 2, 3}) in cc.cells.hyperedge_dict[2]
    cc2 = convert_graphs_to_CCs(
        [g], lifting_procedure="path_based",
        lifting_procedure_kwargs={"sources_nodes": [0], "path_length": 3},
    )[0]
    # simple 3-node paths from node 0: {0,1,2} and {0,3,2}
    assert set(cc2.cells.hyperedge_dict[2]) == {
        frozenset({0, 1, 2}), frozenset({0, 3, 2})
    }


def test_cc_to_graph_projection():
    cc = _tiny_cc()
    g = convert_CC_to_graphs([cc])[0]
    assert g.number_of_nodes() == 5 and g.number_of_edges() == 6


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_reference_pickles_load():
    graphs = load_dataset(REF_DATA, "community_small")
    assert len(graphs) == 100 and isinstance(graphs[0], nx.Graph)
    ccs = load_dataset(REF_DATA, "community_small_CC")
    assert len(ccs) == 100
    assert isinstance(ccs[0], CombinatorialComplex)
    adjs, rank2 = ccs_to_tensors(ccs[:4], 20, 3, 3)
    assert adjs.shape == (4, 20, 20) and rank2.shape == (4, 190, 1140)
    # 1-skeletons match between the CC pickle and the graph pickle datasets
    g_from_cc = convert_CC_to_graphs(ccs[:1])[0]
    assert g_from_cc.number_of_edges() > 0


def test_init_features_deg():
    adjs = np.zeros((2, 4, 4), np.float32)
    adjs[:, 0, 1] = adjs[:, 1, 0] = 1
    x = init_features("deg", adjs, nfeat=3)
    assert x.shape == (2, 4, 3)
    assert x[0, 0, 1] == 1  # degree 1 one-hot
    assert not x[0, 2:].any()  # masked isolated nodes
    with pytest.raises(NotImplementedError):
        init_features("bad", adjs)


def test_convert_graphs_relabels_noncontiguous_nodes():
    """Generated graphs lose labels to isolated-node removal; the lift must
    relabel to contiguous 0..n-1 or the dense codec's X[node] indexing
    crashes (regression: 1-node graph labeled {1} broke the graph sampler's
    lifted-CC eval)."""
    g1 = nx.Graph()
    g1.add_node(1)  # single surviving node, label 1
    g2 = nx.Graph()
    g2.add_edges_from([(2, 5), (5, 9), (9, 2)])  # triangle, gappy labels
    ccs = convert_graphs_to_CCs([g1, g2], lifting_procedure="cycles")
    X1, A1, F1 = CC_to_incidence_matrices(ccs[0], None, None)
    assert X1.shape[0] == 1 and X1[0, 0] == 1
    X2, A2, F2 = CC_to_incidence_matrices(ccs[1], None, None)
    assert X2.shape[0] == 3 and A2.shape[:2] == (3, 3)
    assert np.squeeze(A2).sum() == 6  # symmetric triangle
    assert frozenset({0, 1, 2}) in ccs[1].cells.hyperedge_dict[2]
