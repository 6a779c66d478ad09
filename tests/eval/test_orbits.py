"""Orbit-counter correctness: native C++ vs brute-force oracle vs known graphs."""

import networkx as nx
import numpy as np
import pytest

from ccsd_tpu.eval.orbits import _get_lib, orbit_counts, orbit_counts_py


def _native(G):
    if _get_lib() is None:
        pytest.skip("g++ unavailable")
    return orbit_counts(G)


def test_triangle():
    G = nx.complete_graph(3)
    c = _native(G)
    assert (c[:, 0] == 2).all() and (c[:, 3] == 1).all()
    assert c[:, [1, 2]].sum() == 0


def test_path4():
    G = nx.path_graph(4)
    c = _native(G)
    # ends: orbit 4 once; middles: orbit 5 once
    assert c[0, 4] == 1 and c[3, 4] == 1 and c[1, 5] == 1 and c[2, 5] == 1
    assert c[:, 8:].sum() == 0


def test_star():
    G = nx.star_graph(3)  # claw, center node 0
    c = _native(G)
    assert c[0, 7] == 1 and (c[1:, 6] == 1).all()


def test_cycle4():
    G = nx.cycle_graph(4)
    c = _native(G)
    assert (c[:, 8] == 1).all()
    assert c[:, [9, 10, 11, 12, 13, 14]].sum() == 0


def test_k4():
    G = nx.complete_graph(4)
    c = _native(G)
    assert (c[:, 14] == 1).all()
    # each node also sits in 3 triangles and 3 diamonds (as deg-3? no: K4 has
    # no induced diamond — only the K4 itself at size 4)
    assert (c[:, 3] == 3).all()
    assert c[:, [12, 13]].sum() == 0


def test_paw():
    G = nx.Graph([(0, 1), (1, 2), (2, 0), (2, 3)])  # triangle 0-1-2, pendant 3
    c = _native(G)
    assert c[3, 9] == 1      # pendant
    assert c[2, 11] == 1     # attachment
    assert c[0, 10] == 1 and c[1, 10] == 1


def test_diamond():
    G = nx.Graph([(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
    c = _native(G)
    assert c[0, 12] == 1 and c[3, 12] == 1
    assert c[1, 13] == 1 and c[2, 13] == 1


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_bruteforce(seed):
    G = nx.gnp_random_graph(12, 0.35, seed=seed)
    native = _native(G)
    brute = orbit_counts_py(
        G.number_of_nodes(), [(u, v) for u, v in G.edges()]
    )
    np.testing.assert_array_equal(native, brute)


def test_matches_reference_orca_if_present():
    """Cross-check against the reference's shipped ORCA source, compiled here."""
    import os
    import subprocess
    import tempfile

    src = "/root/reference/ccsd/src/evaluation/orca/orca.cpp"
    if not os.path.exists(src):
        pytest.skip("reference orca source unavailable")
    exe = os.path.join(tempfile.gettempdir(), "ref_orca_bin")
    if not os.path.exists(exe):
        try:
            subprocess.check_call(
                ["g++", "-O2", "-o", exe, src],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        except Exception:
            pytest.skip("could not compile reference orca")
    G = nx.gnp_random_graph(20, 0.3, seed=7)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(f"{G.number_of_nodes()} {G.number_of_edges()}\n")
        for u, v in G.edges():
            f.write(f"{u} {v}\n")
        path = f.name
    out = subprocess.check_output([exe, "node", "4", path, "std"]).decode()
    start = out.find("orbit counts: \n") + len("orbit counts: \n")
    ref = np.array(
        [list(map(int, line.split())) for line in out[start:].strip().split("\n")]
    )
    ours = _native(G)
    np.testing.assert_array_equal(ours, ref)


# ----------------------------------------------------- 5-node orbit mode ----

def test_orbit5_petersen_golden():
    """Golden counts generated from the reference ORCA binary ("node 5"),
    which our counter matches exactly (verified on random G(n,p) graphs);
    the Petersen graph is vertex-transitive so every row is identical."""
    import networkx as nx
    import numpy as np
    from ccsd_tpu.eval.orbits import orbit_counts

    g = nx.petersen_graph()
    c = orbit_counts(g, graphlet_size=5)
    assert c.shape == (10, 73)
    assert (c == c[0]).all()
    expected = np.zeros(73, np.int64)
    for o, v in {0: 3, 1: 6, 2: 3, 4: 12, 5: 12, 6: 3, 7: 1, 15: 12,
                 16: 12, 17: 6, 18: 6, 19: 12, 20: 6, 21: 6, 34: 6}.items():
        expected[o] = v
    np.testing.assert_array_equal(c[0], expected)


def test_orbit5_bull_pendant_golden():
    import networkx as nx
    import numpy as np
    from ccsd_tpu.eval.orbits import orbit_counts

    g = nx.bull_graph()
    g.add_edge(4, 5)
    c = orbit_counts(g, graphlet_size=5)
    expected = {
        0: {0: 2, 1: 2, 3: 1, 4: 1, 10: 2, 25: 1, 29: 1},
        1: {0: 3, 1: 1, 2: 2, 3: 1, 4: 1, 5: 1, 10: 1, 11: 1, 16: 1,
            26: 1, 29: 1},
        2: {0: 3, 1: 2, 2: 2, 3: 1, 5: 3, 10: 1, 11: 1, 17: 1, 26: 1,
            30: 1},
        3: {0: 1, 1: 2, 4: 1, 9: 1, 15: 1, 24: 1},
        4: {0: 2, 1: 2, 2: 1, 4: 1, 5: 2, 9: 1, 16: 1, 24: 1, 28: 1},
        5: {0: 1, 1: 1, 4: 2, 15: 1, 27: 1},
    }
    for v, orbs in expected.items():
        row = np.zeros(73, np.int64)
        for o, n in orbs.items():
            row[o] = n
        np.testing.assert_array_equal(c[v], row)


def test_orbit5_consistent_with_orbit4():
    import networkx as nx
    import numpy as np
    from ccsd_tpu.eval.orbits import orbit_counts

    g = nx.gnp_random_graph(18, 0.3, seed=11)
    np.testing.assert_array_equal(
        orbit_counts(g, 4), orbit_counts(g, 5)[:, :15]
    )
