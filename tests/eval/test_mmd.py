"""MMD / kernel tests: closed-form EMD vs an LP optimal-transport oracle."""

import numpy as np
import pytest

from ccsd_tpu.eval import mmd


def _emd_lp(x, y, scaling=1.0):
    """Exact EMD via scipy linprog (oracle for the closed form)."""
    from scipy.optimize import linprog

    n = max(len(x), len(y))
    x, y = mmd.process_tensor(np.asarray(x, float), np.asarray(y, float))
    cost = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) / scaling
    # min <C, P> s.t. row sums = x, col sums = y
    A_eq = []
    b_eq = []
    for i in range(n):
        row = np.zeros((n, n))
        row[i, :] = 1
        A_eq.append(row.reshape(-1))
        b_eq.append(x[i])
    for j in range(n):
        col = np.zeros((n, n))
        col[:, j] = 1
        A_eq.append(col.reshape(-1))
        b_eq.append(y[j])
    res = linprog(cost.reshape(-1), A_eq=np.array(A_eq), b_eq=np.array(b_eq),
                  bounds=(0, None), method="highs")
    assert res.success
    return res.fun


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_emd_matches_lp(seed):
    rng = np.random.default_rng(seed)
    x = rng.random(6)
    y = rng.random(8)
    x, y = x / x.sum(), y / y.sum()
    assert mmd.emd(x, y) == pytest.approx(_emd_lp(x, y), abs=1e-9)
    assert mmd.emd(x, y, distance_scaling=5.0) == pytest.approx(
        _emd_lp(x, y, 5.0), abs=1e-9
    )


def test_emd_zero_for_identical():
    x = np.array([0.2, 0.3, 0.5])
    assert mmd.emd(x, x) == 0.0
    assert mmd.gaussian_emd(x, x) == 1.0


def test_mmd_symmetry_and_zero():
    rng = np.random.default_rng(0)
    samples = [rng.random(5) for _ in range(10)]
    assert mmd.compute_mmd(samples, samples, mmd.gaussian_emd) == pytest.approx(
        0.0, abs=1e-12
    )


def test_vectorized_kernels_match_scalar():
    rng = np.random.default_rng(1)
    s1 = [rng.random(4) for _ in range(5)]
    s2 = [rng.random(4) for _ in range(7)]
    for kern in (mmd.gaussian_emd, mmd.gaussian, mmd.gaussian_tv):
        fast = mmd.disc(s1, s2, kern, sigma=0.7)
        slow = np.mean([[kern(a, b, sigma=0.7) for b in s2] for a in s1])
        assert fast == pytest.approx(slow, rel=1e-10)


def test_graph_stats_smoke():
    import networkx as nx

    from ccsd_tpu.eval.stats import eval_graph_list, load_eval_settings

    ref = [nx.gnp_random_graph(10, 0.4, seed=i) for i in range(8)]
    pred = [nx.gnp_random_graph(10, 0.4, seed=100 + i) for i in range(8)]
    methods, kernels = load_eval_settings()
    res = eval_graph_list(ref, pred, methods=methods, kernels=kernels)
    assert set(res) == {"degree", "cluster", "orbit", "spectral"}
    for v in res.values():
        assert np.isfinite(v) and v >= -1e-6
    same = eval_graph_list(ref, ref, methods=["degree", "spectral"],
                           kernels=kernels)
    assert same["degree"] == pytest.approx(0.0, abs=1e-9)


def test_cc_stats_smoke():
    from ccsd_tpu.data.loader import load_dataset
    from ccsd_tpu.eval.cc_stats import eval_CC_list

    ccs = load_dataset("/root/reference/data", "community_small_CC")[:10]
    worker_kwargs = dict(d_min=3, d_max=3, N=20, min_node_val=1,
                         max_node_val=1, node_label="weight", min_edge_val=1,
                         max_edge_val=1, edge_label="weight")
    res = eval_CC_list(ccs, ccs, worker_kwargs)
    for k, v in res.items():
        assert v == pytest.approx(0.0, abs=1e-6), k
