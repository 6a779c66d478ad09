"""End-to-end trainer + sampler tests on a tiny synthetic dataset."""

import os
import pickle

import networkx as nx
import numpy as np
import pytest

from ccsd_tpu.utils.config import AttrDict


def _make_dataset(tmp_path, n_graphs=20, cc=False):
    rng = np.random.default_rng(0)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(6, 9))
        g = nx.gnp_random_graph(n, 0.5, seed=int(rng.integers(1e6)))
        while g.number_of_edges() == 0:
            g = nx.gnp_random_graph(n, 0.7, seed=int(rng.integers(1e6)))
        graphs.append(g)
    os.makedirs(tmp_path / "data", exist_ok=True)
    if cc:
        from ccsd_tpu.data.cc_codec import convert_graphs_to_CCs

        objs = convert_graphs_to_CCs(
            graphs, lifting_procedure="cycles", lifting_procedure_kwargs={}
        )
        name = "tiny_CC"
    else:
        objs, name = graphs, "tiny"
    with open(tmp_path / "data" / f"{name}.pkl", "wb") as f:
        pickle.dump(objs, f)
    return name


def _config(tmp_path, name, cc=False):
    cfg = {
        "is_cc": cc,
        "folder": str(tmp_path),
        "seed": 0,
        "data": {
            "data": name, "dir": str(tmp_path / "data"), "batch_size": 8,
            "test_split": 0.2, "max_node_num": 8, "max_feat_num": 8,
            "init": "deg", "min_node_val": 1, "max_node_val": 1,
            "node_label": "weight", "min_edge_val": 1, "max_edge_val": 1,
            "edge_label": "weight", "d_min": 3, "d_max": 4,
        },
        "sde": {
            "x": {"type": "VP", "beta_min": 0.1, "beta_max": 1.0,
                  "num_scales": 12},
            "adj": {"type": "VP", "beta_min": 0.1, "beta_max": 1.0,
                    "num_scales": 12},
            "rank2": {"type": "VP", "beta_min": 0.1, "beta_max": 1.0,
                      "num_scales": 12},
        },
        "model": {
            "x": "ScoreNetworkX", "adj": "ScoreNetworkA_CC" if cc else
            "ScoreNetworkA", "rank2": "ScoreNetworkF", "conv": "GCN",
            "num_heads": 2, "depth": 2, "adim": 4, "nhid": 4,
            "num_layers": 2, "num_linears": 1, "c_init": 2, "c_hid": 3,
            "c_final": 2, "use_bn": False, "cnum": 2, "num_layers_mlp": 1,
            "use_hodge_mask": True, "conv_hodge": "HCN", "nhid_h": 4,
            "num_layers_h": 1, "num_linears_h": 1, "c_hid_h": 2,
            "c_final_h": 2, "adim_h": 4, "num_heads_h": 2,
        },
        "train": {
            "name": "t", "num_epochs": 2, "save_interval": 2,
            "print_interval": 1, "reduce_mean": False, "lr": 0.01,
            "lr_schedule": True, "ema": 0.9, "weight_decay": 1e-4,
            "grad_norm": 1.0, "lr_decay": 0.999, "eps": 1e-5,
        },
        "sampler": {"predictor": "Euler", "corrector": "Langevin",
                    "snr": 0.05, "scale_eps": 0.7, "n_steps": 1},
        "sample": {"cc_nb_eval": 10, "use_ema": True, "noise_removal": True,
                   "probability_flow": False, "eps": 1e-4, "seed": 1,
                   "eval": True},
        "config_name": "tiny_test",
    }
    return AttrDict(cfg)


@pytest.mark.parametrize(
    "cc", [False, pytest.param(True, marks=pytest.mark.slow)]
)
def test_train_then_sample(tmp_path, cc):
    from ccsd_tpu.sampling.sampler import get_sampler_from_config
    from ccsd_tpu.training.trainer import Trainer

    name = _make_dataset(tmp_path, cc=cc)
    cfg = _config(tmp_path, name, cc=cc)
    trainer = Trainer(cfg, log=False)
    ckpt_name = trainer.train()
    assert len(trainer.history["train"]) == 2
    losses = np.asarray(trainer.history["train"])
    assert np.isfinite(losses).all()
    ckpt_file = os.path.join(
        str(tmp_path), "checkpoints", name, f"{ckpt_name}_final.ckpt.pkl"
    )
    assert os.path.exists(ckpt_file)

    cfg.ckpt = f"{ckpt_name}_final"
    cfg.sample.save_gif = True  # exercise the trajectory-GIF path
    sampler = get_sampler_from_config(cfg, log=False)
    results = sampler.sample()
    assert len(results["graphs"]) > 0
    assert "mmd" in results and np.isfinite(list(results["mmd"].values())).all()
    fig_dir = os.path.join(str(tmp_path), "samples", name, "fig")
    assert os.path.exists(os.path.join(fig_dir, "diff_traj_graphs.gif"))
    assert os.path.exists(
        os.path.join(fig_dir, "diff_traj_graphs_cropped.gif"))
    if cc:
        assert results["ccs"] is not None
        assert "cc_mmd" in results


def test_checkpoint_resume_roundtrip(tmp_path):
    """Optimizer state survives save/load (capability the reference lacks)."""
    from ccsd_tpu.training.checkpoint import load_ckpt_file
    from ccsd_tpu.training.trainer import Trainer

    name = _make_dataset(tmp_path)
    cfg = _config(tmp_path, name)
    trainer = Trainer(cfg, log=False)
    trainer.train()
    path = trainer.save_checkpoint(suffix="_resume")
    ckpt = load_ckpt_file(path)
    for n in ("x", "adj"):
        assert f"{n}_opt_state" in ckpt
        assert f"ema_{n}" in ckpt
        assert f"{n}_params" in ckpt
    # params round-trip numerically
    import jax

    a = jax.tree.leaves(trainer.state.params["x"])
    b = jax.tree.leaves(ckpt["x_params"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_train_scanned_matches_loop_quality(tmp_path):
    """On-device epoch scanning trains to comparable losses."""
    name = _make_dataset(tmp_path)
    cfg = _config(tmp_path, name)
    cfg.train.num_epochs = 20

    from ccsd_tpu.training.trainer import Trainer

    t1 = Trainer(cfg, log=False)
    t1.train_scanned(epochs_per_call=10)
    assert len(t1.history["train"]) == 20
    scanned_final = np.asarray(t1.history["test"])[-1]

    t2 = Trainer(cfg, log=False)
    t2.train()
    loop_final = np.asarray(t2.history["test"])[-1]
    assert np.isfinite(scanned_final).all() and np.isfinite(loop_final).all()
    # same order of magnitude after the same number of epochs
    assert np.all(scanned_final < 5 * loop_final + 50)


@pytest.mark.slow
def test_resume_training_continues(tmp_path):
    """load_checkpoint restores params+opt+EMA and training continues."""
    import jax

    from ccsd_tpu.training.trainer import Trainer

    name = _make_dataset(tmp_path)
    cfg = _config(tmp_path, name)
    t1 = Trainer(cfg, log=False)
    t1.train()
    path = t1.save_checkpoint(suffix="_r")

    t2 = Trainer(cfg, log=False)
    before = jax.tree.leaves(t2.state.params["x"])[0]
    t2.load_checkpoint(t1.ckpt_name + "_r")
    after = jax.tree.leaves(t2.state.params["x"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # EMA counter restored (warmup continues, not restarted)
    assert int(t2.state.emas["x"].num_updates) == int(t1.state.emas["x"].num_updates)
    t2.train()  # continues without error
    assert np.isfinite(np.asarray(t2.history["train"])).all()
