"""TwoStageSampler molecule branch: QM9-mode two-stage run emits the full
molecule metric dict (round-3 verdict missing #1 — the reference mol
samplers emit these for every run, ccsd/src/sampler.py:1213-1268, 850-904).
"""

import json
import os

import numpy as np
import pytest

from ccsd_tpu.utils.config import get_config


def _tiny_qm9_dir(tmp_path):
    """A tiny QM9-format dataset: the 5 hand-built kekulized fixtures from
    test_mol_pipeline, tiled to 40 molecules, last 8 held out."""
    from tests.data.test_mol_pipeline import FIXTURES

    d = tmp_path / "data"
    d.mkdir()
    xs = np.stack([f[0] for f in FIXTURES] * 8)
    adjs = np.stack([f[1] for f in FIXTURES] * 8)
    np.savez(d / "qm9_kekulized.npz", arr_0=xs, arr_1=adjs)
    n = xs.shape[0]
    with open(d / "valid_idx_qm9.json", "w") as f:
        json.dump({"valid_idxs": [str(i) for i in range(n - 8, n)]}, f)


@pytest.mark.slow
def test_two_stage_mol_metrics(tmp_path):
    from ccsd_tpu.sampling.sampler import get_sampler_from_config
    from ccsd_tpu.training.trainer import get_trainer_from_config

    _tiny_qm9_dir(tmp_path)
    cfg = get_config("qm9_CC_two_stage", seed=0, folder="./")
    cfg.folder = str(tmp_path)
    cfg.data.dir = "./data"
    cfg.data.batch_size = 8
    cfg.train.num_epochs = 3
    cfg.train.name = "test"
    cfg.sde.x.num_scales = 20
    cfg.sde.adj.num_scales = 20
    cfg.sde.rank2.num_scales = 20

    trainer = get_trainer_from_config(cfg, log=False)
    ckpt_name = trainer.train()
    cfg.ckpt = ckpt_name + "_final"
    cfg.sample.n_samples = 8
    cfg.sample.cc_nb_eval = 8

    sampler = get_sampler_from_config(cfg, log=False)
    results = sampler.sample()
    assert results["n_samples"] == 8
    mm = results["mol_metrics"]
    # MOSES-comparable key surface with documented exceptions
    for key in ("validity", "validity_wo_correction", "uniqueness",
                "novelty", "IntDiv", "IntDiv2", "Filters", "logP/Test",
                "weight/Test", "SNN/Test", "Frag/Test", "Scaf/Test"):
        assert key in mm, key
    assert 0.0 <= mm["validity"] <= 1.0
    # CC-MMD eval still runs alongside (dense-tractable at N=9)
    assert "cc_mmd" in results and "mmd" in results
    # SMILES dump exists
    assert os.path.exists(
        os.path.join(str(tmp_path), "samples", "QM9",
                     "smiles_two_stage.txt"))
