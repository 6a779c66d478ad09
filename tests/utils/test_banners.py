"""Structured log banners (parity: ccsd/src/utils/logger.py:115-281)."""

import os

from ccsd_tpu.utils.config import AttrDict
from ccsd_tpu.utils.logger import (
    Logger,
    device_log,
    model_log,
    model_parameters_log,
    sample_log,
    sde_log,
    start_log,
    time_log,
    train_log,
)


def _config():
    return AttrDict({
        "is_cc": True,
        "seed": 3,
        "data": {"data": "toy", "init": "deg", "max_feat_num": 5,
                 "batch_size": 8},
        "sde": {
            "x": {"type": "VP", "beta_min": 0.1, "beta_max": 1.0,
                  "num_scales": 10},
            "adj": {"type": "VE", "beta_min": 0.2, "beta_max": 1.0,
                    "num_scales": 10},
            "rank2": {"type": "VP", "beta_min": 0.1, "beta_max": 1.0,
                      "num_scales": 10},
        },
        "model": {"x": "ScoreNetworkX", "adj": "ScoreNetworkA_CC",
                  "rank2": "ScoreNetworkF", "conv": "GCN", "num_heads": 4,
                  "depth": 2, "adim": 8, "nhid": 8, "num_layers": 2,
                  "num_linears": 1, "c_init": 2, "c_hid": 4, "c_final": 2,
                  "use_hodge_mask": True, "num_layers_mlp": 1, "cnum": 2},
        "train": {"name": "t", "lr": 0.01, "lr_schedule": True, "ema": 0.999,
                  "num_epochs": 3, "reduce_mean": False, "eps": 1e-5},
        "sampler": {"predictor": "Euler", "corrector": "Langevin",
                    "snr": 0.05, "scale_eps": 0.7, "n_steps": 1},
        "sample": {"eps": 1e-4, "noise_removal": True, "use_ema": False},
    })


def test_banners_write_expected_fields(tmp_path):
    path = os.path.join(str(tmp_path), "b.log")
    logger = Logger(file_path=path, verbose=False)
    cfg = _config()
    start_log(logger, cfg)
    device_log(logger)
    train_log(logger, cfg)
    sample_log(logger, cfg)
    model_parameters_log(logger, {"x": {"w": [[1.0, 2.0], [3.0, 4.0]]},
                                  "adj": {"b": [1.0, 2.0, 3.0]}})
    time_log(logger, "train", 1.234)
    time_log(logger, "sample", 5.678)
    text = open(path).read()
    assert "[toy]   init=deg (5)   seed=3   batch_size=8" in text
    assert "(x:VP)=(0.10, 1.00) N=10" in text
    assert "(adj:VE)=(0.20, 1.00)" in text
    assert "(rank2:VP)" in text
    assert "(ScoreNetworkX)+(ScoreNetworkA_CC=GCN,4)" in text
    assert "ScoreNetworkF=hodge mask, 1 2" in text
    assert "lr=0.01 schedule=True ema=0.999 epochs=3" in text
    assert "(Euler)+(Langevin)" in text
    assert "snr=0.05 seps=0.7 n_steps=1" in text
    assert "x: 4" in text and "adj: 3" in text and "Total: 7" in text
    assert "Training time: 1.234 seconds" in text
    assert "Sampling time: 5.678 seconds" in text
    assert "Using devices:" in text


def test_sde_model_log_graph_mode(tmp_path):
    path = os.path.join(str(tmp_path), "g.log")
    logger = Logger(file_path=path, verbose=False)
    cfg = _config()
    cfg.is_cc = False
    sde_log(logger, cfg.sde, is_cc=False)
    model_log(logger, cfg, is_cc=False)
    text = open(path).read()
    assert "rank2" not in text
    assert "ScoreNetworkF" not in text


def test_time_log_rejects_unknown_type():
    import pytest

    with pytest.raises(ValueError):
        time_log(Logger(verbose=False), "bogus", 1.0)
