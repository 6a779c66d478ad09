"""Config-driven two-stage pipeline: train -> checkpoint -> sample -> eval.

Uses the same tiny lifted-CC dataset as the joint trainer tests, but with a
GRAPH adjacency model and the dynamic-universe F loss (train.two_stage) and
the open-universe sampler (sample.two_stage).
"""

import numpy as np
import pytest

from tests.training.test_trainer_sampler import _config, _make_dataset


@pytest.mark.slow
def test_two_stage_train_and_sample(tmp_path):
    from ccsd_tpu.sampling.sampler import get_sampler_from_config
    from ccsd_tpu.sampling.two_stage_sampler import TwoStageSampler
    from ccsd_tpu.training.trainer import get_trainer_from_config
    from ccsd_tpu.training.two_stage_trainer import TwoStageTrainer

    name = _make_dataset(tmp_path, cc=True)
    cfg = _config(tmp_path, name, cc=True)
    cfg.model.adj = "ScoreNetworkA"  # stage-1 adjacency model is graph-mode
    cfg.train.two_stage = True
    cfg.train.num_epochs = 4
    cfg.sample.two_stage = True

    trainer = get_trainer_from_config(cfg, log=False)
    assert isinstance(trainer, TwoStageTrainer)
    ckpt_name = trainer.train()
    cfg.ckpt = ckpt_name + "_final"

    sampler = get_sampler_from_config(cfg, log=False)
    assert isinstance(sampler, TwoStageSampler)
    results = sampler.sample()
    assert results["n_samples"] > 0
    assert "mmd" in results and "cc_mmd" in results
    for v in results["mmd"].values():
        assert np.isfinite(v)
    for v in results["cc_mmd"].values():
        assert np.isfinite(v)


def test_two_stage_trainer_rejects_cc_adj_model(tmp_path):
    from ccsd_tpu.training.two_stage_trainer import TwoStageTrainer

    name = _make_dataset(tmp_path, cc=True)
    cfg = _config(tmp_path, name, cc=True)
    cfg.train.two_stage = True
    with pytest.raises(AssertionError):
        TwoStageTrainer(cfg, log=False)


@pytest.mark.slow
def test_two_stage_minibatch_training(tmp_path):
    """train.minibatch subsamples the batch per step (round-4 diversity
    remedy); losses stay finite and the checkpoint samples."""
    from ccsd_tpu.sampling.sampler import get_sampler_from_config
    from ccsd_tpu.training.trainer import get_trainer_from_config

    name = _make_dataset(tmp_path, cc=True)
    cfg = _config(tmp_path, name, cc=True)
    cfg.model.adj = "ScoreNetworkA"
    cfg.train.two_stage = True
    cfg.train.num_epochs = 4
    cfg.train.minibatch = 4
    cfg.sample.two_stage = True

    trainer = get_trainer_from_config(cfg, log=False)
    ckpt_name = trainer.train()
    cfg.ckpt = ckpt_name + "_final"
    results = get_sampler_from_config(cfg, log=False).sample()
    assert results["n_samples"] > 0
