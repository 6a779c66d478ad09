"""Active-cell universe: spec, codec equivalence, end-to-end training."""

import numpy as np
import pytest

from ccsd_tpu.data.loader import load_dataset
from ccsd_tpu.ops.cells import get_spec, observed_cell_universe

REF_DATA = "/root/reference/data"


def _ccs():
    return load_dataset(REF_DATA, "community_small_CC")[:20]


def test_observed_universe_shrinks_K():
    ccs = _ccs()
    cells = observed_cell_universe(ccs)
    full = get_spec(20, 3, 3)
    active = get_spec(20, 3, 3, cells)
    assert 0 < active.num_cells < full.num_cells
    assert active.num_edges == full.num_edges
    assert active.cells == [tuple(sorted(c)) for c in cells]


def test_active_tensors_match_full_restricted_to_columns():
    """F built on the active universe == full-universe F restricted to the
    observed columns (same rows, same values)."""
    from ccsd_tpu.data.cc_codec import ccs_to_tensors

    ccs = _ccs()
    cells = observed_cell_universe(ccs)
    full = get_spec(20, 3, 3)
    active = get_spec(20, 3, 3, cells)

    adjs_f, r2_full = ccs_to_tensors(ccs, 20, 3, 3)
    adjs_a, r2_act = ccs_to_tensors(ccs, 20, 3, 3, spec=active)
    np.testing.assert_array_equal(adjs_f, adjs_a)
    cols = [full.cell_col[frozenset(c)] for c in cells]
    np.testing.assert_array_equal(r2_full[:, :, cols], r2_act)
    # nothing outside the observed columns is lost
    other = [j for j in range(full.num_cells) if j not in set(cols)]
    assert not r2_full[:, :, other].any()


def test_active_cell_masks():
    import jax.numpy as jnp

    from ccsd_tpu.ops import masks

    ccs = _ccs()
    cells = observed_cell_universe(ccs)
    active = get_spec(20, 3, 3, cells)
    flags = np.ones((2, 20), np.float32)
    flags[0, 5:] = 0
    fl, fr = masks.rank2_flags(active, jnp.asarray(flags))
    assert fr.shape == (2, active.num_cells)
    for j, cell in enumerate(active.cells):
        expect = float(all(v < 5 for v in cell))
        assert float(fr[0, j]) == expect


def test_roundtrip_through_active_spec():
    from ccsd_tpu.data.cc_codec import CC_to_incidence_matrices, cc_from_incidence

    ccs = _ccs()
    cells = observed_cell_universe(ccs)
    active = get_spec(20, 3, 3, cells)
    X, A, F = CC_to_incidence_matrices(ccs[0], 3, 3, N=20, spec=active)
    cc2 = cc_from_incidence([X, A, F], 3, 3, spec=active)
    assert set(cc2.cells.hyperedge_dict[2]) == set(
        ccs[0].cells.hyperedge_dict[2]
    )


@pytest.mark.slow
def test_train_and_sample_with_observed_universe(tmp_path):
    """Full train+sample loop in active-cell mode on a tiny CC dataset."""
    from tests.training.test_trainer_sampler import _config, _make_dataset

    from ccsd_tpu.sampling.sampler import get_sampler_from_config
    from ccsd_tpu.training.trainer import Trainer

    name = _make_dataset(tmp_path, cc=True)
    cfg = _config(tmp_path, name, cc=True)
    cfg.data.cell_universe = "observed"
    trainer = Trainer(cfg, log=False)
    assert trainer.spec.custom_cells is not None
    assert trainer.spec.num_cells < get_spec(8, 3, 4).num_cells
    assert trainer.model_param_defs["rank2"]["cells"] == trainer.spec.custom_cells
    ckpt_name = trainer.train()

    cfg.ckpt = f"{ckpt_name}_final"
    sampler = get_sampler_from_config(cfg, log=False)
    results = sampler.sample()
    assert results["ccs"] is not None and len(results["ccs"]) > 0
    # decoded rank-2 cells must come from the active universe
    universe = set(map(frozenset, trainer.spec.custom_cells))
    for cc in results["ccs"]:
        for cell in cc.cells.hyperedge_dict.get(2, {}):
            assert cell in universe
