"""Tests for chem.properties (weight / Crippen-class logP / Filters-lite)
and the IntDiv + Wasserstein additions to the metric surface.

Reference counterpart: MOSES get_all_metrics' property block, emitted by
ccsd/src/sampler.py:850-857."""

import numpy as np
import pytest

from ccsd_tpu.chem import from_smiles
from ccsd_tpu.chem.fingerprints import internal_diversity
from ccsd_tpu.chem.mol import Atom, Mol
from ccsd_tpu.chem.properties import (
    crippen_logp,
    molecular_weight,
    passes_filters,
)
from ccsd_tpu.eval.mol_metrics import property_distances, wasserstein_1d


def test_molecular_weight_exact():
    # methanol CH3OH = 32.042, ethanol C2H5OH = 46.069, benzene C6H6 = 78.114
    assert molecular_weight(from_smiles("CO")) == pytest.approx(32.042, abs=0.01)
    assert molecular_weight(from_smiles("CCO")) == pytest.approx(46.069, abs=0.01)
    assert molecular_weight(from_smiles("C1=CC=CC=C1")) == pytest.approx(
        78.114, abs=0.01)


def test_logp_orderings():
    # more aliphatic carbons -> more lipophilic; alcohols less than alkanes
    hexane = crippen_logp(from_smiles("CCCCCC"))
    ethanol = crippen_logp(from_smiles("CCO"))
    methane = crippen_logp(from_smiles("C"))
    assert hexane > methane > ethanol
    # halogenation raises logP
    assert crippen_logp(from_smiles("CCl")) > crippen_logp(from_smiles("C"))
    # amines are strongly hydrophilic in the Crippen table
    assert crippen_logp(from_smiles("CN")) < crippen_logp(from_smiles("C"))


def test_filters_lite():
    assert passes_filters(from_smiles("CCO"))
    assert passes_filters(from_smiles("C1=CC=CC=C1"))
    # disallowed atom (iodine)
    assert not passes_filters(from_smiles("CI"))
    # charged atom
    m = Mol()
    m.AddAtom(Atom("N", charge=1))
    assert not passes_filters(m)
    # macrocycle (ring of 12) fails the ring-size guard
    ring12 = from_smiles("C1" + "C" * 10 + "C1")
    assert not passes_filters(ring12)


def test_wasserstein_1d_shift_and_identity():
    rng = np.random.default_rng(0)
    a = rng.normal(size=4000)
    assert wasserstein_1d(a, a) == pytest.approx(0.0, abs=1e-12)
    assert wasserstein_1d(a, a + 2.5) == pytest.approx(2.5, rel=1e-3)
    assert wasserstein_1d([], a) is None


def test_internal_diversity():
    same = [from_smiles("CCO")] * 5
    # identical molecules: all pairwise Tanimoto 1 -> IntDiv 0
    assert internal_diversity(same, p=1) == pytest.approx(0.0, abs=1e-9)
    mixed = [from_smiles(s) for s in
             ("CCO", "C1=CC=CC=C1", "CC(=O)O", "CNC", "CCCCCC")]
    d1 = internal_diversity(mixed, p=1)
    d2 = internal_diversity(mixed, p=2)
    assert 0.0 < d1 < 1.0
    # power-mean inequality: sqrt(mean T^2) >= mean T  =>  IntDiv2 <= IntDiv
    assert d2 <= d1 + 1e-9
    assert internal_diversity([], p=1) == 0.0


def test_property_distances_keys_and_gating():
    gen = [from_smiles(s) for s in ("CCO", "CC(=O)O", "CNC")]
    out = property_distances(gen, ["CCO", "CCCO", "C1=CC=CC=C1"])
    assert out["SA/Test"] is None and out["QED/Test"] is None  # documented
    assert out["logP/Test"] >= 0.0
    assert out["weight/Test"] > 0.0
    assert 0.0 <= out["Filters"] <= 1.0
    empty = property_distances([], ["CCO"])
    assert all(v is None for v in empty.values())


def test_get_all_metrics_moses_key_surface():
    """The metric dict is key-comparable to MOSES get_all_metrics with
    documented exceptions (VERDICT r3 missing #2)."""
    from ccsd_tpu.eval.mol_metrics import get_all_metrics

    gen = [from_smiles(s) for s in ("CCO", "CC(=O)O", "CNC", "CCO")]
    m = get_all_metrics(gen, 5, ["CCO"], ["CCO", "CCCO"], num_no_correct=3)
    for key in ("validity", "validity_wo_correction", "uniqueness",
                "novelty", "FCD/Test", "SNN/Test", "Frag/Test", "Scaf/Test",
                "IntDiv", "IntDiv2", "Filters", "logP/Test", "weight/Test",
                "SA/Test", "QED/Test"):
        assert key in m, key
    assert m["validity"] == pytest.approx(4 / 5)
    assert m["validity_wo_correction"] == pytest.approx(3 / 5)
    assert m["IntDiv"] > 0.0
