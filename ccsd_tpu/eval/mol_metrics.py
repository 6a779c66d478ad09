"""Molecule generation metrics: validity, uniqueness, novelty, FCD, NSPDK.

The reference calls MOSES `get_all_metrics` (sampler.py:850-857); MOSES is
not available here, so the core metrics are implemented natively on RDKit
primitives with the same definitions:

  * validity           — fraction of generated molecules RDKit can sanitize
                         (gen_mol already filters; validity w/o correction is
                         tracked separately via num_no_correct);
  * unique@k           — fraction of unique canonical SMILES among first k;
  * novelty            — fraction of unique valid SMILES not in train set;
  * FCD                — requires the pretrained ChemNet weights of the `fcd`
                         package; gated (returns None when unavailable);
  * SNN / Frag / Scaf  — MOSES similarity metrics vs the test set, computed
                         natively on the chem kernel's Morgan fingerprints,
                         BRICS-lite fragments and Bemis-Murcko scaffolds
                         (ccsd_tpu.chem.fingerprints);
  * IntDiv / IntDiv2   — internal diversity over the generated set's
                         pairwise Tanimoto matrix (p=1 / p=2);
  * Filters            — fraction passing the Filters-lite screen
                         (chem.properties.passes_filters: allowed atoms,
                         neutral charge, ring size — MCF/PAINS SMARTS
                         screens documented as excluded);
  * logP / weight      — 1-D Wasserstein distances of the generated vs
                         test property distributions (native Crippen-class
                         logP + exact molecular weight);
  * SA / QED           — documented exclusions (`None`): both require
                         RDKit-only data assets (the SA fragment-score
                         pickle / QED descriptor models) that cannot be
                         re-derived offline;
  * NSPDK MMD          — via ccsd_tpu.eval.mmd.compute_nspdk_mmd.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence


def canonical_smiles(mols) -> List[str]:
    from ccsd_tpu.data.mol_utils import mols_to_smiles

    return [
        s for s in mols_to_smiles([m for m in mols if m is not None]) if s
    ]


def fraction_valid(mols, n_generated: int) -> float:
    return len([m for m in mols if m is not None]) / max(1, n_generated)


def fraction_unique(smiles: Sequence[str], k: Optional[int] = None) -> float:
    s = list(smiles)
    if k is not None:
        s = s[:k]
    return len(set(s)) / max(1, len(s))


def novelty(smiles: Sequence[str], train_smiles: Sequence[str]
            ) -> Optional[float]:
    """Fraction of unique generated SMILES absent from the train set;
    None when no train set is available (e.g. raw csv blob missing)."""
    gen = set(smiles)
    train = set(train_smiles)
    if not train:
        return None
    if not gen:
        return 0.0
    return len(gen - train) / len(gen)


def fcd_score(smiles: Sequence[str], ref_smiles: Sequence[str]) -> Optional[float]:
    """FCD via the `fcd` package when installed, else the native JAX
    ChemNet path (ccsd_tpu.eval.fcd) gated only on the pretrained weights
    blob ($CCSD_CHEMNET_WEIGHTS); None when neither is available."""
    try:
        import fcd  # noqa: F401

        return float(fcd.get_fcd(list(smiles), list(ref_smiles)))
    except ImportError:
        pass
    from ccsd_tpu.eval.fcd import fcd_score_native

    return fcd_score_native(smiles, ref_smiles)


def snn_frag_scaf(gen_mols, test_smiles: Sequence[str]
                  ) -> Dict[str, Optional[float]]:
    """MOSES SNN / Frag / Scaf of generated molecules vs the test set.

    Both sides run through the chem kernel (test SMILES are parsed with
    chem.from_smiles), so the fingerprints/fragments/scaffolds are computed
    by one implementation.  Reference emits these via MOSES
    get_all_metrics (sampler.py:850-857).
    """
    from ccsd_tpu.chem import from_smiles
    from ccsd_tpu.chem.fingerprints import (
        frag_similarity,
        scaf_similarity,
        snn_similarity,
    )

    gen = [m for m in gen_mols if m is not None]
    ref = [m for m in (from_smiles(s) for s in test_smiles) if m is not None]
    if not gen or not ref:
        return {"SNN/Test": None, "Frag/Test": None, "Scaf/Test": None}
    return {
        "SNN/Test": snn_similarity(gen, ref),
        "Frag/Test": frag_similarity(gen, ref),
        "Scaf/Test": scaf_similarity(gen, ref),
    }


def wasserstein_1d(a: Sequence[float], b: Sequence[float]
                   ) -> Optional[float]:
    """1-D Wasserstein-1 distance between two empirical distributions
    (the metric MOSES reports for property distances), computed from the
    quantile-function integral."""
    import numpy as np

    a = np.sort(np.asarray(list(a), dtype=np.float64))
    b = np.sort(np.asarray(list(b), dtype=np.float64))
    if a.size == 0 or b.size == 0:
        return None
    q = np.linspace(0.0, 1.0, 2049)[1:-1]  # interior quantiles
    qa = np.quantile(a, q)
    qb = np.quantile(b, q)
    return float(np.abs(qa - qb).mean())


def property_distances(gen_mols, test_smiles: Sequence[str]
                       ) -> Dict[str, Optional[float]]:
    """MOSES property block: Wasserstein distances of logP and molecular
    weight, plus the Filters pass fraction.  SA/QED are documented
    exclusions (module docstring)."""
    from ccsd_tpu.chem import from_smiles
    from ccsd_tpu.chem.properties import (
        crippen_logp,
        molecular_weight,
        passes_filters,
    )

    gen = [m for m in gen_mols if m is not None]
    ref = [m for m in (from_smiles(s) for s in test_smiles) if m is not None]
    out: Dict[str, Optional[float]] = {
        "logP/Test": None, "weight/Test": None, "Filters": None,
        "SA/Test": None, "QED/Test": None,  # documented exclusions
    }
    if not gen or not ref:
        return out
    out["logP/Test"] = wasserstein_1d(
        [crippen_logp(m) for m in gen], [crippen_logp(m) for m in ref])
    out["weight/Test"] = wasserstein_1d(
        [molecular_weight(m) for m in gen],
        [molecular_weight(m) for m in ref])
    out["Filters"] = sum(passes_filters(m) for m in gen) / len(gen)
    return out


def get_all_metrics(
    gen_mols,
    n_generated: int,
    train_smiles: Sequence[str],
    test_smiles: Sequence[str],
    num_no_correct: int = 0,
) -> Dict[str, Optional[float]]:
    """MOSES-like metric dict for a batch of generated molecules.

    Key-comparable to MOSES ``get_all_metrics`` (reference
    sampler.py:850-857) with documented exceptions: SA/QED are always
    None (RDKit-only data assets), FCD/Test is None without the
    pretrained ChemNet blob."""
    from ccsd_tpu.chem.fingerprints import internal_diversity

    smiles = canonical_smiles(gen_mols)
    k_list = [1000, 10000]
    metrics: Dict[str, Optional[float]] = {
        "validity": fraction_valid(gen_mols, n_generated),
        "validity_wo_correction": num_no_correct / max(1, n_generated),
        "uniqueness": fraction_unique(smiles),
        "novelty": novelty(smiles, train_smiles),
        "FCD/Test": fcd_score(smiles, test_smiles),
    }
    metrics.update(snn_frag_scaf(gen_mols, test_smiles))
    valid = [m for m in gen_mols if m is not None]
    metrics["IntDiv"] = internal_diversity(valid, p=1)
    metrics["IntDiv2"] = internal_diversity(valid, p=2)
    metrics.update(property_distances(gen_mols, test_smiles))
    for k in k_list:
        if len(smiles) >= k:
            metrics[f"unique@{k}"] = fraction_unique(smiles, k)
    return metrics
