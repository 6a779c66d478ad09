"""Parity of the fused-path lowering variants (scores_impl / agg_impl /
final_impl) against the canonical fused ScoreNetworkA.

The variants reorder/retile the same contractions (see
tools/fastpath_probe.py for the on-chip timings that motivated them); all
f32 variants must agree to float tolerance, the bf16 ones to bf16 tolerance.
Parity target of the canonical path itself: tests/models/test_fused_attention.py
(vs ccsd/src/models/ScoreNetwork_A.py:348-561).
"""

import jax
import jax.numpy as jnp
import pytest

from ccsd_tpu.models.registry import load_model

BASE = dict(model_type="ScoreNetworkA", max_feat_num=6, max_node_num=12,
            nhid=16, num_layers=3, num_linears=2, c_init=2, c_hid=4,
            c_final=3, adim=16, num_heads=4, conv="GCN", use_bn=False,
            is_cc=False, fused=True)


def _inputs(key):
    kx, ka, kf = jax.random.split(key, 3)
    x = jax.random.normal(kx, (5, 12, 6))
    a = jax.random.normal(ka, (5, 12, 12))
    a = (a + a.transpose(0, 2, 1)) / 2
    flags = (jax.random.uniform(kf, (5, 12)) > 0.2).astype(jnp.float32)
    return x, a, flags


@pytest.mark.parametrize(
    "variant,tol",
    [
        (dict(scores_impl="mulreduce_h"), 1e-5),
        (dict(scores_impl="dot"), 1e-4),
        (dict(final_impl="blocksum"), 1e-5),
        (dict(scores_impl="mulreduce_h", final_impl="blocksum"), 1e-5),
        (dict(scores_impl="mulreduce_h_bf16"), 5e-2),
        (dict(agg_impl="dot"), 1e-4),
    ],
)
def test_variant_matches_baseline(variant, tol):
    base = load_model(BASE)
    params = base.init(jax.random.PRNGKey(0))
    x, a, flags = _inputs(jax.random.PRNGKey(1))
    ref = base.apply(params, x, a, flags=flags)
    out = load_model({**BASE, **variant}).apply(params, x, a, flags=flags)
    assert jnp.max(jnp.abs(out - ref)) < tol
    # masking semantics preserved
    assert jnp.allclose(out * (1 - flags[:, :, None] * flags[:, None, :]), 0)
