"""K-axis (cell) sharding equivalence vs the dense path.

The decisive shape is ego_small_CC scale (E=153, K=12444 — the config the
reference cannot run at all, SURVEY.md §2.6): K splits 8 ways so per-chip
rank-2 memory is O(E*K/8), and the sharded ScoreNetworkF forward must equal
the dense single-device forward exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from ccsd_tpu.models.hodge_nn import HodgeAttention
from ccsd_tpu.models.registry import load_model
from ccsd_tpu.ops.hodge import default_mask, pow_tensor_cc
from ccsd_tpu.parallel.kaxis import (
    hodge_attention_ksharded,
    pad_cells,
    pow_slabs_ksharded,
    score_f_apply_ksharded,
)

P_CELLS = 8


def _mesh():
    devs = np.array(jax.devices()[:P_CELLS])
    return Mesh(devs, ("cell",))


def _rank2(key, B, E, K):
    return jax.random.normal(key, (B, E, K))


def test_pow_slabs_ksharded_matches_dense():
    B, E, K, CNUM = 2, 10, 48, 3
    r2 = _rank2(jax.random.PRNGKey(0), B, E, K)
    mask = default_mask(E)
    dense = pow_tensor_cc(r2, CNUM, mask)  # (B, CNUM, E, K)

    mesh = _mesh()
    f = jax.shard_map(
        lambda r: jnp.stack(
            pow_slabs_ksharded(r, CNUM, "cell", mask), axis=1
        ),
        mesh=mesh,
        in_specs=P(None, None, "cell"),
        out_specs=P(None, None, None, "cell"),
        check_vma=False,
    )
    out = f(r2)
    # psum reduction order differs from the dense dot, so H (and H^2 F)
    # carry float32 noise ~1e-5 relative on O(50) magnitudes
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=1e-4, atol=2e-3)


def test_hodge_attention_ksharded_matches_dense():
    B, E, K, A, HEADS = 2, 12, 24, 8, 2
    attn = HodgeAttention(K, A, K, num_heads=HEADS, conv="HCN")
    params = attn.init(jax.random.PRNGKey(1))
    ha = jax.random.normal(jax.random.PRNGKey(2), (B, E, E))
    ha = (ha + jnp.swapaxes(ha, -1, -2)) / 2
    r2 = _rank2(jax.random.PRNGKey(3), B, E, K)

    v_ref, a_ref = attn.apply(params, ha, r2, flags=None)

    mesh = _mesh()
    f = jax.shard_map(
        lambda h, r: hodge_attention_ksharded(
            params, h, r, "cell", num_heads=HEADS, attn_dim=A, out_dim=K,
        ),
        mesh=mesh,
        in_specs=(P(), P(None, None, "cell")),
        out_specs=(P(None, None, "cell"), P()),
        check_vma=False,
    )
    v, a = f(ha, r2)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_score_f_ksharded_ego_small_scale():
    """Full ScoreNetworkF forward at ego_small_CC scale: K=12444 split 8
    ways (padded to 12448), per-chip columns 1556 — a shape whose dense
    (B, C, E, K) channel tensors the reference materializes on ONE device.
    Equality vs our dense fused path, padded columns masked to zero."""
    N, D_MIN, D_MAX = 18, 3, 5  # E=153, K=12444
    model = load_model(dict(
        model_type="ScoreNetworkF", num_layers_mlp=1, num_layers=2,
        num_linears=1, nhid=4, c_hid=2, c_final=2, cnum=2, max_node_num=N,
        d_min=D_MIN, d_max=D_MAX, use_hodge_mask=True, use_bn=False,
        is_cc=True, fused=True,
    ))
    spec = model.spec
    assert spec.num_cells == 12444
    params = model.init(jax.random.PRNGKey(0))
    B = 2
    r2 = _rank2(jax.random.PRNGKey(1), B, spec.num_edges, spec.num_cells)
    flags = jnp.ones((B, N))

    dense = model.apply(params, None, None, r2, flags=flags)

    r2_pad = pad_cells(r2, P_CELLS)
    mesh = _mesh()
    f = jax.shard_map(
        lambda r: score_f_apply_ksharded(model, params, r, flags, "cell"),
        mesh=mesh,
        in_specs=P(None, None, "cell"),
        out_specs=P(None, None, "cell"),
        check_vma=False,
    )
    out = f(r2_pad)
    assert out.shape[-1] == 12448
    np.testing.assert_allclose(
        np.asarray(out[..., :spec.num_cells]), np.asarray(dense),
        rtol=1e-3, atol=5e-3,
    )
    # padded columns are masked to zero
    assert float(jnp.abs(out[..., spec.num_cells:]).max()) == 0.0
