"""Layer-level torch parity: every building block, not just full networks.

Mirrors the reference's tests/models/{test_layers, test_attention,
test_hodge_layers, test_hodge_attention}.py but asserts numeric equality
against the actual torch modules instead of only shapes.
"""

import numpy as np
import pytest

from tests.ref_compat import install_reference

HAVE_REF = install_reference()
pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference/torch unavailable")

if HAVE_REF:
    import torch

    torch.manual_seed(0)

import jax
import jax.numpy as jnp

from ccsd_tpu.models.attention import Attention, AttentionLayer
from ccsd_tpu.models.gcn import DenseGCNConv
from ccsd_tpu.models.hodge_nn import (
    BaselineBlock,
    DenseHCNConv,
    HodgeAdjAttentionLayer,
    HodgeAttention,
    HodgeNetworkLayer,
    HodgeBaselineLayer,
)
from ccsd_tpu.models.nn import MLP
from ccsd_tpu.ops.cells import get_spec
from ccsd_tpu.utils.torch_convert import (
    _attention,
    _attention_layer,
    _gcn,
    _hodge_adj_attention_layer,
    _hodge_attention,
    _hodge_baseline_layer,
    _mlp,
)

B, N = 3, 6
SPEC = get_spec(N, 3, 4)
E, K = SPEC.num_edges, SPEC.num_cells


def _np(t):
    return t.detach().numpy()


def _rand_graph(seed=0):
    rng = np.random.default_rng(seed)
    adj = rng.random((B, N, N)).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = ((adj + adj.transpose(0, 2, 1)) > 0.5).astype(np.float32)
    x = rng.random((B, N, 4)).astype(np.float32)
    return x, adj


def test_mlp_parity_multilayer_and_linear():
    from ccsd.src.models.layers import MLP as TMLP

    for layers in (1, 3):
        tm = TMLP(layers, 5, 8, 3)
        tm.eval()
        jm = MLP(layers, 5, 8, 3)
        sd = {k: _np(v) for k, v in tm.state_dict().items()}
        if layers == 1:
            jp = {"linears": [{"w": sd["linear.weight"].T, "b": sd["linear.bias"]}]}
        else:
            jp = {"linears": [
                {"w": sd[f"linears.{i}.weight"].T, "b": sd[f"linears.{i}.bias"]}
                for i in range(layers)
            ]}
        inp = np.random.default_rng(1).random((B, N, 5)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(inp)).numpy()
        ours = np.asarray(jm.apply(jp, jnp.asarray(inp)))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_dense_gcn_conv_parity():
    from ccsd.src.models.layers import DenseGCNConv as TGCN

    x, adj = _rand_graph()
    tm = TGCN(4, 7)
    tm.eval()
    jm = DenseGCNConv(4, 7)
    jp = {"weight": _np(tm.weight), "bias": _np(tm.bias)}
    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(adj)).numpy()
    ours = np.asarray(jm.apply(jp, jnp.asarray(x), jnp.asarray(adj)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_attention_parity_gcn_and_mlp_conv():
    from ccsd.src.models.attention import Attention as TAtt

    x, adj = _rand_graph(2)
    for conv in ("GCN", "MLP"):
        tm = TAtt(4, 8, 6, num_heads=4, conv=conv)
        tm.eval()
        jm = Attention(4, 8, 6, num_heads=4, conv=conv)
        sd_pref = {f"m.{k}": _np(v) for k, v in tm.state_dict().items()}
        jp = _attention(jm, sd_pref, "m")
        with torch.no_grad():
            v_ref, a_ref = tm(torch.tensor(x), torch.tensor(adj), None)
        v, a = jm.apply(jp, jnp.asarray(x), jnp.asarray(adj), None)
        np.testing.assert_allclose(np.asarray(v), v_ref.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a), a_ref.numpy(), atol=1e-5)


def test_attention_layer_parity():
    from ccsd.src.models.attention import AttentionLayer as TAL

    x, adj = _rand_graph(3)
    C = 2
    adjc = np.stack([adj, adj @ adj], axis=1)
    flags = np.ones((B, N), np.float32)
    flags[0, -1] = 0
    tm = TAL(2, 4, 8, 6, C, 3, num_heads=4, conv="GCN")
    tm.eval()
    jm = AttentionLayer(2, 4, 8, 6, C, 3, num_heads=4, conv="GCN")
    sd = {f"m.{k}": _np(v) for k, v in tm.state_dict().items()}
    jp = _attention_layer(jm, sd, "m")
    with torch.no_grad():
        x_ref, a_ref = tm(torch.tensor(x), torch.tensor(adjc), torch.tensor(flags))
    x_o, a_o = jm.apply(jp, jnp.asarray(x), jnp.asarray(adjc), jnp.asarray(flags))
    np.testing.assert_allclose(np.asarray(x_o), x_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_o), a_ref.numpy(), atol=1e-5)


def _rand_cc(seed=4):
    rng = np.random.default_rng(seed)
    hodge = rng.random((B, E, E)).astype(np.float32)
    hodge = (hodge + hodge.transpose(0, 2, 1)) / 2
    rank2 = rng.random((B, E, K)).astype(np.float32)
    return hodge, rank2


def test_dense_hcn_conv_parity():
    from ccsd.src.models.hodge_layers import DenseHCNConv as THCN

    hodge, rank2 = _rand_cc()
    tm = THCN(K, 5)
    tm.eval()
    jm = DenseHCNConv(K, 5)
    jp = {"weight": _np(tm.weight), "bias": _np(tm.bias)}
    with torch.no_grad():
        ref = tm(torch.tensor(hodge), torch.tensor(rank2)).numpy()
    ours = np.asarray(jm.apply(jp, jnp.asarray(hodge), jnp.asarray(rank2)))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-5)


def test_hodge_attention_parity():
    from ccsd.src.models.hodge_attention import HodgeAttention as THA

    hodge, rank2 = _rand_cc(5)
    tm = THA(K, 4, K, num_heads=2, conv="HCN")
    tm.eval()
    jm = HodgeAttention(K, 4, K, num_heads=2, conv="HCN")
    sd = {f"m.{k}": _np(v) for k, v in tm.state_dict().items()}
    jp = _hodge_attention(jm, sd, "m")
    with torch.no_grad():
        v_ref, a_ref = tm(torch.tensor(hodge), torch.tensor(rank2), None)
    v, a = jm.apply(jp, jnp.asarray(hodge), jnp.asarray(rank2), None)
    np.testing.assert_allclose(np.asarray(v), v_ref.numpy(), atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a), a_ref.numpy(), atol=1e-5)


def test_hodge_adj_attention_layer_parity():
    from ccsd.src.models.hodge_attention import HodgeAdjAttentionLayer as THL

    hodge, rank2 = _rand_cc(6)
    C = 2
    hodgec = np.stack([hodge, hodge * 0.5], axis=1)
    flags = np.ones((B, N), np.float32)
    flags[1, 0] = 0
    tm = THL(2, C, 4, 3, N, 3, 4, num_heads=2, conv="HCN")
    tm.eval()
    jm = HodgeAdjAttentionLayer(2, C, 4, 3, SPEC, num_heads=2, conv="HCN")
    sd = {f"m.{k}": _np(v) for k, v in tm.state_dict().items()}
    jp = _hodge_adj_attention_layer(jm, sd, "m")
    with torch.no_grad():
        h_ref, r_ref = tm(torch.tensor(hodgec), torch.tensor(rank2),
                          torch.tensor(flags))
    h, r = jm.apply(jp, jnp.asarray(hodgec), jnp.asarray(rank2),
                    jnp.asarray(flags))
    np.testing.assert_allclose(np.asarray(h), h_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r), r_ref.numpy(), atol=1e-4, rtol=1e-5)


def test_hodge_baseline_layer_parity():
    from ccsd.src.models.hodge_layers import HodgeBaselineLayer as THB

    hodge, rank2 = _rand_cc(7)
    C = 2
    hodgec = np.stack([hodge, hodge * 0.3], axis=1)
    flags = np.ones((B, N), np.float32)
    tm = THB(2, C, 4, 3, N, 3, 4)
    tm.eval()
    jm = HodgeBaselineLayer(2, C, 4, 3, SPEC)
    sd = {f"m.{k}": _np(v) for k, v in tm.state_dict().items()}
    jp = _hodge_baseline_layer(jm, sd, "m")
    with torch.no_grad():
        h_ref, r_ref = tm(torch.tensor(hodgec), torch.tensor(rank2),
                          torch.tensor(flags))
    h, r = jm.apply(jp, jnp.asarray(hodgec), jnp.asarray(rank2),
                    jnp.asarray(flags))
    np.testing.assert_allclose(np.asarray(h), h_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r), r_ref.numpy(), atol=1e-4, rtol=1e-5)


def test_hodge_network_layer_parity():
    from ccsd.src.models.hodge_layers import HodgeNetworkLayer as THN

    _, rank2 = _rand_cc(8)
    C = 2
    rank2c = np.stack([rank2, rank2 * 0.7], axis=1)
    flags = np.ones((B, N), np.float32)
    flags[2, -1] = 0
    tm = THN(2, C, 4, 3, 3, 4)
    tm.eval()
    jm = HodgeNetworkLayer(2, C, 4, 3, SPEC)
    sd = {f"m.layer.{k[len('layer.'):]}": _np(v)
          for k, v in tm.state_dict().items()}
    jp = {"layer": _mlp(jm.layer, sd, "m.layer")}
    with torch.no_grad():
        ref = tm(torch.tensor(rank2c), N, torch.tensor(flags))
    ours = jm.apply(jp, jnp.asarray(rank2c), jnp.asarray(flags))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)
