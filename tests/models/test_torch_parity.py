"""Per-layer activation parity against the PyTorch reference.

For every score-network family we build the torch reference model and our
JAX model with identical hyperparameters, copy the torch weights through
`ccsd_tpu.utils.torch_convert.convert`, feed both the same inputs and demand
allclose outputs.  Additionally the shipped pretrained checkpoints
(/root/reference/checkpoints) are loaded as end-to-end oracles.
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

from ccsd_tpu.models.registry import load_model
from ccsd_tpu.utils.torch_convert import convert

B, N, F = 3, 7, 5
D_MIN, D_MAX = 3, 4


def _inputs(seed=0, n=N, f=F, d_min=D_MIN, d_max=D_MAX):
    from ccsd_tpu.ops.cells import get_spec

    rng = np.random.default_rng(seed)
    spec = get_spec(n, d_min, d_max)
    adj = rng.random((B, n, n)).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = ((adj + adj.transpose(0, 2, 1)) > 0.6).astype(np.float32)
    flags = np.ones((B, n), np.float32)
    flags[0, -2:] = 0.0
    adj *= flags[:, :, None] * flags[:, None, :]
    x = (rng.random((B, n, f)).astype(np.float32)) * flags[:, :, None]
    rank2 = rng.standard_normal((B, spec.num_edges, spec.num_cells)).astype(np.float32)
    return x, adj, rank2, flags


def _torch_model(name, params):
    from ccsd.src.utils.loader import load_model as ref_load_model

    model = ref_load_model({**params, "model_type": name})
    model.eval()
    return model


def _compare(name, params, use_rank2, atol=2e-5):
    x, adj, rank2, flags = _inputs()
    tm = _torch_model(name, params)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    jm = load_model({**params, "model_type": name})
    jp = convert(jm, sd)

    with torch.no_grad():
        if use_rank2:
            ref = tm.forward(
                torch.tensor(x), torch.tensor(adj), torch.tensor(rank2),
                torch.tensor(flags),
            )
        else:
            ref = tm.forward(torch.tensor(x), torch.tensor(adj), torch.tensor(flags))
    ours = jm.apply(jp, jnp.asarray(x), jnp.asarray(adj), jnp.asarray(rank2),
                    flags=jnp.asarray(flags))
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy(), atol=atol, rtol=1e-4,
        err_msg=f"{name} forward mismatch",
    )


def test_score_network_x():
    _compare(
        "ScoreNetworkX",
        dict(max_feat_num=F, depth=3, nhid=8, use_bn=False, is_cc=False),
        use_rank2=False,
    )


def test_score_network_x_gmh():
    _compare(
        "ScoreNetworkX_GMH",
        dict(max_feat_num=F, depth=3, nhid=8, num_linears=2, c_init=2, c_hid=4,
             c_final=3, adim=8, num_heads=4, conv="GCN", use_bn=False, is_cc=False),
        use_rank2=False,
    )


def test_score_network_a():
    _compare(
        "ScoreNetworkA",
        dict(max_feat_num=F, max_node_num=N, nhid=8, num_layers=3, num_linears=2,
             c_init=2, c_hid=4, c_final=3, adim=8, num_heads=4, conv="GCN",
             use_bn=False, is_cc=False),
        use_rank2=False,
    )


def test_score_network_f():
    _compare(
        "ScoreNetworkF",
        dict(num_layers_mlp=2, num_layers=3, num_linears=2, nhid=4, c_hid=3,
             c_final=2, cnum=2, max_node_num=N, d_min=D_MIN, d_max=D_MAX,
             use_hodge_mask=True, use_bn=False, is_cc=True),
        use_rank2=True,
    )


def test_score_network_a_cc():
    _compare(
        "ScoreNetworkA_CC",
        dict(max_feat_num=F, max_node_num=N, d_min=D_MIN, d_max=D_MAX, nhid=8,
             nhid_h=4, num_layers=2, num_layers_h=2, num_linears=2,
             num_linears_h=2, c_init=2, c_hid=4, c_hid_h=3, c_final=3,
             c_final_h=2, adim=8, adim_h=4, num_heads=4, num_heads_h=2,
             conv="GCN", conv_hodge="HCN", use_bn=False, is_cc=True),
        use_rank2=True,
        atol=5e-5,
    )


def test_score_network_a_base_cc():
    _compare(
        "ScoreNetworkA_Base_CC",
        dict(max_feat_num=F, max_node_num=N, d_min=D_MIN, d_max=D_MAX, nhid=8,
             nhid_h=4, num_layers=2, num_layers_h=2, num_linears=2,
             num_linears_h=2, c_init=2, c_hid=4, c_hid_h=3, c_final=3,
             c_final_h=2, adim=8, hidden_h=6, num_heads=4, conv="GCN",
             use_bn=False, is_cc=True),
        use_rank2=True,
        atol=5e-5,
    )


def test_shipped_checkpoint_community_small():
    """End-to-end oracle: shipped gdss_community_small.pth forward parity."""
    import os

    path = "/root/reference/checkpoints/community_small/gdss_community_small.pth"
    if not os.path.exists(path):
        pytest.skip("shipped checkpoint missing")
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params_x = dict(ckpt["params_x"])
    params_adj = dict(ckpt["params_adj"])

    from ccsd.src.utils.loader import load_model_from_ckpt as ref_load_from_ckpt

    tmx = ref_load_from_ckpt(ckpt["params_x"], ckpt["x_state_dict"], "cpu")
    tma = ref_load_from_ckpt(ckpt["params_adj"], ckpt["adj_state_dict"], "cpu")
    tmx.eval(), tma.eval()

    n = params_adj["max_node_num"]
    f = params_x["max_feat_num"]
    x, adj, _, flags = _inputs(seed=1, n=n, f=f)

    jmx = load_model(params_x)
    jma = load_model(params_adj)
    sdx = {k: v.detach().numpy() for k, v in tmx.state_dict().items()}
    sda = {k: v.detach().numpy() for k, v in tma.state_dict().items()}
    jpx = convert(jmx, sdx)
    jpa = convert(jma, sda)

    with torch.no_grad():
        ref_x = tmx.forward(torch.tensor(x), torch.tensor(adj), torch.tensor(flags))
        ref_a = tma.forward(torch.tensor(x), torch.tensor(adj), torch.tensor(flags))
    our_x = jmx.apply(jpx, jnp.asarray(x), jnp.asarray(adj), flags=jnp.asarray(flags))
    our_a = jma.apply(jpa, jnp.asarray(x), jnp.asarray(adj), flags=jnp.asarray(flags))
    np.testing.assert_allclose(np.asarray(our_x), ref_x.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(our_a), ref_a.numpy(), atol=1e-4, rtol=1e-3)


def test_baseline_network():
    """GDSS BaselineNetwork: not in the reference's registry (loader.py:85-100)
    but shipped in its codebase; constructed directly."""
    from ccsd.src.models.ScoreNetwork_A import BaselineNetwork as TBaseline

    params = dict(max_feat_num=F, max_node_num=N, nhid=8, num_layers=3,
                  num_linears=2, c_init=2, c_hid=4, c_final=3, adim=8,
                  num_heads=4, conv="GCN", use_bn=False, is_cc=False)
    x, adj, _, flags = _inputs()
    tm = TBaseline(**params)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    jm = load_model({**params, "model_type": "BaselineNetwork"})
    jp = convert(jm, sd)
    with torch.no_grad():
        ref = tm.forward(torch.tensor(x), torch.tensor(adj), torch.tensor(flags))
    ours = jm.apply(jp, jnp.asarray(x), jnp.asarray(adj),
                    flags=jnp.asarray(flags))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5,
                               rtol=1e-4)
