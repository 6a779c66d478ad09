"""DSM-loss numeric parity vs the PyTorch reference with injected noise.

The losses are stochastic in (t, z); here we fix them and compare the
deterministic remainder of the computation (perturbation, score evaluation,
reduction) between the reference's formulas and ours, using
weight-converted models.
"""

import numpy as np
import pytest

from tests.ref_compat import install_reference

HAVE_REF = install_reference()
pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference/torch unavailable")

if HAVE_REF:
    import torch

    torch.manual_seed(0)

import jax.numpy as jnp

from ccsd_tpu.diffusion.losses import get_score_fn
from ccsd_tpu.diffusion.sde import VPSDE, _bcast
from ccsd_tpu.models.registry import load_model
from ccsd_tpu.ops.cells import get_spec
from ccsd_tpu.ops.masks import mask_adjs, mask_x, node_flags
from ccsd_tpu.utils.torch_convert import convert

B, N, F = 4, 7, 5


def _fixtures():
    rng = np.random.default_rng(3)
    adj = rng.random((B, N, N)).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = ((adj + adj.transpose(0, 2, 1)) > 0.5).astype(np.float32)
    flags = np.ones((B, N), np.float32)
    flags[0, -2:] = 0
    adj *= flags[:, :, None] * flags[:, None, :]
    x = rng.random((B, N, F)).astype(np.float32) * flags[:, :, None]
    t = rng.uniform(0.1, 0.9, B).astype(np.float32)
    z_x = rng.standard_normal((B, N, F)).astype(np.float32) * flags[:, :, None]
    z_adj = np.triu(rng.standard_normal((B, N, N)).astype(np.float32), 1)
    z_adj = z_adj + z_adj.transpose(0, 2, 1)
    z_adj *= flags[:, :, None] * flags[:, None, :]
    return x, adj, flags, t, z_x, z_adj


def test_graph_dsm_loss_matches_reference_formula():
    from ccsd.src.losses import get_score_fn as ref_get_score_fn
    from ccsd.src.sde import VPSDE as RefVPSDE
    from ccsd.src.utils.loader import load_model as ref_load_model

    params_def = dict(model_type="ScoreNetworkX", max_feat_num=F, depth=2,
                      nhid=6, use_bn=False, is_cc=False)
    tm = ref_load_model(params_def)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    jm = load_model(params_def)
    jp = convert(jm, sd)

    x, adj, flags, t, z_x, z_adj = _fixtures()
    ref_sde = RefVPSDE(0.1, 1.0, 100)
    our_sde = VPSDE(N=100, beta_min=0.1, beta_max=1.0)

    # ---- reference side (losses.py:253-274 with fixed z)
    tt = torch.tensor(t)
    mean_x, std_x = ref_sde.marginal_prob(torch.tensor(x), tt)
    pert_x = mean_x + std_x[:, None, None] * torch.tensor(z_x)
    pert_x = pert_x * torch.tensor(flags)[:, :, None]
    mean_a, std_a = ref_sde.marginal_prob(torch.tensor(adj), tt)
    pert_a = mean_a + std_a[:, None, None] * torch.tensor(z_adj)
    pert_a = pert_a * torch.tensor(flags)[:, :, None] * torch.tensor(flags)[:, None, :]
    score_fn = ref_get_score_fn(ref_sde, tm, train=False, continuous=True)
    with torch.no_grad():
        score = score_fn(pert_x, pert_a, torch.tensor(flags), tt)
        losses = torch.square(score * std_x[:, None, None] + torch.tensor(z_x))
        ref_loss = (0.5 * losses.reshape(B, -1).sum(-1)).mean().item()

    # ---- our side, same fixed noise
    jx, jadj, jfl, jt = map(jnp.asarray, (x, adj, flags, t))
    mean_x, std_x = our_sde.marginal_prob(jx, jt)
    pert_x = mask_x(mean_x + _bcast(std_x, jx) * jnp.asarray(z_x), jfl)
    mean_a, std_a = our_sde.marginal_prob(jadj, jt)
    pert_a = mask_adjs(mean_a + _bcast(std_a, jadj) * jnp.asarray(z_adj), jfl)
    sfn = get_score_fn(our_sde, jm, jp)
    score = sfn(pert_x, pert_a, jfl, jt)
    our_loss = float(
        (0.5 * jnp.square(score * _bcast(std_x, score) + jnp.asarray(z_x))
         .reshape(B, -1).sum(-1)).mean()
    )
    assert our_loss == pytest.approx(ref_loss, rel=1e-4)


def test_node_flags_match_reference():
    from ccsd.src.utils.graph_utils import node_flags as ref_node_flags

    _, adj, *_ = _fixtures()
    ref = ref_node_flags(torch.tensor(adj)).numpy()
    ours = np.asarray(node_flags(jnp.asarray(adj)))
    np.testing.assert_array_equal(ref, ours)


def test_model_params_marshalling_matches_reference():
    """load_model_params produces the same dicts as the reference's."""
    from ccsd.src.utils.loader import load_model_params as ref_lmp

    from ccsd_tpu.models.registry import load_model_params as our_lmp
    from ccsd_tpu.utils.config import AttrDict

    import yaml

    for name, is_cc in [("community_small", False), ("community_small_CC", True),
                        ("qm9_CC", True), ("community_small_Base_CC", True)]:
        raw = yaml.safe_load(
            open(f"/root/reference/config/{name}.yaml")
        )
        cfg = AttrDict(raw)
        ref_out = ref_lmp(cfg, is_cc=is_cc)
        our_out = our_lmp(cfg, is_cc=is_cc)
        assert len(ref_out) == len(our_out)
        for r, o in zip(ref_out, our_out):
            assert dict(r) == dict(o), name
