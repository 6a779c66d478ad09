"""Native FCD machinery tests.

Pins the ChemNet building blocks against torch (whose GRU implements the
same cuDNN/reset_after=True equations as the Keras ChemNet) and the Fréchet
distance against scipy.linalg.sqrtm and closed-form cases.  The pretrained
weights blob itself is unobtainable here (reference emits FCD via MOSES,
sampler.py:850-857); these tests verify everything up to that blob.
"""

import numpy as np
import pytest
import torch

from ccsd_tpu.eval.fcd import (
    FCD_TOKENS,
    activation_stats,
    chemnet_forward,
    chemnet_weights_status,
    conv1d,
    fcd_from_activations,
    fcd_score_native,
    featurize_smiles,
    frechet_distance,
    gru_scan,
    load_chemnet,
    tokenize_smiles,
)

rng = np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Fréchet distance
# ---------------------------------------------------------------------------


def _rand_cov(d, seed):
    r = np.random.default_rng(seed)
    a = r.normal(size=(d, d))
    return a @ a.T + 0.1 * np.eye(d)


def test_frechet_identical_gaussians_is_zero():
    mu = rng.normal(size=8)
    s = _rand_cov(8, 1)
    assert frechet_distance(mu, s, mu, s) == pytest.approx(0.0, abs=1e-8)


def test_frechet_diagonal_closed_form():
    # diagonal covariances: d^2 = |dmu|^2 + sum (sqrt(s1)-sqrt(s2))^2
    mu1, mu2 = np.array([1.0, -2.0]), np.array([0.0, 1.0])
    d1, d2 = np.array([4.0, 9.0]), np.array([1.0, 16.0])
    expect = np.sum((mu1 - mu2) ** 2) + np.sum(
        (np.sqrt(d1) - np.sqrt(d2)) ** 2
    )
    got = frechet_distance(mu1, np.diag(d1), mu2, np.diag(d2))
    assert got == pytest.approx(expect, rel=1e-12)


def test_frechet_matches_scipy_sqrtm():
    from scipy import linalg

    d = 6
    mu1, mu2 = rng.normal(size=d), rng.normal(size=d)
    s1, s2 = _rand_cov(d, 2), _rand_cov(d, 3)
    covmean = linalg.sqrtm(s1 @ s2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    expect = (mu1 - mu2) @ (mu1 - mu2) + np.trace(
        s1 + s2 - 2.0 * covmean
    )
    assert frechet_distance(mu1, s1, mu2, s2) == pytest.approx(
        float(expect), rel=1e-8
    )


def test_frechet_rank_deficient_sample_cov():
    # fewer samples than dims → singular covariance must not crash
    a1 = rng.normal(size=(5, 16))
    a2 = rng.normal(size=(6, 16)) + 1.0
    d = fcd_from_activations(a1, a2)
    assert np.isfinite(d) and d > 0


def test_activation_stats_shapes():
    mu, s = activation_stats(rng.normal(size=(100, 4)))
    assert mu.shape == (4,) and s.shape == (4, 4)
    assert np.allclose(s, s.T)


# ---------------------------------------------------------------------------
# Featurization
# ---------------------------------------------------------------------------


def test_tokenize_two_char_and_unknown():
    idx = {t: i for i, t in enumerate(FCD_TOKENS)}
    assert tokenize_smiles("CCl") == [idx["C"], idx["Cl"]]
    assert tokenize_smiles("BrSi") == [idx["Br"], idx["Si"]]
    assert tokenize_smiles("C%C") == [idx["C"], idx["X"], idx["C"]]
    # lone 'l' never appears outside Cl in valid SMILES; unknown → X
    assert tokenize_smiles("l") == [idx["X"]]


def test_featurize_one_hot_and_padding():
    x = featurize_smiles(["CO", "c1ccccc1"], pad_len=12)
    assert x.shape == (2, 12, len(FCD_TOKENS))
    assert x[0].sum() == 3  # two tokens + '.' terminator, rest zero-padded
    assert x[1].sum() == 9
    assert np.all(x[0, 3:].sum(axis=-1) == 0)


def test_featurize_appends_end_token():
    # fcd.utils.get_one_hot appends '.' to every SMILES before encoding
    idx = {t: i for i, t in enumerate(FCD_TOKENS)}
    x = featurize_smiles(["CO"], pad_len=8)
    assert x[0, 2, idx["."]] == 1.0
    assert x[0, 2].sum() == 1.0


def test_featurize_rejects_too_long_smiles():
    import pytest

    with pytest.raises(ValueError, match="pad_len"):
        featurize_smiles(["C" * 12], pad_len=12)  # 12 + '.' > 12
    # exactly fitting (incl. terminator) is fine
    assert featurize_smiles(["C" * 11], pad_len=12).shape == (1, 12, 35)


def test_gru_reset_after_false_matches_numpy_reference():
    """Legacy Keras (1-D bias) gate order: n = tanh(xWn + (r*h) Whn)."""
    B, T, Cin, H = 3, 7, 5, 4
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)
    wi = rng.normal(size=(Cin, 3 * H)).astype(np.float32)
    wh = rng.normal(size=(H, 3 * H)).astype(np.float32)
    bi = rng.normal(size=3 * H).astype(np.float32)

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    h = np.zeros((B, H), np.float32)
    whr, whz, whn = wh[:, :H], wh[:, H : 2 * H], wh[:, 2 * H :]
    for t in range(T):
        xp = x[:, t] @ wi + bi
        xr, xz, xn = xp[:, :H], xp[:, H : 2 * H], xp[:, 2 * H :]
        r = sigmoid(xr + h @ whr)
        z = sigmoid(xz + h @ whz)
        n = np.tanh(xn + (r * h) @ whn)
        h = (1 - z) * n + z * h

    got = np.asarray(
        gru_scan(x, wi, wh, bi, np.zeros(3 * H, np.float32),
                 reset_after=False)
    )
    np.testing.assert_allclose(got, h, atol=1e-5)
    # and it must DIFFER from the reset_after=True math on the same weights
    ra = np.asarray(gru_scan(x, wi, wh, bi, np.zeros(3 * H, np.float32)))
    assert np.abs(ra - h).max() > 1e-3


# ---------------------------------------------------------------------------
# ChemNet ops vs torch
# ---------------------------------------------------------------------------


def test_conv1d_matches_torch():
    B, T, Cin, Cout, k = 3, 20, 7, 5, 4
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)
    tconv = torch.nn.Conv1d(Cin, Cout, k)
    w = tconv.weight.detach().numpy()  # (Cout, Cin, k)
    b = tconv.bias.detach().numpy()
    want = tconv(torch.tensor(x).transpose(1, 2)).transpose(1, 2)
    got = conv1d(x, np.transpose(w, (2, 1, 0)), b)
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy(), atol=1e-5
    )


def test_gru_matches_torch():
    B, T, Cin, H = 4, 15, 6, 9
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)
    tgru = torch.nn.GRU(Cin, H, batch_first=True)
    _, hn = tgru(torch.tensor(x))
    sd = {k: v.detach().numpy() for k, v in tgru.state_dict().items()}
    got = gru_scan(
        x,
        sd["weight_ih_l0"].T,
        sd["weight_hh_l0"].T,
        sd["bias_ih_l0"],
        sd["bias_hh_l0"],
    )
    np.testing.assert_allclose(
        np.asarray(got), hn[0].detach().numpy(), atol=1e-5
    )


def test_gru_mask_freezes_padding():
    B, T, Cin, H = 2, 10, 4, 5
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)
    lens = [6, 10]
    mask = np.zeros((B, T), bool)
    for i, L in enumerate(lens):
        mask[i, :L] = True
    wi = rng.normal(size=(Cin, 3 * H)).astype(np.float32)
    wh = rng.normal(size=(H, 3 * H)).astype(np.float32)
    bi = rng.normal(size=3 * H).astype(np.float32)
    bh = rng.normal(size=3 * H).astype(np.float32)
    padded = np.asarray(gru_scan(x, wi, wh, bi, bh, mask=mask))
    for i, L in enumerate(lens):
        solo = np.asarray(gru_scan(x[i : i + 1, :L], wi, wh, bi, bh))
        np.testing.assert_allclose(padded[i], solo[0], atol=1e-5)


def test_chemnet_stack_matches_torch_model():
    """Full conv→relu→GRU→dense stack equals the torch forward."""
    B, T, Cin, C1, H, D = 3, 30, len(FCD_TOKENS), 8, 12, 6
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)
    x[np.abs(x) < 1e-3] += 1.0  # keep every timestep mask-valid

    conv = torch.nn.Conv1d(Cin, C1, 5)
    gru = torch.nn.GRU(C1, H, batch_first=True)
    dense = torch.nn.Linear(H, D)
    with torch.no_grad():
        h = torch.relu(conv(torch.tensor(x).transpose(1, 2))).transpose(1, 2)
        _, hn = gru(h)
        want = torch.tanh(dense(hn[0])).numpy()

    gsd = {k: v.detach().numpy() for k, v in gru.state_dict().items()}
    params = [
        {
            "kind": "conv1d",
            "w": np.transpose(conv.weight.detach().numpy(), (2, 1, 0)),
            "b": conv.bias.detach().numpy(),
            "activation": "relu",
        },
        {
            "kind": "gru",
            "wi": gsd["weight_ih_l0"].T,
            "wh": gsd["weight_hh_l0"].T,
            "bi": gsd["bias_ih_l0"],
            "bh": gsd["bias_hh_l0"],
        },
        {
            "kind": "dense",
            "w": dense.weight.detach().numpy().T,
            "b": dense.bias.detach().numpy(),
            "activation": "tanh",
        },
    ]
    got = chemnet_forward(params, x)
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------
# Gating + end-to-end with a synthetic weights file
# ---------------------------------------------------------------------------


def test_fcd_gates_without_weights(monkeypatch):
    monkeypatch.delenv("CCSD_CHEMNET_WEIGHTS", raising=False)
    assert fcd_score_native(["CCO"], ["CCN"]) is None
    assert "weights" in chemnet_weights_status()


def _write_keras_h5(path, layers):
    """Minimal Keras-format .h5: model_config JSON attr + model_weights
    groups (the duplicated-name nesting Keras writes)."""
    import json

    import h5py

    cfgs = []
    with h5py.File(path, "w") as f:
        wroot = f.create_group("model_weights")
        for cls, name, cfg, weights in layers:
            cfgs.append({"class_name": cls, "config": {"name": name, **cfg}})
            g = wroot.create_group(name).create_group(name)
            for k, v in weights.items():
                g.create_dataset(k, data=v)
        f.attrs["model_config"] = json.dumps(
            {"class_name": "Sequential", "config": {"layers": cfgs}})


def test_fcd_end_to_end_with_synthetic_keras_h5(tmp_path, monkeypatch):
    """load→featurize→forward→Fréchet runs green from a Keras-shaped .h5
    (VERDICT r3 next #9), including the reset_after tagging for both GRU
    bias layouts."""
    rng_l = np.random.default_rng(7)
    Cin, C1, H, D = len(FCD_TOKENS), 6, 10, 4
    path = tmp_path / "chemnet.h5"
    _write_keras_h5(path, [
        ("InputLayer", "input", {}, {}),
        ("Conv1D", "conv", {"strides": [1], "activation": "relu"},
         {"kernel:0": rng_l.normal(size=(4, Cin, C1)).astype(np.float32) * .1,
          "bias:0": np.zeros(C1, np.float32)}),
        ("GRU", "gru_modern", {},
         {"kernel:0": rng_l.normal(size=(C1, 3 * H)).astype(np.float32) * .1,
          "recurrent_kernel:0":
              rng_l.normal(size=(H, 3 * H)).astype(np.float32) * .1,
          "bias:0": np.zeros((2, 3 * H), np.float32)}),   # reset_after=True
        ("Dense", "dense", {"activation": "tanh"},
         {"kernel:0": rng_l.normal(size=(H, D)).astype(np.float32) * .1,
          "bias:0": np.zeros(D, np.float32)}),
    ])
    params = load_chemnet(str(path))
    assert params is not None
    assert [p["kind"] for p in params] == ["conv1d", "gru", "dense"]
    assert params[1]["reset_after"] is True

    monkeypatch.setenv("CCSD_CHEMNET_WEIGHTS", str(path))
    gen = ["CCO", "CCN", "c1ccccc1", "CC(=O)O", "CCCC"]
    ref = ["CCO", "COC", "c1ccncc1", "CC(N)=O", "CCC"]
    score = fcd_score_native(gen, ref)
    assert score is not None and np.isfinite(score) and score >= 0
    assert fcd_score_native(gen, gen) == pytest.approx(0.0, abs=1e-6)

    # legacy 1-D-bias GRU is tagged reset_after=False and evaluates
    path2 = tmp_path / "chemnet_legacy.h5"
    _write_keras_h5(path2, [
        ("GRU", "gru_legacy", {},
         {"kernel:0": rng_l.normal(size=(Cin, 3 * H)).astype(np.float32) * .1,
          "recurrent_kernel:0":
              rng_l.normal(size=(H, 3 * H)).astype(np.float32) * .1,
          "bias:0": np.zeros(3 * H, np.float32)}),        # 1-D bias
    ])
    params2 = load_chemnet(str(path2))
    assert params2 is not None and params2[0]["reset_after"] is False
    s2 = fcd_score_native(gen, ref, weights_path=str(path2))
    assert s2 is not None and np.isfinite(s2)


def test_fcd_end_to_end_with_synthetic_state_dict(tmp_path, monkeypatch):
    C1, H = 8, 16
    model = torch.nn.ModuleDict(
        {
            "conv1": torch.nn.Conv1d(len(FCD_TOKENS), C1, 4),
            "gru1": torch.nn.GRU(C1, H, batch_first=True),
        }
    )
    path = tmp_path / "chemnet.pt"
    torch.save(model.state_dict(), path)
    params = load_chemnet(str(path))
    assert params is not None
    assert [p["kind"] for p in params] == ["conv1d", "gru"]

    monkeypatch.setenv("CCSD_CHEMNET_WEIGHTS", str(path))
    gen = ["CCO", "CCN", "c1ccccc1", "CC(=O)O", "CCCC"]
    ref = ["CCO", "COC", "c1ccncc1", "CC(N)=O", "CCC"]
    score = fcd_score_native(gen, ref)
    assert score is not None and np.isfinite(score) and score >= 0
    same = fcd_score_native(gen, gen)
    assert same == pytest.approx(0.0, abs=1e-6)
