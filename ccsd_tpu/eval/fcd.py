"""Native Fréchet ChemNet Distance (FCD) machinery.

The reference emits FCD via MOSES/`fcd` (reference ccsd/src/sampler.py:850-857),
which wraps a pretrained Keras ChemNet (Preuer et al., 2018) plus a Gaussian
Fréchet distance over its penultimate activations.  Neither the `fcd` package
nor its pretrained weights blob is installable in this environment (no egress;
`pip download fcd` → "No matching distribution found", recorded in
DESIGN_NOTES.md), so this module implements the entire FCD computation
natively and gates ONLY on the weights file:

  * :func:`frechet_distance` — the exact Gaussian Fréchet distance
    ``|mu1-mu2|^2 + tr(S1 + S2 - 2 (S1 S2)^{1/2})`` computed through the
    symmetrized eigendecomposition (no scipy.sqrtm iteration, numerically
    stable for rank-deficient sample covariances);
  * :func:`featurize_smiles` — FCD's fixed 35-token one-hot SMILES encoding
    (two-character tokens Cl/Br, pad-to-350), mirroring ``fcd.utils``;
  * :func:`chemnet_forward` / :func:`load_chemnet` — a JAX forward for the
    ChemNet layer stack (Conv1D + GRU + Dense), built from the layer specs
    stored in the weights file rather than hard-coded hyperparameters.  The
    GRU follows the cuDNN/``reset_after=True`` gate equations (identical to
    ``torch.nn.GRU``), which is what the shipped ChemNet uses; the test suite
    pins the Conv1D/GRU math against torch with copied weights.
  * :func:`fcd_score_native` — end-to-end: SMILES → activations → stats →
    Fréchet distance.  Returns None (with the reason retrievable via
    :func:`chemnet_weights_status`) when no weights file is present.

Point ``CCSD_CHEMNET_WEIGHTS`` at a ChemNet checkpoint to activate scoring:
either the `fcd` package's Keras ``.h5`` or a torch/pickle state dict with
``conv*/gru*/dense*`` keys (see :func:`load_chemnet`).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Fréchet distance
# ---------------------------------------------------------------------------


def activation_stats(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Mean and covariance of a (n_samples, dim) activation matrix."""
    acts = np.asarray(acts, dtype=np.float64)
    if acts.ndim != 2:
        raise ValueError(f"activations must be 2-D, got shape {acts.shape}")
    mu = acts.mean(axis=0)
    sigma = np.cov(acts, rowvar=False)
    sigma = np.atleast_2d(sigma)
    return mu, sigma


def frechet_distance(
    mu1: np.ndarray,
    sigma1: np.ndarray,
    mu2: np.ndarray,
    sigma2: np.ndarray,
    eps: float = 1e-10,
) -> float:
    """Exact Fréchet distance between two Gaussians.

    ``d^2 = |mu1 - mu2|^2 + tr(S1) + tr(S2) - 2 tr((S1 S2)^{1/2})``.

    The trace of the (generally non-symmetric) product square root is
    computed via the similarity-transformed symmetric form
    ``tr((S1 S2)^{1/2}) = sum_i sqrt(lambda_i(A))`` with
    ``A = S1^{1/2} S2 S1^{1/2}`` symmetric PSD, so ``eigvalsh`` applies and
    tiny negative eigenvalues from floating point are clipped at -eps before
    the sqrt (matching the tolerance policy of the `fcd` package's
    ``calculate_frechet_distance``).
    """
    mu1 = np.asarray(mu1, dtype=np.float64).ravel()
    mu2 = np.asarray(mu2, dtype=np.float64).ravel()
    sigma1 = np.atleast_2d(np.asarray(sigma1, dtype=np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, dtype=np.float64))
    if mu1.shape != mu2.shape or sigma1.shape != sigma2.shape:
        raise ValueError("Gaussian parameter shapes disagree")

    diff = mu1 - mu2

    # S1^{1/2} through its own symmetric eigendecomposition.
    w1, v1 = np.linalg.eigh(sigma1)
    w1 = np.clip(w1, 0.0, None)
    s1_half = (v1 * np.sqrt(w1)) @ v1.T

    a = s1_half @ sigma2 @ s1_half
    a = (a + a.T) / 2.0
    wa = np.linalg.eigvalsh(a)
    if wa.min() < -eps * max(1.0, abs(wa.max())):
        raise ValueError(
            f"product covariance has significantly negative eigenvalue "
            f"{wa.min():.3e}; inputs are not valid covariances"
        )
    tr_sqrt = float(np.sqrt(np.clip(wa, 0.0, None)).sum())

    return float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_sqrt
    )


def fcd_from_activations(acts1: np.ndarray, acts2: np.ndarray) -> float:
    """FCD between two activation matrices (n_i, dim)."""
    mu1, s1 = activation_stats(acts1)
    mu2, s2 = activation_stats(acts2)
    return frechet_distance(mu1, s1, mu2, s2)


# ---------------------------------------------------------------------------
# SMILES featurization (fcd.utils one-hot)
# ---------------------------------------------------------------------------

# Token order mirrors fcd 1.1's `__vocab`; ordering only matters when real
# pretrained weights are supplied (the input channel order must match the
# order the net was trained with).
FCD_TOKENS: Tuple[str, ...] = (
    "C", "N", "O", "H", "F", "Cl", "P", "B", "Br", "S", "I", "Si",
    "#", "(", ")", "+", "-", "1", "2", "3", "4", "5", "6", "7", "8",
    "=", "[", "]", "@", "c", "n", "o", "s", "X", ".",
)
_TWO_CHAR = ("Cl", "Br", "Si")
FCD_PAD_LEN = 350
_TOKEN_INDEX = {t: i for i, t in enumerate(FCD_TOKENS)}
_UNKNOWN = _TOKEN_INDEX["X"]


def tokenize_smiles(smiles: str) -> List[int]:
    """SMILES → FCD token indices (greedy two-char match, 'X' fallback)."""
    out: List[int] = []
    i = 0
    while i < len(smiles):
        two = smiles[i : i + 2]
        if two in _TWO_CHAR:
            out.append(_TOKEN_INDEX[two])
            i += 2
        else:
            out.append(_TOKEN_INDEX.get(smiles[i], _UNKNOWN))
            i += 1
    return out


def featurize_smiles(
    smiles: Sequence[str], pad_len: int = FCD_PAD_LEN
) -> np.ndarray:
    """Batch one-hot encoding, shape (B, pad_len, len(FCD_TOKENS)).

    Each SMILES gets the ``'.'`` end token appended before encoding —
    ``fcd.utils.get_one_hot`` does the same (``smiles + '.'``) and the
    pretrained ChemNet was trained with that terminator, so omitting it
    would shift every activation.  SMILES longer than ``pad_len - 1``
    raise: the `fcd` package asserts ``pad_len >= len(smiles) + 1`` and
    silent truncation would silently change scores.
    """
    out = np.zeros((len(smiles), pad_len, len(FCD_TOKENS)), dtype=np.float32)
    for b, s in enumerate(smiles):
        toks = tokenize_smiles(s + ".")
        if len(toks) > pad_len:
            raise ValueError(
                f"SMILES {s!r} tokenizes to {len(toks)} > pad_len={pad_len} "
                f"tokens (incl. the '.' terminator); raise pad_len — the fcd "
                f"package asserts this rather than truncating"
            )
        out[b, np.arange(len(toks)), toks] = 1.0
    return out


# ---------------------------------------------------------------------------
# ChemNet forward (Conv1D + GRU + Dense) in JAX
# ---------------------------------------------------------------------------


def conv1d(x, w, b, stride: int = 1, padding: str = "VALID"):
    """Keras-layout Conv1D: x (B, T, Cin), w (k, Cin, Cout)."""
    import jax.lax as lax
    import jax.numpy as jnp

    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + jnp.asarray(b)


def gru_scan(x, wi, wh, bi, bh, mask=None, reset_after: bool = True):
    """GRU over x (B, T, Cin) → final hidden state (B, H).

    Default is the cuDNN / ``reset_after=True`` gate order [r, z, n] with
    separate input and hidden biases — the exact equations of
    ``torch.nn.GRU`` (and of Keras ``GRU(reset_after=True)``):

        r = sigmoid(x Wir + bir + h Whr + bhr)
        z = sigmoid(x Wiz + biz + h Whz + bhz)
        n = tanh  (x Win + bin + r * (h Whn + bhn))
        h' = (1 - z) * n + z * h

    ``reset_after=False`` (the original Keras-1 era format, a single 1-D
    bias — the layout of legacy ChemNet .h5 exports) differs in the
    candidate gate: the reset is applied to the hidden state BEFORE the
    recurrent matmul, ``n = tanh(x Win + bin + (r * h) Whn)``, and there
    is no hidden bias.  The two are not weight-convertible, so the loader
    tags each GRU layer with the format it was saved in.

    ``mask`` (B, T) freezes the hidden state on padded timesteps so
    right-padded batches reproduce per-sequence results.
    """
    import jax
    import jax.numpy as jnp

    wi = jnp.asarray(wi)  # (Cin, 3H)
    wh = jnp.asarray(wh)  # (H, 3H)
    bi = jnp.asarray(bi)  # (3H,)
    bh = jnp.asarray(bh)  # (3H,)
    hidden = wh.shape[0]
    B = x.shape[0]

    x_proj = jnp.einsum("btc,ch->bth", x, wi) + bi  # (B, T, 3H)
    whr, whz, whn = jnp.split(wh, 3, axis=-1)

    def step(h, inp):
        xp, m = inp
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        if reset_after:
            hp = h @ wh + bh
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
        else:
            r = jax.nn.sigmoid(xr + h @ whr)
            z = jax.nn.sigmoid(xz + h @ whz)
            n = jnp.tanh(xn + (r * h) @ whn)
        h_new = (1.0 - z) * n + z * h
        if m is not None:
            h_new = jnp.where(m[:, None], h_new, h)
        return h_new, None

    h0 = jnp.zeros((B, hidden), dtype=x.dtype)
    xs = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 3H)
    ms = None if mask is None else jnp.swapaxes(jnp.asarray(mask), 0, 1)
    if ms is None:
        h_final, _ = jax.lax.scan(lambda h, xp: step(h, (xp, None)), h0, xs)
    else:
        h_final, _ = jax.lax.scan(step, h0, (xs, ms))
    return h_final


def chemnet_forward(params: List[Dict], x: np.ndarray) -> np.ndarray:
    """Run a ChemNet layer stack over one-hot inputs (B, T, C).

    ``params`` is an ordered list of layer dicts produced by
    :func:`load_chemnet`:  {"kind": "conv1d"|"gru"|"dense", weights...,
    optional "activation": "relu"|"tanh"|"selu"|"linear"}.  The final GRU
    returns its last (mask-aware) hidden state; any trailing dense layers
    act on that vector.  The penultimate representation used by FCD is the
    output of this function when ``params`` is truncated at the layer the
    weights file marks as the activation tap (load_chemnet handles this).
    """
    import jax.nn
    import jax.numpy as jnp

    h = jnp.asarray(x)
    mask = jnp.any(h != 0.0, axis=-1)  # (B, T) valid-token mask
    for layer in params:
        kind = layer["kind"]
        if kind == "conv1d":
            h = conv1d(h, layer["w"], layer["b"], layer.get("stride", 1))
            k = np.asarray(layer["w"]).shape[0]
            s = layer.get("stride", 1)
            t_out = h.shape[1]
            # valid-conv output t is valid iff its last input t*s + k-1 is
            mask = mask[:, k - 1 :: s][:, :t_out]
        elif kind == "gru":
            h = gru_scan(
                h, layer["wi"], layer["wh"], layer["bi"], layer["bh"],
                mask=mask, reset_after=layer.get("reset_after", True),
            )
            mask = None
        elif kind == "dense":
            h = h @ jnp.asarray(layer["w"]) + jnp.asarray(layer["b"])
        else:
            raise ValueError(f"unknown ChemNet layer kind {kind!r}")
        act = layer.get("activation", "linear")
        if act == "relu":
            h = jax.nn.relu(h)
        elif act == "tanh":
            h = jnp.tanh(h)
        elif act == "selu":
            h = jax.nn.selu(h)
        elif act != "linear":
            raise ValueError(f"unknown activation {act!r}")
    return np.asarray(h)


def _load_keras_h5(path: str) -> List[Dict]:
    """Parse a Keras-saved ChemNet .h5 into the layer-dict list."""
    import json

    import h5py

    layers: List[Dict] = []
    with h5py.File(path, "r") as f:
        cfg = f.attrs.get("model_config")
        if cfg is None:
            raise ValueError(f"{path}: no model_config attr (not a Keras h5)")
        if isinstance(cfg, bytes):
            cfg = cfg.decode("utf-8")
        model_cfg = json.loads(cfg)["config"]
        layer_cfgs = (
            model_cfg["layers"] if isinstance(model_cfg, dict) else model_cfg
        )
        wroot = f["model_weights"] if "model_weights" in f else f
        for lc in layer_cfgs:
            cls, name = lc["class_name"], lc["config"]["name"]
            if cls in ("Masking", "InputLayer", "Dropout"):
                continue
            g = wroot[name]
            # descend through the duplicated name group Keras writes
            while name in g:
                g = g[name]
            ws = {k: np.asarray(g[k]) for k in g}
            act = lc["config"].get("activation", "linear")
            if cls == "Conv1D":
                layers.append({
                    "kind": "conv1d",
                    "w": ws["kernel:0"],
                    "b": ws["bias:0"],
                    "stride": lc["config"].get("strides", [1])[0],
                    "activation": act,
                })
            elif cls == "GRU":
                bias = ws["bias:0"]
                if bias.ndim == 2:  # reset_after=True: (2, 3H)
                    bi, bh = bias[0], bias[1]
                    reset_after = True
                else:
                    # 1-D bias = Keras reset_after=False (legacy ChemNet
                    # export): different candidate-gate math, NOT mappable
                    # onto the reset_after=True equations by zeroing bh.
                    bi, bh = bias, np.zeros_like(bias)
                    reset_after = False
                layers.append({
                    "kind": "gru",
                    "wi": ws["kernel:0"],
                    "wh": ws["recurrent_kernel:0"],
                    "bi": bi,
                    "bh": bh,
                    "reset_after": reset_after,
                })
            elif cls == "Dense":
                layers.append({
                    "kind": "dense",
                    "w": ws["kernel:0"],
                    "b": ws["bias:0"],
                    "activation": act,
                })
            else:
                raise ValueError(f"unsupported ChemNet layer {cls}")
    return layers


def _load_state_dict(path: str) -> List[Dict]:
    """Load a torch/pickle ChemNet state dict (fcd_torch-style keys)."""
    if path.endswith((".pt", ".pth")):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        with open(path, "rb") as f:
            sd = pickle.load(f)
        sd = {k: np.asarray(v) for k, v in sd.items()}

    layers: List[Dict] = []
    seen: set = set()
    for key in sd:
        base = key.rsplit(".", 1)[0]
        if base in seen:
            continue
        seen.add(base)
        if f"{base}.weight_ih_l0" in sd:  # torch GRU naming
            layers.append({
                "kind": "gru",
                "wi": sd[f"{base}.weight_ih_l0"].T,
                "wh": sd[f"{base}.weight_hh_l0"].T,
                "bi": sd[f"{base}.bias_ih_l0"],
                "bh": sd[f"{base}.bias_hh_l0"],
            })
        elif f"{base}.weight" in sd:
            w = sd[f"{base}.weight"]
            b = sd.get(f"{base}.bias", np.zeros(w.shape[0]))
            if w.ndim == 3:  # torch Conv1d (Cout, Cin, k) → (k, Cin, Cout)
                layers.append({
                    "kind": "conv1d",
                    "w": np.transpose(w, (2, 1, 0)),
                    "b": b,
                    "activation": "relu",
                })
            else:  # Dense (Cout, Cin) → (Cin, Cout)
                layers.append({"kind": "dense", "w": w.T, "b": b})
    return layers


_WEIGHTS_ENV = "CCSD_CHEMNET_WEIGHTS"
_status: Dict[str, str] = {}


def chemnet_weights_status() -> str:
    """Human-readable reason for the last gating decision."""
    return _status.get("reason", "not yet queried")


def load_chemnet(path: Optional[str] = None) -> Optional[List[Dict]]:
    """Load ChemNet params from ``path`` or $CCSD_CHEMNET_WEIGHTS.

    Returns None (and records the reason) when no usable weights exist —
    the permanent state in this environment, where neither the `fcd`
    package nor its ~20 MB pretrained blob can be downloaded.
    """
    path = path or os.environ.get(_WEIGHTS_ENV, "")
    if not path:
        _status["reason"] = (
            f"no weights file: set ${_WEIGHTS_ENV} to a ChemNet .h5/.pt"
        )
        return None
    if not os.path.exists(path):
        _status["reason"] = f"weights file {path} does not exist"
        return None
    try:
        if path.endswith((".h5", ".hdf5")):
            params = _load_keras_h5(path)
        else:
            params = _load_state_dict(path)
    except Exception as e:  # unusable blob → gate, don't crash the eval
        _status["reason"] = f"failed to parse {path}: {e}"
        return None
    _status["reason"] = f"loaded {len(params)} layers from {path}"
    return params


def chemnet_activations(
    smiles: Sequence[str], params: List[Dict], batch: int = 128
) -> np.ndarray:
    """Penultimate ChemNet activations for a SMILES list."""
    outs = []
    for i in range(0, len(smiles), batch):
        x = featurize_smiles(smiles[i : i + batch])
        outs.append(chemnet_forward(params, x))
    return np.concatenate(outs, axis=0)


def fcd_score_native(
    smiles: Sequence[str],
    ref_smiles: Sequence[str],
    weights_path: Optional[str] = None,
) -> Optional[float]:
    """End-to-end FCD; None when the pretrained weights are unavailable.

    Over-long SMILES (tokenizing past the ChemNet pad length) are dropped
    here with a logged count rather than aborting the whole metrics pass —
    the strict ValueError stays in the low-level encoder, but one
    pathological generated string must not void a 10k-sample run."""
    params = load_chemnet(weights_path)
    if params is None:
        return None

    def _fits(s: str) -> bool:
        return len(tokenize_smiles(s + ".")) <= FCD_PAD_LEN

    kept = [s for s in smiles if _fits(s)]
    kept_ref = [s for s in ref_smiles if _fits(s)]
    n_drop = (len(smiles) - len(kept)) + (len(ref_smiles) - len(kept_ref))
    if n_drop:
        print(f"[fcd] dropped {n_drop} SMILES longer than the ChemNet pad "
              f"length {FCD_PAD_LEN} (gen {len(smiles) - len(kept)}, "
              f"ref {len(ref_smiles) - len(kept_ref)})", flush=True)
    if not kept or not kept_ref:
        _status["reason"] = "empty SMILES set"
        return None
    a1 = chemnet_activations(kept, params)
    a2 = chemnet_activations(kept_ref, params)
    return fcd_from_activations(a1, a2)
