"""CREPE pitch estimator (full/tiny) in functional JAX.

Replaces the torchcrepe dependency used by the reference's "crepe" /
"mangio-crepe" f0 methods (reference src/vc_infer_pipeline.py:96-165).
Architecture per the published CREPE model: six Conv(kx1)+BN+ReLU+MaxPool(2x1)
stages over 1024-sample 16 kHz frames, then a 360-bin sigmoid classifier over
20-cent pitch bins anchored at 1997.379... cents.

Decoding implements torchcrepe's two modes:
  * weighted argmax (local average over +-4 bins)
  * Viterbi smoothing with the triangular band transition matrix,
    expressed as a `lax.scan` over frames (TPU-friendly: the state is a
    360-vector, each step one (360,360) matvec on the MXU).

Weights convert from a torchcrepe checkpoint via convert/crepe_convert-style
naming (conv{i}/conv{i}_BN/classifier), handled by `torchcrepe_state_to_tree`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import batch_norm, conv2d, linear

# (out_channels full, out_channels tiny, kernel, stride)
_LAYERS = [
    (1024, 128, 512, 4),
    (128, 16, 64, 1),
    (128, 16, 64, 1),
    (128, 16, 64, 1),
    (256, 32, 64, 1),
    (512, 64, 64, 1),
]

CENTS_PER_BIN = 20.0
CENTS_OFFSET = 1997.3794084376191
N_BINS = 360
WINDOW_SIZE = 1024
SAMPLE_RATE = 16000


def frame_audio(audio: np.ndarray, hop_length: int) -> np.ndarray:
    """torchcrepe.preprocess framing (pad=True): reflect-free zero pad of
    WINDOW_SIZE//2 on both sides, frames every hop, per-frame mean/std
    normalization."""
    padded = np.pad(audio, (WINDOW_SIZE // 2, WINDOW_SIZE // 2))
    n_frames = 1 + len(audio) // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(WINDOW_SIZE)[None, :]
    frames = padded[idx].astype(np.float32)
    mean = frames.mean(axis=1, keepdims=True)
    std = np.maximum(frames.std(axis=1, keepdims=True), 1e-10)
    return (frames - mean) / std


@functools.partial(jax.jit, static_argnames=("capacity",))
def crepe_forward(params, frames: jnp.ndarray, capacity: str = "full") -> jnp.ndarray:
    """(N, 1024) normalized frames -> (N, 360) sigmoid salience.
    Runs in the parameters' dtype (bf16 under mixed precision); the sigmoid
    salience returns fp32 for the decode."""
    from ..utils.precision import tree_dtype

    frames = frames.astype(tree_dtype(params))
    x = frames[:, None, :, None]  # (N, 1, 1024, 1)
    for i, (_cf, _ct, k, s) in enumerate(_LAYERS):
        # torchcrepe pads: layer 1 (254, 254); others (31, 32)
        pad = (254, 254) if i == 0 else (31, 32)
        x = jnp.pad(x, ((0, 0), (0, 0), pad, (0, 0)))
        x = conv2d(params[f"conv{i + 1}"], x, stride=(s, 1))
        # torchcrepe layer order (model.py): conv -> relu -> BN -> maxpool
        # (the Keras CREPE convention: activation inside Conv2D, BN after)
        x = jax.nn.relu(x)
        if f"conv{i + 1}_BN" in params:
            x = batch_norm(params[f"conv{i + 1}_BN"], x)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 2, 1), (1, 1, 2, 1), "VALID"
        )
    x = jnp.transpose(x, (0, 3, 2, 1)).reshape(x.shape[0], -1)
    return jax.nn.sigmoid(linear(params["classifier"], x).astype(jnp.float32))


def _triangular_transition() -> np.ndarray:
    xx, yy = np.meshgrid(np.arange(N_BINS), np.arange(N_BINS))
    transition = np.maximum(12 - np.abs(xx - yy), 0).astype(np.float32)
    return transition / transition.sum(axis=1, keepdims=True)


@jax.jit
def viterbi_bins(probs: jnp.ndarray) -> jnp.ndarray:
    """Maximum-likelihood bin path under the triangular transition
    (torchcrepe.decode.viterbi semantics). probs: (T, 360)."""
    log_trans = jnp.log(jnp.asarray(_triangular_transition()) + 1e-12)
    log_probs = jnp.log(jnp.maximum(probs / jnp.maximum(probs.sum(-1, keepdims=True), 1e-12), 1e-12))
    init = jnp.log(jnp.full((N_BINS,), 1.0 / N_BINS)) + log_probs[0]

    def step(alpha, lp):
        scores = alpha[:, None] + log_trans  # (from, to)
        best_prev = jnp.argmax(scores, axis=0)
        alpha_new = jnp.max(scores, axis=0) + lp
        return alpha_new, best_prev

    alpha, backptrs = jax.lax.scan(step, init, log_probs[1:])
    last = jnp.argmax(alpha)

    def backtrack(state, ptrs):
        prev = ptrs[state]
        return prev, prev

    _, path_rev = jax.lax.scan(backtrack, last, backptrs, reverse=True)
    return jnp.concatenate([path_rev, jnp.asarray([last])])


@jax.jit
def weighted_argmax_cents(probs: jnp.ndarray, bins: jnp.ndarray) -> jnp.ndarray:
    """Local weighted average of cents over +-4 bins around `bins`."""
    padded = jnp.pad(probs, ((0, 0), (4, 4)))
    offsets = jnp.arange(9) - 4
    idx = bins[:, None] + 4 + offsets[None, :]
    w = jnp.take_along_axis(padded, idx, axis=1)
    cents_all = CENTS_PER_BIN * (jnp.arange(N_BINS + 8) - 4) + CENTS_OFFSET
    return jnp.sum(w * cents_all[idx], axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1e-12)


def cents_to_hz(cents: jnp.ndarray) -> jnp.ndarray:
    return 10.0 * (2.0 ** (cents / 1200.0))


def predict(
    params,
    audio: np.ndarray,
    hop_length: int,
    fmin: float = 50.0,
    fmax: float = 1100.0,
    capacity: str = "full",
    decoder: str = "viterbi",
    batch_size: int = 512,
) -> Tuple[np.ndarray, np.ndarray]:
    """torchcrepe.predict equivalent: (f0_hz, periodicity) per frame.

    Device-resident: frames go up in one padded transfer, every batch is
    dispatched before anything blocks, and the salience stays in HBM
    through masking/viterbi/decode — only the (n,) f0 + periodicity come
    back.  (The previous per-batch np.asarray loop serialized eight
    ~70 ms round trips per 30 s of audio on a remote-TPU tunnel.)"""
    frames = frame_audio(np.asarray(audio, np.float32), hop_length)
    n = frames.shape[0]
    pad_n = (-n) % batch_size
    fr = np.concatenate([frames, np.zeros((pad_n, WINDOW_SIZE), np.float32)]) if pad_n else frames
    fr_dev = jnp.asarray(fr)  # one upload
    outs = [
        crepe_forward(params, fr_dev[i : i + batch_size], capacity)
        for i in range(0, fr.shape[0], batch_size)
    ]
    probs = jnp.concatenate(outs)[:n]  # length-class shape (audio len, hop)

    # restrict to [fmin, fmax] bins (torchcrepe masks outside the range)
    cents_min = 1200 * np.log2(fmin / 10.0)
    cents_max = 1200 * np.log2(fmax / 10.0)
    bin_cents = CENTS_PER_BIN * np.arange(N_BINS) + CENTS_OFFSET
    mask = (bin_cents >= cents_min) & (bin_cents <= cents_max)
    probs = probs * jnp.asarray(mask)[None, :]

    if decoder == "viterbi":
        bins = viterbi_bins(probs)
    else:
        bins = jnp.argmax(probs, axis=1)
    cents = weighted_argmax_cents(probs, bins)
    f0_dev = cents_to_hz(cents)
    per_dev = jnp.take_along_axis(probs, bins[:, None], axis=1)[:, 0]
    both = np.asarray(jnp.stack([f0_dev, per_dev.astype(jnp.float32)]))  # one download
    return both[0], both[1]


def torchcrepe_state_to_tree(state) -> dict:
    """torchcrepe Crepe module state_dict -> pytree (names already flat:
    conv1.weight, conv1_BN.running_mean, ..., classifier.weight)."""
    from ..convert.torch_reader import nest

    flat = {}
    for key, value in state.items():
        if key.endswith("num_batches_tracked"):
            continue
        flat[key] = np.asarray(
            value.detach().cpu().float().numpy() if hasattr(value, "detach") else value
        )
    return nest(flat)


def init_random_params(capacity: str = "full", seed: int = 0) -> dict:
    """Random-weight net (for tests / smoke runs when the checkpoint asset
    is unavailable in a zero-egress environment)."""
    rng = np.random.default_rng(seed)
    params = {}
    in_ch = 1
    for i, (cf, ct, k, _s) in enumerate(_LAYERS):
        out_ch = cf if capacity == "full" else ct
        params[f"conv{i + 1}"] = {
            "weight": rng.standard_normal((out_ch, in_ch, k, 1)).astype(np.float32)
            * (1.0 / np.sqrt(in_ch * k)),
            "bias": np.zeros(out_ch, np.float32),
        }
        params[f"conv{i + 1}_BN"] = {
            "weight": np.ones(out_ch, np.float32),
            "bias": np.zeros(out_ch, np.float32),
            "running_mean": np.zeros(out_ch, np.float32),
            "running_var": np.ones(out_ch, np.float32),
        }
        in_ch = out_ch
    feat = in_ch * 4  # 1024 -> /4 stride -> /2^6 pools = 4 time steps
    params["classifier"] = {
        "weight": rng.standard_normal((N_BINS, feat)).astype(np.float32) / np.sqrt(feat),
        "bias": np.zeros(N_BINS, np.float32),
    }
    return params
