"""RMVPE pitch estimator (DeepUnet + BiGRU salience model) in functional JAX.

Port of reference src/rmvpe.py: a 5-level residual conv U-Net over log-mel
spectrograms (128 mels, 16 kHz, win 1024, hop 160, fmin 30, fmax 8000,
HTK mel), a 3-channel head, a bidirectional GRU, and a 360-bin sigmoid
salience output decoded to f0 by local weighted averaging over cents
(reference rmvpe.py:385-409: argmax ± 4 bins, 20-cent spacing anchored at
1997.379... cents, threshold 0.03).

Parameter trees mirror the torch state_dict of ``rvc_models/rmvpe.pt``
(nn.Sequential indices appear as string keys: ConvBlockRes.conv = [conv, bn,
relu, conv, bn, relu] -> keys '0','1','3','4').
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import mel_filterbank
from ..ops.stft import hann_window, stft
from .layers import avg_pool2d, batch_norm, bigru, conv2d, conv_transpose2d, linear

N_MELS = 128
N_CLASS = 360
EN_DE_LAYERS = 5
INTER_LAYERS = 4
N_BLOCKS = 4
EN_OUT_CHANNELS = 16


def _conv_block_res(p, x):
    """ConvBlockRes (reference rmvpe.py:23-58): two 3x3 conv+BN+ReLU with a
    residual (1x1 shortcut when channels change).  Supports both raw trees
    (with BN entries '1'/'4') and BN-folded trees (convert/bn_fold.py)."""
    h = conv2d(p["conv"]["0"], x, padding=(1, 1))
    if "1" in p["conv"]:
        h = batch_norm(p["conv"]["1"], h)
    h = jax.nn.relu(h)
    h = conv2d(p["conv"]["3"], h, padding=(1, 1))
    if "4" in p["conv"]:
        h = batch_norm(p["conv"]["4"], h)
    h = jax.nn.relu(h)
    if "shortcut" in p:
        return h + conv2d(p["shortcut"], x)
    return h + x


def _conv_block_chain(blocks, x):
    """Apply ConvBlockRes blocks 0..n-1.  Block 0 (the only one whose
    channel count can change, hence the only one with a shortcut) runs
    unrolled; blocks 1.. are shape-identical and run as ONE lax.scan over
    stacked params — the block body appears once in the HLO instead of
    n_blocks x levels times, keeping the compiled E2E executable small for
    remote compile/load (see models/hubert.py for the rationale).
    Block/layer counts are read from the parameter tree, not the module
    constants, so reduced checkpoints (the dryrun/test tier's tiny assets)
    run the same code."""
    n = len(blocks)
    x = _conv_block_res(blocks["0"], x)
    rest = [blocks[str(i)] for i in range(1, n)]
    if rest:
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *rest)

        def body(h, lp):
            return _conv_block_res(lp, h), None

        x, _ = jax.lax.scan(body, x, stacked)
    return x


def _res_encoder_block(p, x, pool: bool):
    x = _conv_block_chain(p["conv"], x)
    if pool:
        return x, avg_pool2d(x, (2, 2))
    return x


def _res_decoder_block(p, x, skip):
    x = conv_transpose2d(
        p["conv1"]["0"], x, stride=(2, 2), padding=(1, 1), output_padding=(1, 1)
    )
    if "1" in p["conv1"]:
        x = batch_norm(p["conv1"]["1"], x)
    x = jax.nn.relu(x)
    x = jnp.concatenate([x, skip], axis=1)
    x = _conv_block_chain(p["conv2"], x)
    return x


def deep_unet(p, x):
    """DeepUnet (reference rmvpe.py:190-218) on (B, 1, T, 128)."""
    bn = p["encoder"]["bn"]
    if "scale" in bn:  # folded form (convert/bn_fold.py)
        c = bn["scale"].shape[0]
        x = x * bn["scale"].reshape(1, c, 1, 1) + bn["shift"].reshape(1, c, 1, 1)
    else:
        x = batch_norm(bn, x)
    skips = []
    for i in range(len(p["encoder"]["layers"])):
        skip, x = _res_encoder_block(p["encoder"]["layers"][str(i)], x, pool=True)
        skips.append(skip)
    for i in range(len(p["intermediate"]["layers"])):
        x = _res_encoder_block(p["intermediate"]["layers"][str(i)], x, pool=False)
    for i in range(len(p["decoder"]["layers"])):
        x = _res_decoder_block(p["decoder"]["layers"][str(i)], x, skips[-1 - i])
    return x


@jax.jit
def e2e_forward(params, mel: jnp.ndarray) -> jnp.ndarray:
    """E2E.forward (reference rmvpe.py:254-258): (B, 128, T) log-mel ->
    (B, T, 360) salience.

    The U-Net/conv stack runs in the dtype of its parameters (bf16 under
    mixed precision); the BiGRU head and sigmoid decode stay in the fc
    parameters' dtype (fp32) for pitch accuracy."""
    conv_dtype = params["cnn"]["weight"].dtype
    head_dtype = params["fc"]["0"]["gru"]["weight_ih_l0"].dtype
    x = jnp.swapaxes(mel, 1, 2)[:, None].astype(conv_dtype)  # (B, 1, T, 128)
    x = deep_unet(params["unet"], x)
    x = conv2d(params["cnn"], x, padding=(1, 1))  # (B, 3, T, 128)
    x = jnp.swapaxes(x, 1, 2).reshape(x.shape[0], x.shape[2], 3 * N_MELS)
    x = bigru(params["fc"]["0"]["gru"], x.astype(head_dtype))
    x = linear(params["fc"]["1"], x)
    return jax.nn.sigmoid(x)


# cents mapping (reference rmvpe.py:347-348)
CENTS_MAPPING = np.pad(20 * np.arange(N_CLASS) + 1997.3794084376191, (4, 4))


@functools.partial(jax.jit, static_argnames=("thred",))
def decode_cents(salience: jnp.ndarray, thred: float = 0.03) -> jnp.ndarray:
    """to_local_average_cents + cents->Hz (reference rmvpe.py:359-409).
    salience: (T, 360) -> f0 (T,) Hz with 0 for unvoiced."""
    center = jnp.argmax(salience, axis=1) + 4
    padded = jnp.pad(salience, ((0, 0), (4, 4)))
    offsets = jnp.arange(9) - 4
    idx = center[:, None] + offsets[None, :]
    weights = jnp.take_along_axis(padded, idx, axis=1)
    cents_map = jnp.asarray(CENTS_MAPPING)
    cents = jnp.sum(weights * cents_map[idx], axis=1) / jnp.sum(weights, axis=1)
    maxx = jnp.max(salience, axis=1)
    cents = jnp.where(maxx > thred, cents, 0.0)
    f0 = 10.0 * (2.0 ** (cents / 1200.0))
    return jnp.where(f0 == 10.0, 0.0, f0)


class RMVPE:
    """Inference wrapper (reference rmvpe.py:328-383): log-mel -> pad frames
    to a multiple of 32 (reflect) -> E2E -> decode."""

    def __init__(self, params: dict, dtype=None, fold_bn: bool = True):
        if fold_bn and "running_mean" in params.get("unet", {}).get("encoder", {}).get("bn", {}):
            from ..convert.bn_fold import fold_rmvpe_tree

            params = fold_rmvpe_tree(params)
        if dtype is not None and dtype != jnp.float32:
            # mixed precision AFTER BN folding: the conv stack (unet + head
            # conv) runs reduced-precision; the BiGRU + linear decode ("fc")
            # stay fp32 so the cents argmax/weighting keep pitch accuracy
            from ..utils.precision import cast_floats

            params = {
                k: (cast_floats(v, dtype) if k in ("unet", "cnn") else v)
                for k, v in params.items()
            }
        dtype = dtype or jnp.float32
        self.params = params
        self.dtype = dtype
        self.mel_basis = mel_filterbank(16000, 1024, N_MELS, 30, 8000, htk=True)
        self.window = hann_window(1024)

    def mel(self, audio: jnp.ndarray) -> jnp.ndarray:
        spec = stft(audio, n_fft=1024, hop=160, window=self.window, center=True)
        mel = jnp.matmul(jnp.asarray(self.mel_basis), jnp.abs(spec))
        return jnp.log(jnp.clip(mel, min=1e-5))

    def infer(self, audio: jnp.ndarray, thred: float = 0.03) -> jnp.ndarray:
        """audio (samples,) float 16 kHz -> f0 (frames,) Hz."""
        mel = self.mel(audio[None])
        n_frames = mel.shape[-1]
        pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames
        mel = jnp.pad(mel, ((0, 0), (0, 0), (0, pad)), mode="reflect")
        hidden = e2e_forward(self.params, mel)[:, :n_frames]
        return decode_cents(hidden[0], thred=thred)
