"""RVC training graph: posterior encoder, forward flow, random slicing,
and the VITS loss set.

The reference ships the training forward passes as unused code
(SynthesizerTrn*.forward, PosteriorEncoder — reference
src/infer_pack/models.py:160-202, 617-632; commons.rand_slice_segments
:44-69); this module makes them live so the framework can fine-tune /
train voices, and so the multi-chip dryrun exercises a real training step.

Losses follow upstream VITS/RVC: KL(q || p) under the flow, L1 mel
reconstruction on random slices, adversarial LS-GAN + feature matching.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import mel_filterbank
from ..ops.stft import hann_window, stft
from .layers import conv1d, embedding, sequence_mask
from .rvc import RVCConfig, flow_reverse, generator_nsf, text_encoder, wavenet


def posterior_encoder(p, y, y_lengths, g, cfg: RVCConfig, rng):
    """PosteriorEncoder.forward (reference models.py:190-199): linear spec
    (B, spec, T) -> sampled latent z with (m, logs, mask)."""
    y_mask = sequence_mask(y_lengths, y.shape[2])[:, None, :].astype(y.dtype)
    h = conv1d(p["pre"], y) * y_mask
    h = wavenet(p["enc"], h, y_mask, g, cfg.hidden_channels, kernel_size=5,
                dilation_rate=1, n_layers=16)
    stats = conv1d(p["proj"], h) * y_mask
    m, logs = jnp.split(stats, 2, axis=1)
    noise = jax.random.normal(rng, m.shape, m.dtype)
    z = (m + noise * jnp.exp(logs)) * y_mask
    return z, m, logs, y_mask


def flow_forward(p, x, x_mask, g, cfg: RVCConfig, n_flows: int = 4):
    """ResidualCouplingBlock forward (reference models.py:146-149):
    coupling then flip, in order."""
    for i in range(n_flows):
        half = x.shape[1] // 2
        x0, x1 = x[:, :half], x[:, half:]
        h = conv1d(p["flows"][str(2 * i)]["pre"], x0) * x_mask
        h = wavenet(p["flows"][str(2 * i)]["enc"], h, x_mask, g,
                    cfg.hidden_channels, kernel_size=5, dilation_rate=1, n_layers=3)
        m = conv1d(p["flows"][str(2 * i)]["post"], h) * x_mask
        x1 = (m + x1) * x_mask  # mean-only coupling, logs == 0
        x = jnp.concatenate([x0, x1], axis=1)
        x = jnp.flip(x, axis=1)
    return x


def rand_slice_segments(rng, x, x_lengths, segment_size: int):
    """commons.rand_slice_segments (reference commons.py:58-69): one random
    segment_size window per batch element; returns (slices, start_ids)."""
    b, _d, t = x.shape
    ids_max = jnp.maximum(x_lengths - segment_size + 1, 1)
    ids = (jax.random.uniform(rng, (b,)) * ids_max).astype(jnp.int32)
    idx = ids[:, None] + jnp.arange(segment_size)[None, :]
    sliced = jnp.take_along_axis(x, idx[:, None, :].repeat(x.shape[1], 1), axis=2)
    return sliced, ids


def slice_segments2(x, ids, segment_size: int):
    """(B, T) variant (reference commons.py:52-56)."""
    idx = ids[:, None] + jnp.arange(segment_size)[None, :]
    return jnp.take_along_axis(x, idx, axis=1)


def synthesizer_forward(
    params, cfg: RVCConfig, phone, phone_lengths, pitch, pitchf, y, y_lengths, ds, rng
):
    """SynthesizerTrnMs*NSFsid.forward (reference models.py:617-632)."""
    rng_q, rng_slice = jax.random.split(rng)
    g = embedding(params["emb_g"], ds)[:, :, None]
    m_p, logs_p, x_mask = text_encoder(params["enc_p"], phone, pitch, phone_lengths, cfg)
    z, m_q, logs_q, y_mask = posterior_encoder(params["enc_q"], y, y_lengths, g, cfg, rng_q)
    z_p = flow_forward(params["flow"], z, y_mask, g, cfg)
    z_slice, ids_slice = rand_slice_segments(rng_slice, z, y_lengths, cfg.segment_size)
    pitchf_slice = slice_segments2(pitchf, ids_slice, cfg.segment_size)
    o = generator_nsf(params["dec"], z_slice, pitchf_slice, g, cfg)
    return o, ids_slice, x_mask, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q)


# ---------------------------------------------------------------------------
# losses (upstream VITS/RVC train.py semantics)
# ---------------------------------------------------------------------------


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask):
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * (z_p - m_p) ** 2 * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * z_mask) / jnp.maximum(jnp.sum(z_mask), 1.0)


def feature_matching_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for fr, fg in zip(dr, dg):
            loss += jnp.mean(jnp.abs(jax.lax.stop_gradient(fr) - fg))
    return 2.0 * loss


def generator_adv_loss(disc_gen_outputs):
    loss = 0.0
    for dg in disc_gen_outputs:
        loss += jnp.mean((1.0 - dg) ** 2)
    return loss


def discriminator_adv_loss(disc_real_outputs, disc_gen_outputs):
    loss = 0.0
    for dr, dg in zip(disc_real_outputs, disc_gen_outputs):
        loss += jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg**2)
    return loss


class MelLoss:
    """L1 log-mel distance at the generator sample rate."""

    def __init__(self, sr: int, n_fft: int = 1024, hop: int = 256, n_mels: int = 80):
        self.n_fft, self.hop = n_fft, hop
        self.basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, 0.0, sr / 2, htk=False))
        self.window = hann_window(n_fft)

    def mel(self, audio):
        spec = stft(audio, self.n_fft, self.hop, self.window)
        return jnp.log(jnp.clip(jnp.matmul(self.basis, jnp.abs(spec)), min=1e-5))

    def __call__(self, y, y_hat):
        return jnp.mean(jnp.abs(self.mel(y) - self.mel(y_hat))) * 45.0


# ---------------------------------------------------------------------------
# random init (train-from-scratch / dryruns without a checkpoint)
# ---------------------------------------------------------------------------


def init_synthesizer_params(cfg: RVCConfig, seed: int = 0) -> dict:
    """Random-initialized full synthesizer tree (enc_p, enc_q, flow, dec,
    emb_g) with torch-layout shapes."""
    rng = np.random.default_rng(seed)

    def conv(out, inp, k):
        return {
            "weight": (rng.standard_normal((out, inp, k)) / np.sqrt(inp * k)).astype(np.float32),
            "bias": np.zeros(out, np.float32),
        }

    def lin(out, inp):
        return {
            "weight": (rng.standard_normal((out, inp)) / np.sqrt(inp)).astype(np.float32),
            "bias": np.zeros(out, np.float32),
        }

    h = cfg.hidden_channels
    inter = cfg.inter_channels

    def wn_tree(n_layers, gin):
        t = {
            "in_layers": {str(i): conv(2 * h, h, 5) for i in range(n_layers)},
            "res_skip_layers": {
                str(i): conv(2 * h if i < n_layers - 1 else h, h, 1) for i in range(n_layers)
            },
        }
        if gin:
            t["cond_layer"] = conv(2 * h * n_layers, cfg.gin_channels, 1)
        return t

    def coupling():
        return {
            "pre": conv(h, inter // 2, 1),
            "enc": wn_tree(3, True),
            "post": {
                "weight": np.zeros((inter // 2, h, 1), np.float32),
                "bias": np.zeros(inter // 2, np.float32),
            },
        }

    emb_dim = 768 if cfg.version == "v2" else 256
    attn = {}
    for i in range(cfg.n_layers):
        attn.setdefault("attn_layers", {})[str(i)] = {
            "conv_q": conv(h, h, 1),
            "conv_k": conv(h, h, 1),
            "conv_v": conv(h, h, 1),
            "conv_o": conv(h, h, 1),
            "emb_rel_k": (rng.standard_normal((1, 21, h // cfg.n_heads))
                          * (h // cfg.n_heads) ** -0.5).astype(np.float32),
            "emb_rel_v": (rng.standard_normal((1, 21, h // cfg.n_heads))
                          * (h // cfg.n_heads) ** -0.5).astype(np.float32),
        }
        attn.setdefault("norm_layers_1", {})[str(i)] = {
            "gamma": np.ones(h, np.float32), "beta": np.zeros(h, np.float32)
        }
        attn.setdefault("ffn_layers", {})[str(i)] = {
            "conv_1": conv(cfg.filter_channels, h, cfg.kernel_size),
            "conv_2": conv(h, cfg.filter_channels, cfg.kernel_size),
        }
        attn.setdefault("norm_layers_2", {})[str(i)] = {
            "gamma": np.ones(h, np.float32), "beta": np.zeros(h, np.float32)
        }

    enc_p = {
        "emb_phone": lin(h, emb_dim),
        "emb_pitch": {"weight": (rng.standard_normal((256, h)) * 0.02).astype(np.float32)},
        "encoder": attn,
        "proj": conv(inter * 2, h, 1),
    }

    enc_q = {
        "pre": conv(h, cfg.spec_channels, 1),
        "enc": wn_tree(16, True),
        "proj": conv(inter * 2, h, 1),
    }

    flow = {"flows": {str(2 * i): coupling() for i in range(4)}}

    uic = cfg.upsample_initial_channel
    dec = {
        "conv_pre": conv(uic, inter, 7),
        "cond": conv(uic, cfg.gin_channels, 1),
        "m_source": {"l_linear": lin(1, 1)},
        "ups": {},
        "noise_convs": {},
        "resblocks": {},
        "conv_post": {"weight": (rng.standard_normal((1, uic // (2 ** len(cfg.upsample_rates)), 7))
                                  * 0.01).astype(np.float32)},
    }
    rates = cfg.upsample_rates
    for i, (u, k) in enumerate(zip(rates, cfg.upsample_kernel_sizes)):
        cin = uic // (2**i)
        cout = uic // (2 ** (i + 1))
        dec["ups"][str(i)] = {
            "weight": (rng.standard_normal((cin, cout, k)) / np.sqrt(cin * k)).astype(np.float32),
            "bias": np.zeros(cout, np.float32),
        }
        if i + 1 < len(rates):
            stride_f0 = int(np.prod(rates[i + 1 :]))
            dec["noise_convs"][str(i)] = conv(cout, 1, stride_f0 * 2)
        else:
            dec["noise_convs"][str(i)] = conv(cout, 1, 1)
        for j, (rk, dil) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
            blk = {
                "convs1": {str(m): conv(cout, cout, rk) for m in range(len(dil))},
                "convs2": {str(m): conv(cout, cout, rk) for m in range(len(dil))},
            }
            dec["resblocks"][str(i * len(cfg.resblock_kernel_sizes) + j)] = blk

    emb_g = {"weight": (rng.standard_normal((cfg.spk_embed_dim, cfg.gin_channels)) * 0.02
                        ).astype(np.float32)}
    return {"enc_p": enc_p, "enc_q": enc_q, "flow": flow, "dec": dec, "emb_g": emb_g}
