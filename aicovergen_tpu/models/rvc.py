"""RVC synthesizer (VITS flow decoder + NSF-HiFiGAN vocoder) in functional JAX.

Port of the inference path of the four reference synthesizer classes
SynthesizerTrnMs{256,768}NSFsid[_nono] (reference src/infer_pack/models.py:
532-955): text encoder with relative attention, reverse residual-coupling
flow, and the NSF (harmonic-source) HiFi-GAN generator.  Parameters are
nested dicts mirroring the torch state_dict (weight-norm folded at
conversion; enc_q is training-only and never loaded).

Stochasticity (the z_p noise draw, models.py:748, and the SineGen additive
noise, models.py:359-369) is injected through an explicit `jax.random` key —
or caller-provided arrays for golden parity tests, following the precedent of
the reference's ONNX export which takes `rnd` as an input
(reference src/infer_pack/models_onnx.py:635-646).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import attention
from .layers import (
    LRELU_SLOPE,
    conv1d,
    conv_transpose1d,
    embedding,
    fused_gate,
    interpolate_linear_align_corners,
    interpolate_nearest,
    leaky_relu,
    linear,
    sequence_mask,
)


@dataclass(frozen=True)
class RVCConfig:
    """cpt["config"] layout of an RVC .pth checkpoint
    (reference src/rvc.py:117-131)."""

    spec_channels: int = 1025
    segment_size: int = 32
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.0
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (10, 10, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    spk_embed_dim: int = 109
    gin_channels: int = 256
    sr: int = 40000
    # derived / loader-provided
    version: str = "v2"  # v1: 256-d phone feats, v2: 768-d
    if_f0: bool = True

    @property
    def upp(self) -> int:
        return int(np.prod(self.upsample_rates))

    @classmethod
    def from_cpt_config(cls, cfg_list, version: str, if_f0: bool) -> "RVCConfig":
        sr = cfg_list[-1]
        if isinstance(sr, str):
            sr = {"32k": 32000, "40k": 40000, "48k": 48000}[sr]
        return cls(
            spec_channels=cfg_list[0],
            segment_size=cfg_list[1],
            inter_channels=cfg_list[2],
            hidden_channels=cfg_list[3],
            filter_channels=cfg_list[4],
            n_heads=cfg_list[5],
            n_layers=cfg_list[6],
            kernel_size=cfg_list[7],
            p_dropout=cfg_list[8],
            resblock=str(cfg_list[9]),
            resblock_kernel_sizes=tuple(cfg_list[10]),
            resblock_dilation_sizes=tuple(tuple(d) for d in cfg_list[11]),
            upsample_rates=tuple(cfg_list[12]),
            upsample_initial_channel=cfg_list[13],
            upsample_kernel_sizes=tuple(cfg_list[14]),
            spk_embed_dim=cfg_list[15],
            gin_channels=cfg_list[16],
            sr=sr,
            version=version,
            if_f0=if_f0,
        )


# ---------------------------------------------------------------------------
# Text encoder (reference models.py:17-108)
# ---------------------------------------------------------------------------


def text_encoder(p, phone, pitch, lengths, cfg: RVCConfig):
    """phone (B, T, 256|768), pitch (B, T) int or None ->
    (m, logs, x_mask) each (B, inter|1, T)."""
    x = linear(p["emb_phone"], phone)
    if pitch is not None:
        x = x + embedding(p["emb_pitch"], pitch)
    x = x * math.sqrt(cfg.hidden_channels)
    x = leaky_relu(x, 0.1)
    x = jnp.swapaxes(x, 1, 2)  # (B, H, T)
    x_mask = sequence_mask(lengths, x.shape[2])[:, None, :].astype(x.dtype)
    x = attention.encoder(
        p["encoder"], x * x_mask, x_mask, cfg.n_heads, cfg.n_layers, cfg.kernel_size
    )
    stats = conv1d(p["proj"], x) * x_mask
    m, logs = jnp.split(stats, 2, axis=1)
    return m, logs, x_mask


# ---------------------------------------------------------------------------
# WaveNet + residual coupling flow (reference modules.py:136-221, 405-459)
# ---------------------------------------------------------------------------


def wavenet(p, x, x_mask, g, hidden: int, kernel_size: int, dilation_rate: int, n_layers: int):
    output = jnp.zeros_like(x)
    if g is not None:
        g = conv1d(p["cond_layer"], g)
    for i in range(n_layers):
        dilation = dilation_rate**i
        padding = (kernel_size * dilation - dilation) // 2
        x_in = conv1d(p["in_layers"][str(i)], x, padding=padding, dilation=dilation)
        if g is not None:
            g_l = g[:, i * 2 * hidden : (i + 1) * 2 * hidden]
        else:
            g_l = jnp.zeros_like(x_in)
        acts = fused_gate(x_in, g_l, hidden)
        res_skip = conv1d(p["res_skip_layers"][str(i)], acts)
        if i < n_layers - 1:
            x = (x + res_skip[:, :hidden]) * x_mask
            output = output + res_skip[:, hidden:]
        else:
            output = output + res_skip
    return output * x_mask


def coupling_layer_reverse(p, x, x_mask, g, hidden: int):
    """Mean-only affine coupling, reverse direction
    (reference modules.py:440-459)."""
    half = x.shape[1] // 2
    x0, x1 = x[:, :half], x[:, half:]
    h = conv1d(p["pre"], x0) * x_mask
    h = wavenet(p["enc"], h, x_mask, g, hidden, kernel_size=5, dilation_rate=1, n_layers=3)
    m = conv1d(p["post"], h) * x_mask
    x1 = (x1 - m) * x_mask
    return jnp.concatenate([x0, x1], axis=1)


def flow_reverse(p, x, x_mask, g, cfg: RVCConfig, n_flows: int = 4):
    """ResidualCouplingBlock reverse (reference models.py:146-153): the flows
    list interleaves couplings (even indices, with params) and Flips.

    The identically-shaped couplings run as one lax.scan over stacked
    params (reverse order baked into the stack): same numerics, coupling
    body once in the HLO — part of keeping the synth executable small for
    remote compile/load (see models/hubert.py for the rationale)."""
    layer_list = [p["flows"][str(2 * i)] for i in reversed(range(n_flows))]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_list)

    def body(h, lp):
        h = jnp.flip(h, axis=1)  # Flip (reverse order: flip precedes coupling)
        return coupling_layer_reverse(lp, h, x_mask, g, cfg.hidden_channels), None

    x, _ = jax.lax.scan(body, x, stacked)
    return x


# ---------------------------------------------------------------------------
# NSF source (reference models.py:281-419)
# ---------------------------------------------------------------------------


def sine_gen(
    f0: jnp.ndarray,
    upp: int,
    sampling_rate: int,
    harmonic_num: int = 0,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
    noise: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
):
    """SineGen.forward (reference models.py:320-370): cumulative-phase sine
    with wrap correction, nearest/linear interpolation to sample rate, and
    voiced/unvoiced noise mixing.  f0: (B, T) frame-rate Hz."""
    dim = harmonic_num + 1
    f0 = f0[:, :, None]  # (B, T, 1)
    harmonics = jnp.arange(1, dim + 1, dtype=f0.dtype)
    f0_buf = f0 * harmonics  # (B, T, dim)
    rad_values = (f0_buf / sampling_rate) % 1.0
    # harmonic_num == 0 → rand_ini is all zero (models.py:337-341)
    tmp_over_one = jnp.cumsum(rad_values, axis=1) * upp
    tmp_over_one = interpolate_linear_align_corners(
        jnp.swapaxes(tmp_over_one, 1, 2), upp
    ).swapaxes(1, 2)
    rad_values_up = interpolate_nearest(jnp.swapaxes(rad_values, 1, 2), upp).swapaxes(1, 2)
    tmp_over_one = tmp_over_one % 1.0
    wraps = (tmp_over_one[:, 1:] - tmp_over_one[:, :-1]) < 0
    cumsum_shift = jnp.concatenate(
        [jnp.zeros_like(wraps[:, :1], dtype=rad_values_up.dtype), -1.0 * wraps], axis=1
    )
    sine_waves = jnp.sin(jnp.cumsum(rad_values_up + cumsum_shift, axis=1) * 2 * np.pi)
    sine_waves = sine_waves * sine_amp

    uv = (f0 > voiced_threshold).astype(sine_waves.dtype)
    uv = interpolate_nearest(jnp.swapaxes(uv, 1, 2), upp).swapaxes(1, 2)
    noise_amp = uv * noise_std + (1 - uv) * sine_amp / 3
    if noise is None:
        if rng is None:
            noise = jnp.zeros_like(sine_waves)
        else:
            noise = jax.random.normal(rng, sine_waves.shape, sine_waves.dtype)
    return sine_waves * uv + noise_amp * noise, uv


def source_module(p, f0, upp: int, sampling_rate: int, noise=None, rng=None):
    """SourceModuleHnNSF (reference models.py:373-419): sine harmonics ->
    linear merge -> tanh.  Returns (B, T*upp, 1)."""
    sine_wavs, _uv = sine_gen(f0, upp, sampling_rate, noise=noise, rng=rng)
    return jnp.tanh(linear(p["l_linear"], sine_wavs))


# ---------------------------------------------------------------------------
# HiFi-GAN resblocks + generators (reference modules.py:224-363, models.py:205-278, 422-522)
# ---------------------------------------------------------------------------


def _resblock1(p, x, kernel_size: int, dilations):
    for j, d in enumerate(dilations):
        xt = leaky_relu(x, LRELU_SLOPE)
        xt = conv1d(p["convs1"][str(j)], xt, padding=(kernel_size * d - d) // 2, dilation=d)
        xt = leaky_relu(xt, LRELU_SLOPE)
        xt = conv1d(p["convs2"][str(j)], xt, padding=(kernel_size - 1) // 2)
        x = xt + x
    return x


def _resblock2(p, x, kernel_size: int, dilations):
    for j, d in enumerate(dilations):
        xt = leaky_relu(x, LRELU_SLOPE)
        xt = conv1d(p["convs"][str(j)], xt, padding=(kernel_size * d - d) // 2, dilation=d)
        x = xt + x
    return x


def _resblock_stack(p, x, i: int, cfg: RVCConfig):
    num_kernels = len(cfg.resblock_kernel_sizes)
    xs = None
    for j, (k, d) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
        blk = p["resblocks"][str(i * num_kernels + j)]
        out = _resblock1(blk, x, k, d) if cfg.resblock == "1" else _resblock2(blk, x, k, d)
        xs = out if xs is None else xs + out
    return xs / num_kernels


def _nsf_stack(p, x, har_source, g, cfg: RVCConfig):
    """The conv upsampling stack of GeneratorNSF (reference models.py:494-516)
    given a precomputed harmonic source.  x: (B, inter, T),
    har_source: (B, 1, T*upp), g: (B, gin, 1) or None."""
    x = conv1d(p["conv_pre"], x, padding=3)
    if g is not None:
        x = x + conv1d(p["cond"], g)

    rates = cfg.upsample_rates
    for i, (u, k) in enumerate(zip(rates, cfg.upsample_kernel_sizes)):
        x = leaky_relu(x, LRELU_SLOPE)
        x = conv_transpose1d(p["ups"][str(i)], x, stride=u, padding=(k - u) // 2)
        if i + 1 < len(rates):
            stride_f0 = int(np.prod(rates[i + 1 :]))
            x_source = conv1d(
                p["noise_convs"][str(i)],
                har_source,
                stride=stride_f0,
                padding=stride_f0 // 2,
            )
        else:
            x_source = conv1d(p["noise_convs"][str(i)], har_source)
        x = x + x_source
        x = _resblock_stack(p, x, i, cfg)
    # reference models.py:513 uses F.leaky_relu's default slope (0.01)
    x = leaky_relu(x, 0.01)
    x = conv1d(p["conv_post"], x, padding=3)
    return jnp.tanh(x)


# conservative halo (input frames) covering the stack's receptive field:
# conv_pre(±3) + per-level resblocks (±60 level-samples -> shrunk by the
# upsample strides) + conv_post(±3) works out to ~12 frames for the shipped
# configs; 32 gives a wide safety margin at negligible cost.
NSF_WINDOW_HALO = 32


def generator_nsf_windowed(p, x, f0, g, cfg: RVCConfig, noise=None, rng=None,
                           window_frames: int = 256):
    """generator_nsf evaluated on fixed-size overlapping windows.

    The sine source (phase cumsum — inherently global) is computed over the
    full signal; the conv stack then runs on (B*n_windows, C, W + 2*halo)
    blocks and the central W*upp samples are stitched back.  Because every
    conv sees a static window-sized shape, the compiled program is
    independent of the audio length — no per-length recompile, and the
    executable stays small (the full-length program serializes to hundreds
    of MB for minute-scale audio).  With halo >= the stack's receptive
    field the result equals the unwindowed computation to fp precision.
    """
    b, c, t = x.shape
    upp = cfg.upp
    har = source_module(p["m_source"], f0.astype(jnp.float32), upp, cfg.sr,
                        noise=noise, rng=rng)
    har = jnp.swapaxes(har, 1, 2).astype(x.dtype)  # (B, 1, T*upp)

    w = window_frames
    h = NSF_WINDOW_HALO
    n_win = -(-t // w)
    t_pad = n_win * w

    xp = jnp.pad(x, ((0, 0), (0, 0), (h, t_pad - t + h)))
    hp = jnp.pad(har, ((0, 0), (0, 0), (h * upp, (t_pad - t + h) * upp)))

    starts = jnp.arange(n_win) * w  # window starts in original frame coords
    frame_idx = starts[:, None] + jnp.arange(w + 2 * h)[None, :]  # (N, W+2H)
    xw = jnp.take(xp, frame_idx, axis=2)  # (B, C, N, W+2H)
    xw = jnp.moveaxis(xw, 2, 1).reshape(b * n_win, c, w + 2 * h)
    samp_idx = (starts * upp)[:, None] + jnp.arange((w + 2 * h) * upp)[None, :]
    hw = jnp.take(hp, samp_idx, axis=2)
    hw = jnp.moveaxis(hw, 2, 1).reshape(b * n_win, 1, (w + 2 * h) * upp)

    gw = None
    if g is not None:
        gw = jnp.repeat(g, n_win, axis=0)  # (B*N, gin, 1)

    out = _nsf_stack(p, xw, hw, gw, cfg)  # (B*N, 1, (W+2H)*upp)
    out = out[:, :, h * upp : (h + w) * upp]
    out = out.reshape(b, n_win, 1, w * upp).swapaxes(1, 2).reshape(b, 1, t_pad * upp)
    return out[:, :, : t * upp]


def generator_nsf(p, x, f0, g, cfg: RVCConfig, noise=None, rng=None):
    """GeneratorNSF.forward (reference models.py:494-516).
    x: (B, inter, T), f0: (B, T) Hz at frame rate, g: (B, gin, 1)."""
    upp = cfg.upp
    # the sine source's phase cumsum runs in f0's dtype (fp32); only the
    # resulting waveform is cast down to the bf16 compute dtype of the convs
    har_source = source_module(p["m_source"], f0.astype(jnp.float32), upp, cfg.sr, noise=noise, rng=rng)
    har_source = jnp.swapaxes(har_source, 1, 2).astype(x.dtype)  # (B, 1, T*upp)
    return _nsf_stack(p, x, har_source, g, cfg)


def generator(p, x, g, cfg: RVCConfig):
    """Plain HiFi-GAN Generator (no-f0 models; reference models.py:253-272)."""
    x = conv1d(p["conv_pre"], x, padding=3)
    if g is not None:
        x = x + conv1d(p["cond"], g)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = leaky_relu(x, LRELU_SLOPE)
        x = conv_transpose1d(p["ups"][str(i)], x, stride=u, padding=(k - u) // 2)
        x = _resblock_stack(p, x, i, cfg)
    # reference models.py:268 uses F.leaky_relu's default slope (0.01)
    x = leaky_relu(x, 0.01)
    x = conv1d(p["conv_post"], x, padding=3)
    return jnp.tanh(x)


# ---------------------------------------------------------------------------
# Synthesizer inference (reference models.py:634-640 / 745-751 / 847-853 / 949-955)
# ---------------------------------------------------------------------------


def synthesizer_infer(
    params,
    cfg: RVCConfig,
    phone: jnp.ndarray,
    phone_lengths: jnp.ndarray,
    pitch: Optional[jnp.ndarray],
    nsff0: Optional[jnp.ndarray],
    sid: jnp.ndarray,
    noise_scale: float = 0.66666,
    rng: Optional[jax.Array] = None,
    zp_noise: Optional[jnp.ndarray] = None,
    sine_noise: Optional[jnp.ndarray] = None,
    dec_window_frames: Optional[int] = None,
):
    """Full .infer(): returns (B, 1, T*upp) waveform.

    When `rng` is given, noise is drawn from it; explicit zp_noise /
    sine_noise arrays override (golden-test determinism).  With neither,
    noise is zero (deterministic mode).

    dec_window_frames evaluates the NSF decoder in fixed-size windows
    (generator_nsf_windowed): length-independent compiled programs for the
    serving path.
    """
    g = embedding(params["emb_g"], sid)[:, :, None]  # (B, gin, 1)
    m_p, logs_p, x_mask = text_encoder(params["enc_p"], phone, pitch, phone_lengths, cfg)

    if zp_noise is None:
        if rng is not None:
            rng, sub = jax.random.split(rng)
            zp_noise = jax.random.normal(sub, m_p.shape, m_p.dtype)
        else:
            zp_noise = jnp.zeros_like(m_p)
    z_p = (m_p + jnp.exp(logs_p) * zp_noise * noise_scale) * x_mask
    z = flow_reverse(params["flow"], z_p, x_mask, g, cfg)
    z = z * x_mask

    if cfg.if_f0:
        assert nsff0 is not None
        if dec_window_frames and z.shape[-1] > dec_window_frames:
            return generator_nsf_windowed(
                params["dec"], z, nsff0, g, cfg, noise=sine_noise, rng=rng,
                window_frames=dec_window_frames,
            )
        return generator_nsf(
            params["dec"], z, nsff0, g, cfg, noise=sine_noise, rng=rng
        )
    return generator(params["dec"], z, g, cfg)
