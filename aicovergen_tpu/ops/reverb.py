"""Freeverb (JUCE/pedalboard Reverb) as a block-parallel JAX op.

The reference post-processes AI vocals with pedalboard's Reverb — JUCE's
Freeverb: 8 parallel damped feedback combs + 4 serial allpasses per channel,
stereo spread 23 samples, tunings scaled from 44.1 kHz
(reference src/main.py:206-226).  Parameter mapping matches JUCE:
roomSize -> feedback 0.28*size + 0.7, damping *= 0.4, wet gains
3*wet*0.5*(1±width), dry gain 2*dry, fixed input gain 0.015.

A per-sample loop is hopeless on TPU; instead each comb/allpass is evaluated
in blocks no longer than its delay line: within such a block every delayed
read lands in already-computed state, so the block is fully vectorized and
only the damping one-pole needs an (associative) scan.  The outer loop over
blocks is a `lax.scan`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

COMB_TUNINGS = (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)
ALLPASS_TUNINGS = (556, 441, 341, 225)
STEREO_SPREAD = 23


def _scaled(delays, sr: int):
    return tuple(int(round(d * sr / 44100.0)) for d in delays)


def _comb_pass_multi(x: jnp.ndarray, delays, feedback: float, damp: float) -> jnp.ndarray:
    """Damped feedback combs, all advancing in one scan.  x: (T,) input
    (pre-gained).  Returns per-comb outputs (n_combs, T) so a stereo caller
    can run BOTH channels' 8-comb banks (16 lines, different tunings) in a
    single sequential scan — the comb scan is the latency-bound part of
    Freeverb, so halving the number of scans ~halves the stage.

    All combs advance together in blocks of min(delay) samples (within such a
    block every delayed read lands in already-computed state); the delay
    lines live in one (n_combs, dmax) buffer so each scan step is a single
    gather + one batched associative scan instead of unrolled copies."""
    n_combs = len(delays)
    dmax = max(delays)
    block = min(delays)
    T = x.shape[0]
    n_blocks = -(-T // block)
    xp = jnp.pad(x, (0, n_blocks * block - T)).reshape(n_blocks, block)

    d1 = jnp.float32(damp)
    d2 = jnp.float32(1.0 - damp)
    fb = jnp.float32(feedback)
    # per-comb read window inside the shared (n_combs, dmax) buffer
    read_idx = jnp.asarray(
        np.array([dmax - D + np.arange(block) for D in delays]), jnp.int32
    )

    def combine(l, r):
        a1, b1 = l
        a2, b2 = r
        return a1 * a2, b1 * a2 + b2

    def step(state, xb):
        bufs, fss = state  # (n_combs, dmax), (n_combs,)
        outs = jnp.take_along_axis(bufs, read_idx, axis=1)  # (n_combs, block)
        # fs[n] = d1*fs[n-1] + d2*out[n], batched over combs
        a_cum, b_cum = jax.lax.associative_scan(
            combine, (jnp.full_like(outs, d1), d2 * outs), axis=1
        )
        fs_seq = a_cum * fss[:, None] + b_cum
        writes = xb[None, :] + fs_seq * fb
        new_bufs = jnp.concatenate([bufs[:, block:], writes], axis=1)
        return (new_bufs, fs_seq[:, -1]), outs

    init = (jnp.zeros((n_combs, dmax), jnp.float32), jnp.zeros((n_combs,), jnp.float32))
    _, out = jax.lax.scan(step, init, xp)  # (n_blocks, n_combs, block)
    return out.swapaxes(0, 1).reshape(n_combs, -1)[:, :T]


def _comb_pass(x: jnp.ndarray, delays, feedback: float, damp: float) -> jnp.ndarray:
    """Sum of one channel's damped feedback combs (see _comb_pass_multi)."""
    return _comb_pass_multi(x, delays, feedback, damp).sum(axis=0)


def _allpass_pass(x: jnp.ndarray, delay: int) -> jnp.ndarray:
    """One freeverb allpass: y[n] = -x[n] + b[n-D]; b[n] = x[n] + 0.5 b[n-D].

    Phase-decomposed: with n = j*D + p the buffer recurrence is
    b[j, p] = x[j, p] + 0.5 * b[j-1, p] — a first-order linear recurrence
    along j, independent per phase p — so the whole filter is one parallel
    (log-depth) associative scan instead of T/D sequential scan steps
    (T/D is ~23k for the 225-sample line on a 2-minute song)."""
    from .scan_utils import first_order_linear_scan

    T = x.shape[0]
    n_blocks = -(-T // delay)
    xp = jnp.pad(x, (0, n_blocks * delay - T)).reshape(n_blocks, delay)
    b = first_order_linear_scan(jnp.full_like(xp, 0.5), xp)
    b_prev = jnp.concatenate([jnp.zeros((1, delay), xp.dtype), b[:-1]], axis=0)
    return (-xp + b_prev).reshape(-1)[:T]


@functools.partial(
    jax.jit, static_argnames=("sr", "room_size", "damping", "wet_level", "dry_level", "width")
)
def freeverb(
    audio: jnp.ndarray,
    sr: int,
    room_size: float = 0.5,
    damping: float = 0.5,
    wet_level: float = 0.33,
    dry_level: float = 0.4,
    width: float = 1.0,
) -> jnp.ndarray:
    """(2, T) or (1, T)/(T,) float audio -> reverberated, same shape.

    Stereo uses JUCE's cross-mixed wet gains; the comb/allpass network input
    is the channel mean times the fixed 0.015 gain (JUCE feeds (L+R)*gain).
    """
    x = audio
    squeeze = False
    if x.ndim == 1:
        x = x[None]
        squeeze = True
    stereo = x.shape[0] == 2

    feedback = room_size * 0.28 + 0.7
    damp = damping * 0.4
    wet = wet_level * 3.0
    dry_gain = dry_level * 2.0
    wet1 = wet * 0.5 * (1.0 + width)
    wet2 = wet * 0.5 * (1.0 - width)
    gain = 0.015

    # JUCE mono-sums the input into both channels' networks
    mono_in = jnp.mean(x, axis=0) * gain

    def allpass_chain(y, spread: int):
        for ap in _scaled([a + spread for a in ALLPASS_TUNINGS], sr):
            y = _allpass_pass(y, ap)
        return y

    if stereo:
        # both channels' comb banks (16 lines) advance in ONE scan; the
        # allpasses are log-depth parallel scans, cheap to run per channel
        combs = _scaled(COMB_TUNINGS, sr) + _scaled(
            [c + STEREO_SPREAD for c in COMB_TUNINGS], sr
        )
        outs = _comb_pass_multi(mono_in.astype(jnp.float32), combs, feedback, damp)
        out_l = allpass_chain(outs[:8].sum(axis=0), 0)
        out_r = allpass_chain(outs[8:].sum(axis=0), STEREO_SPREAD)
    else:
        combs = _scaled(COMB_TUNINGS, sr)
        out_l = allpass_chain(
            _comb_pass(mono_in.astype(jnp.float32), combs, feedback, damp), 0
        )
    if stereo:
        left = out_l * wet1 + out_r * wet2 + x[0] * dry_gain
        right = out_r * wet1 + out_l * wet2 + x[1] * dry_gain
        result = jnp.stack([left, right])
    else:
        result = (out_l * (wet1 + wet2) + x[0] * dry_gain)[None]
    return result[0] if squeeze else result


# ------------------------------------------------------------- FFT freeverb
#
# The whole Freeverb network is LTI: each damped feedback comb and each
# "allpass" is a rational transfer function in z^-1, so the wet path per
# channel is   H_ch(z) = (sum_combs H_c) * (prod_allpasses H_a)   and the
# reverb can be applied EXACTLY (up to a truncated decay tail below fp32
# noise) as a convolution with the network's impulse response.  This replaces
# the latency-bound block scan (~T/min(delay) sequential steps, the single
# most expensive part of the effects stage on a remote TPU) with batched
# bounded-size FFTs — fully parallel on device.
#
# The convolution runs as uniform-partitioned overlap-save (ops/fftconv.py):
# a single whole-song rfft would need 2^23 points for a 120 s track plus the
# decay tail, which the XLA:TPU FFT lowering rejects outright (the round-2
# BENCH regression); partitioning fixes every FFT at 2^17 points independent
# of song length and room size, with zero loss of exactness.
#
# JUCE comb:     y[n] = x[n-D] + fb*f[n-D],  f[n] = d2*y[n] + d1*f[n-1]
#   -> H_c(z) = z^-D (1 - d1 z^-1) / (1 - d1 z^-1 - fb d2 z^-D)
# JUCE allpass:  b[n] = x[n] + 0.5 b[n-D],  y[n] = -x[n] + b[n-D]
#   -> H_a(z) = (-1 + 1.5 z^-D) / (1 - 0.5 z^-D)


def _freeverb_tail_samples(feedback: float, delays) -> int:
    """Padding needed so the circular wrap of the true infinite impulse
    response sits below 1e-6 of the input scale: the slowest comb loses a
    factor `feedback` every `max(delay)` samples (damping only decays
    faster)."""
    rounds = math.ceil(math.log(1e-6) / math.log(max(min(feedback, 0.9995), 1e-3)))
    return int(rounds * max(delays))


@functools.lru_cache(maxsize=16)
def _freeverb_transfer(sr: int, nfft: int, feedback: float, damp: float):
    """Host-side (numpy) wet-path transfer functions on the rfft grid.
    Returns (H_l, H_r) complex128 of shape (nfft//2+1,)."""
    k = np.arange(nfft // 2 + 1)
    zinv = np.exp(-2j * np.pi * k / nfft)  # z^-1 on the grid
    d1, d2 = np.float64(damp), np.float64(1.0 - damp)

    def comb_bank(delays):
        h = np.zeros_like(zinv)
        one_pole = 1.0 - d1 * zinv
        for D in delays:
            zd = zinv**D
            h += zd * one_pole / (one_pole - feedback * d2 * zd)
        return h

    def allpass_chain(delays):
        h = np.ones_like(zinv)
        for D in delays:
            zd = zinv**D
            h *= (-1.0 + 1.5 * zd) / (1.0 - 0.5 * zd)
        return h

    h_l = comb_bank(_scaled(COMB_TUNINGS, sr)) * allpass_chain(
        _scaled(ALLPASS_TUNINGS, sr)
    )
    h_r = comb_bank(_scaled([c + STEREO_SPREAD for c in COMB_TUNINGS], sr)) * allpass_chain(
        _scaled([a + STEREO_SPREAD for a in ALLPASS_TUNINGS], sr)
    )
    return h_l, h_r


@functools.lru_cache(maxsize=16)
def _freeverb_partitions(sr: int, feedback: float, damp: float, stereo: bool):
    """Host-side partitioned wet-path filter bank for overlap-save apply.

    The wet IR is truncated where the slowest comb's envelope drops below
    1e-6 of the input scale (same floor the old whole-song grid used for its
    circular wrap), recovered by an inverse FFT on a 2x-longer host grid so
    the grid's own wrap sits at ~1e-12, then partitioned into 2^16-sample
    blocks (ops/fftconv.py).  Returns (n_ch, K, PART+1, 2) float32 real/imag
    planes (complex-free jit ABI) ready to ship to the device as a jit
    argument."""
    from .fftconv import PART, ir_from_rfft_grid, partition_filter

    delays = _scaled([c + STEREO_SPREAD for c in COMB_TUNINGS], sr)
    length = _freeverb_tail_samples(feedback, delays)
    grid = 1 << max(2 * length - 1, 1).bit_length()
    h_l_grid, h_r_grid = _freeverb_transfer(sr, grid, feedback, damp)
    banks = [partition_filter(ir_from_rfft_grid(h_l_grid, length), PART)]
    if stereo:
        banks.append(partition_filter(ir_from_rfft_grid(h_r_grid, length), PART))
    return np.stack(banks)


def freeverb_os_core(x, H, wet1: float, wet2: float, dry_gain: float, stereo: bool):
    """Traceable wet/dry mix body — call inside an enclosing jit (the fused
    effects chain, pipeline/effects.py) or via the jitted `_freeverb_os_apply`."""
    from .fftconv import PART, overlap_save_apply

    mono_in = jnp.mean(x, axis=0) * jnp.float32(0.015)
    wet = overlap_save_apply(mono_in, H, PART)  # (n_ch, T) exact linear conv
    if stereo:
        out_l, out_r = wet[0], wet[1]
        left = out_l * wet1 + out_r * wet2 + x[0] * dry_gain
        right = out_r * wet1 + out_l * wet2 + x[1] * dry_gain
        return jnp.stack([left, right])
    return (wet[0] * (wet1 + wet2) + x[0] * dry_gain)[None]


_freeverb_os_apply = functools.partial(jax.jit, static_argnames=("wet1", "wet2", "dry_gain", "stereo"))(freeverb_os_core)


def freeverb_fft_plan(
    sr: int,
    stereo: bool,
    room_size: float = 0.5,
    damping: float = 0.5,
    wet_level: float = 0.33,
    dry_level: float = 0.4,
    width: float = 1.0,
):
    """Host-side plan for the partitioned freeverb: the reference parameter
    mapping (pedalboard Reverb semantics) plus the partitioned filter bank,
    already device-resident (cached: the same reverb settings across covers
    re-upload nothing — the bank is a few MB, ~30 ms per cover over a
    remote-TPU tunnel).  Returns (H_bank device f32, wet1, wet2, dry_gain)."""
    feedback = room_size * 0.28 + 0.7
    damp = damping * 0.4
    wet = wet_level * 3.0
    wet1 = wet * 0.5 * (1.0 + width)
    wet2 = wet * 0.5 * (1.0 - width)
    H = _freeverb_bank_device(sr, round(feedback, 9), round(damp, 9), stereo)
    return H, float(wet1), float(wet2), float(dry_level * 2.0)


@functools.lru_cache(maxsize=16)
def _freeverb_bank_device(sr: int, feedback: float, damp: float, stereo: bool):
    return jnp.asarray(_freeverb_partitions(sr, feedback, damp, stereo))


def freeverb_fft(
    audio: jnp.ndarray,
    sr: int,
    room_size: float = 0.5,
    damping: float = 0.5,
    wet_level: float = 0.33,
    dry_level: float = 0.4,
    width: float = 1.0,
) -> jnp.ndarray:
    """Frequency-domain freeverb — same semantics and parameter mapping as
    `freeverb` (the block-scan reference), validated against it in
    tests/test_effects.py.  Runs as bounded-FFT partitioned convolution, so
    it is safe at any production length on TPU (every FFT is 2^17 points)."""
    x = audio
    squeeze = False
    if x.ndim == 1:
        x = x[None]
        squeeze = True
    stereo = x.shape[0] == 2

    H, wet1, wet2, dry_gain = freeverb_fft_plan(
        sr, stereo, room_size, damping, wet_level, dry_level, width
    )
    result = _freeverb_os_apply(
        x.astype(jnp.float32), jnp.asarray(H), wet1, wet2, dry_gain, stereo
    )
    return result[0] if squeeze else result
