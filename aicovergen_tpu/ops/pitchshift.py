"""Semitone pitch shifting via phase vocoder (sox `pitch` replacement).

The reference shells out to sox to pitch-shift instrumentals/backup vocals
when a global key change is requested (reference src/main.py:138-147).
Here: phase-vocoder time stretch (with phase accumulation expressed as a
cumsum, so it vectorizes) followed by polyphase resampling back to the
original duration — all on device.

Exact sox-WSOLA sample parity is not a goal (perceptual parity is); the
spectral envelope and duration contracts match.
"""

from __future__ import annotations

import functools
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from .resample import resample
from .stft import hann_window, istft, stft


def _nearest_peak_indices(mag: jnp.ndarray) -> jnp.ndarray:
    """Per frame: assign each bin the index of its nearest spectral peak
    (local maximum).  mag: (bins,) -> (bins,) int32."""
    bins = mag.shape[0]
    left = jnp.concatenate([jnp.full((1,), -jnp.inf, mag.dtype), mag[:-1]])
    right = jnp.concatenate([mag[1:], jnp.full((1,), -jnp.inf, mag.dtype)])
    is_peak = (mag >= left) & (mag > right)
    idx = jnp.arange(bins)
    prev_peak = jax.lax.associative_scan(jnp.maximum, jnp.where(is_peak, idx, -1))
    next_peak = bins - 1 - jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_peak[::-1], idx, -1)
    )[::-1]
    prev_valid = prev_peak >= 0
    next_valid = next_peak <= bins - 1
    use_prev = prev_valid & (~next_valid | (idx - prev_peak <= next_peak - idx))
    return jnp.where(use_prev, prev_peak, jnp.where(next_valid, next_peak, idx)).astype(
        jnp.int32
    )


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_a", "hop_s"))
def _pv_stretch(x: jnp.ndarray, n_fft: int, hop_a: int, hop_s: int) -> jnp.ndarray:
    """Phase-vocoder stretch by hop_s/hop_a with identity phase locking
    (Puckette): non-peak bins inherit their peak's synthesis phase rotation,
    which removes the amplitude 'phasiness' of the basic vocoder.
    Per-bin frequency estimation is vectorized; only the inevitable
    frame-to-frame phase accumulation runs as a lax.scan."""
    window = hann_window(n_fft)
    spec = stft(x, n_fft, hop_a, window)  # (bins, frames) — 1-D input
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)

    omega = (2.0 * np.pi * np.arange(n_fft // 2 + 1) * hop_a / n_fft).astype(np.float32)
    dphase = jnp.diff(phase, axis=-1) - omega[:, None]
    dphase = dphase - 2.0 * np.pi * jnp.round(dphase / (2.0 * np.pi))  # princarg
    advance = (omega[:, None] + dphase) * (hop_s / hop_a)  # (bins, frames-1)

    def step(prev_syn, inp):
        adv_t, mag_t, phase_t = inp
        peaks = _nearest_peak_indices(mag_t)
        syn_at_peak = prev_syn[peaks] + adv_t[peaks]
        syn = syn_at_peak + (phase_t - phase_t[peaks])
        return syn, syn

    init = phase[:, 0]
    _, syn_phases = jax.lax.scan(
        step,
        init,
        (advance.T, mag[:, 1:].T, phase[:, 1:].T),
    )
    new_phase = jnp.concatenate([init[None], syn_phases], axis=0).T  # (bins, frames)
    out_spec = mag * jnp.exp(1j * new_phase)
    return istft(out_spec, n_fft, hop_s, window)


def pitch_shift(audio: jnp.ndarray, sr: int, semitones: float, n_fft: int = 2048) -> jnp.ndarray:
    """(..., T) -> (..., T) pitch-shifted by `semitones` (duration preserved)."""
    if semitones == 0:
        return audio
    factor = 2.0 ** (semitones / 12.0)
    # stretch duration by `factor`, then resample by 1/factor
    hop_a = 512
    hop_s = int(round(hop_a * factor))
    if audio.ndim == 1:
        stretched = _pv_stretch(audio, n_fft, hop_a, hop_s)
    else:
        flat = audio.reshape(-1, audio.shape[-1])
        stretched = jax.vmap(lambda ch: _pv_stretch(ch, n_fft, hop_a, hop_s))(flat)
        stretched = stretched.reshape(audio.shape[:-1] + (stretched.shape[-1],))
    # resample back to the original duration: the true stretch ratio is
    # exactly hop_s/hop_a, so the resampling fraction is hop_a/hop_s
    out = resample(stretched, hop_s, hop_a)
    target = audio.shape[-1]
    if out.shape[-1] >= target:
        return out[..., :target]
    pad = [(0, 0)] * (out.ndim - 1) + [(0, target - out.shape[-1])]
    return jnp.pad(out, pad)
