"""Compressor + first-order high-pass (pedalboard chain equivalents).

The reference's vocal chain is pedalboard [HighpassFilter(50 Hz),
Compressor(ratio=4, threshold=-15 dB), Reverb] (reference src/main.py:206-226).

The compressor reproduces the JUCE dsp::Compressor topology — envelope
follower with attack/release ballistics (1 ms / 100 ms defaults) and the
static gain (env/threshold)^(1/ratio - 1) above threshold — but the
branchy per-sample ballistics are decomposed into two TPU-parallel stages:
a max-decay release envelope (a max-plus associative scan) followed by a
one-pole attack smoother (a linear associative scan).  This matches the
sequential filter closely (identical release tails, attack transients within
one time constant) while running in O(log n) parallel depth.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _linear_one_pole(x: jnp.ndarray, a: float) -> jnp.ndarray:
    """y[n] = a*y[n-1] + (1-a)*x[n] via blockwise associative scan
    (y[-1]=x[0])."""
    from .scan_utils import first_order_linear_scan

    coef = jnp.full_like(x, a)
    b = (1.0 - a) * x
    b = b.at[0].add(a * x[0])
    return first_order_linear_scan(coef, b)


def _release_envelope(x: jnp.ndarray, r: float) -> jnp.ndarray:
    """y[n] = max(x[n], r*y[n-1]) — a max-plus blockwise associative scan."""
    from .scan_utils import max_decay_scan

    decay = jnp.full_like(x, r)
    return max_decay_scan(decay, x)


@functools.partial(
    jax.jit, static_argnames=("sr", "threshold_db", "ratio", "attack_ms", "release_ms")
)
def compressor(
    audio: jnp.ndarray,
    sr: int,
    threshold_db: float = -15.0,
    ratio: float = 4.0,
    attack_ms: float = 1.0,
    release_ms: float = 100.0,
) -> jnp.ndarray:
    """Feed-forward compressor on (..., T) audio (channels share the gain
    computed from the max across channels, JUCE-style link)."""
    x = audio if audio.ndim > 1 else audio[None]
    level = jnp.max(jnp.abs(x), axis=0)

    a_rel = math.exp(-1.0 / (sr * release_ms / 1000.0))
    a_att = math.exp(-1.0 / (sr * attack_ms / 1000.0))
    env = _release_envelope(level.astype(jnp.float32), a_rel)
    env = _linear_one_pole(env, a_att)

    threshold = 10.0 ** (threshold_db / 20.0)
    gain = jnp.where(
        env > threshold, (env / threshold) ** (1.0 / ratio - 1.0), 1.0
    )
    out = x * gain[None, :]
    return out if audio.ndim > 1 else out[0]


def highpass_1st_order(audio: jnp.ndarray, sr: int, cutoff_hz: float = 50.0) -> jnp.ndarray:
    """pedalboard HighpassFilter equivalent: first-order butterworth.

    Specialized to the scalar recurrence y[n] = b0 x[n] + b1 x[n-1] - a1 y[n-1]
    (one log-depth linear scan) instead of the generic SOS cascade, whose 2x2
    state matmuls per sample cost ~2 s on a 2-minute song."""
    from scipy import signal

    from .scan_utils import first_order_linear_scan

    (section,) = signal.butter(1, cutoff_hz, btype="high", fs=sr, output="sos")
    b0, b1, _b2, _a0, a1, _a2 = section
    x = audio if audio.ndim > 1 else audio[None]
    x = x.astype(jnp.float32)
    x_prev = jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]
    u = jnp.float32(b0) * x + jnp.float32(b1) * x_prev  # (C, T)
    coef = jnp.full_like(u, jnp.float32(-a1))
    out = first_order_linear_scan(coef.T, u.T).T  # scan runs on leading axis
    return out if audio.ndim > 1 else out[0]
