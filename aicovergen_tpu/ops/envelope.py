"""RMS envelope mixing (the `rms_mix_rate` feature).

Reproduces change_rms (reference src/vc_infer_pipeline.py:41-60): half-second
RMS tracks of the source and converted audio, linearly interpolated to the
output length (torch F.interpolate align_corners=False semantics), and the
output scaled by rms_in^(1-rate) * rms_out^(rate-1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def linear_interp_1d(values: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch.nn.functional.interpolate(mode='linear', align_corners=False)
    on the last axis."""
    in_len = values.shape[-1]
    scale = in_len / out_len
    pos = (jnp.arange(out_len) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, in_len - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_len - 1)
    w = pos - lo
    return values[..., lo] * (1.0 - w) + values[..., hi] * w


def frame_rms(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """librosa.feature.rms equivalent (center=True, zero pad).

    The frame index is generated in-graph (iota): as a host-numpy constant
    it gets baked into the executable — measured 115 MB of HLO for the
    cover pipeline's rms-mix program, dominating its cold-start load."""
    pad = frame_length // 2
    xp = jnp.pad(x, (pad, pad))
    n_frames = 1 + (xp.shape[-1] - frame_length) // hop_length
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop_length
        + jnp.arange(frame_length, dtype=jnp.int32)[None, :]
    )
    frames = jnp.take(xp, idx, axis=-1)
    return jnp.sqrt(jnp.mean(jnp.square(frames), axis=-1))


@functools.partial(jax.jit, static_argnames=("sr_in", "sr_out"))
def mix_rms_envelope(
    source: jnp.ndarray, sr_in: int, converted: jnp.ndarray, sr_out: int, rate: float
) -> jnp.ndarray:
    rms1 = frame_rms(source, sr_in // 2 * 2, sr_in // 2)
    rms2 = frame_rms(converted, sr_out // 2 * 2, sr_out // 2)
    out_len = converted.shape[-1]
    rms1 = linear_interp_1d(rms1, out_len)
    rms2 = jnp.maximum(linear_interp_1d(rms2, out_len), 1e-6)
    gain = jnp.power(rms1, 1.0 - rate) * jnp.power(rms2, rate - 1.0)
    return converted * gain
