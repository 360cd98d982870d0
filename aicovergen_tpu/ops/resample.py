"""Sample-rate conversion.

The reference resampled with librosa (reference src/vc_infer_pipeline.py:641-644)
and decoded at fixed rates via ffmpeg.  Here:
  * host path: scipy.signal.resample_poly (numpy in / numpy out), used at the
    I/O boundary;
  * device path: the same polyphase kaiser-windowed-sinc filter expressed as a
    strided jax convolution, so resampling inside the pipeline stays in HBM.
"""

from __future__ import annotations

import functools
import math
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np


def resample_poly_np(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    from scipy import signal

    if sr_in == sr_out:
        return x
    frac = Fraction(sr_out, sr_in)
    return signal.resample_poly(x, frac.numerator, frac.denominator, axis=-1).astype(x.dtype)


def _kaiser_sinc_kernel(up: int, down: int, dtype=np.float32) -> np.ndarray:
    """The default scipy.resample_poly anti-alias FIR (kaiser beta=5.0,
    half-width 10 zero crossings at the lower Nyquist)."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    n = 2 * half_len + 1
    t = np.arange(n) - half_len
    kernel = f_c * np.sinc(f_c * t) * np.kaiser(n, 5.0)
    return (kernel * up).astype(dtype)


@functools.partial(jax.jit, static_argnames=("up", "down"))
def _resample_jax(x: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    h = jnp.asarray(_kaiser_sinc_kernel(up, down))
    half_len = (h.shape[0] - 1) // 2
    batch_shape = x.shape[:-1]
    length = x.shape[-1]
    xb = x.reshape((-1, 1, length))
    # upsample by zero-stuffing via lhs_dilation, filter, then stride by down
    y = jax.lax.conv_general_dilated(
        xb,
        h[None, None, :],
        window_strides=(down,),
        padding=[(half_len, half_len + up - 1)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    out_len = -(-length * up // down)  # ceil
    return y.reshape(batch_shape + (y.shape[-1],))[..., :out_len]


def resample(x: jnp.ndarray, sr_in: int, sr_out: int) -> jnp.ndarray:
    """On-device polyphase resampling along the last axis."""
    if sr_in == sr_out:
        return x
    frac = Fraction(sr_out, sr_in)
    return _resample_jax(x, frac.numerator, frac.denominator)
