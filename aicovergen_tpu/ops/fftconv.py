"""Uniform-partitioned overlap-save convolution with a bounded FFT size.

Long FIR convolution on TPU must NOT be done as one whole-signal FFT: the
XLA:TPU FFT lowering rejects very large 1-D transforms (a 120 s song plus a
reverb tail needs a 2^23-point rfft, which dies with ``UNIMPLEMENTED: TPU
backend error`` on v5e — the round-2 BENCH regression).  Instead the filter
is split into K partitions of ``part`` samples, each transformed once at a
fixed nfft = 2*part, and the input is processed as a batch of 50 %-overlapped
frames (classic uniform-partitioned overlap-save with a frequency-domain
delay line):

    y[j*part : (j+1)*part] = irfft( sum_k  X[j-k] * H[k] )[part:]

with  X[j] = rfft(x[(j-1)*part : (j+1)*part]).  Every FFT is exactly
nfft = 2*part points — a power of two independent of both the signal and the
filter length — and the frames form a leading batch dimension, so the device
sees a handful of large batched FFTs plus K fused multiply-adds instead of a
giant monolithic transform.  The result is the *exact* linear convolution
(x * h)[:T] in fp32 (each output sample is produced by exactly one frame at
full overlap-save validity; no approximation is introduced by partitioning).

Serves the effects reverb (ops/reverb.py: freeverb wet path, reference
src/main.py:206-226) and the zero-phase VC high-pass (ops/filters.py,
reference src/vc_infer_pipeline.py:513) — the two whole-song filters in the
pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Default partition length.  nfft = 2*PART = 2^17 — far below the TPU FFT
# limit, large enough that a 4-minute song is ~160 frames (batched FFTs keep
# the MXU-adjacent FFT units busy; smaller parts raise the K multiply count).
PART = 1 << 16


def partition_filter(h: np.ndarray, part: int = PART) -> np.ndarray:
    """Host-side: real IR ``h`` (L,) -> partitioned rfft bank (K, part+1, 2)
    float32 (real/imag planes) at nfft = 2*part, K = ceil(L/part).

    The bank is shipped as FLOAT pairs, not complex64, so the compiled
    program's ABI stays complex-free: remote-device transports (the axon
    TPU tunnel) have incomplete complex-buffer support, and a complex64
    executable argument is exactly the kind of edge its transfer layer
    trips on.  The complex view is formed inside the program."""
    h = np.asarray(h, np.float64)
    L = h.shape[-1]
    k = max(1, -(-L // part))
    hp = np.zeros((k, part), np.float64)
    hp.reshape(-1)[:L] = h
    Hc = np.fft.rfft(hp, n=2 * part, axis=-1)
    return np.stack([Hc.real, Hc.imag], axis=-1).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("part",))
def overlap_save_apply(x: jnp.ndarray, Hf: jnp.ndarray, part: int = PART) -> jnp.ndarray:
    """Exact linear convolution of ``x`` (T,) with every filter in ``Hf``.

    Hf: (n_out, K, part+1, 2) float32 partitioned transfer bank from
    ``partition_filter`` (stacked over n_out filters sharing one input — the
    stereo freeverb applies the L and R networks to one mono feed; last axis
    is real/imag so the jit ABI carries no complex buffers).
    Returns (n_out, T) float32 = (x * h_o)[:T].

    All FFTs are nfft = 2*part regardless of T or filter length; compiled
    program count depends only on the (bucketed) frame count, not on K-free
    signal details.
    """
    H = jax.lax.complex(Hf[..., 0], Hf[..., 1])
    x = x.astype(jnp.float32)
    T = x.shape[-1]
    n_blocks = -(-T // part)
    K = H.shape[1]
    # frames[j] = xp[j*part : (j+2)*part) where xp has `part` leading zeros:
    # frame j spans input samples [(j-1)*part, (j+1)*part)
    xp = jnp.pad(x, (part, n_blocks * part - T))
    a = xp.reshape(n_blocks + 1, part)
    frames = jnp.concatenate([a[:-1], a[1:]], axis=-1)  # (n_blocks, 2*part)
    X = jnp.fft.rfft(frames, axis=-1)  # (n_blocks, part+1) complex64
    # frequency-domain delay line: Y[j] = sum_k X[j-k] * H[k]
    Xp = jnp.pad(X, ((K - 1, 0), (0, 0)))
    Y = jnp.zeros((H.shape[0],) + X.shape, jnp.complex64)
    for k in range(K):  # static, small (reverb tail / part)
        Xs = jax.lax.slice_in_dim(Xp, K - 1 - k, K - 1 - k + n_blocks, axis=0)
        Y = Y + Xs[None, :, :] * H[:, k, None, :]
    y = jnp.fft.irfft(Y, n=2 * part, axis=-1)[..., part:]  # keep valid half
    return y.reshape(H.shape[0], -1)[:, :T].astype(jnp.float32)


def ir_from_rfft_grid(H_grid: np.ndarray, length: int) -> np.ndarray:
    """Host-side: transfer function sampled on an rfft grid -> the first
    ``length`` samples of its (real) impulse response.  The grid must be at
    least ~2x the IR's effective decay length so the circular wrap sits below
    the truncation floor."""
    h = np.fft.irfft(np.asarray(H_grid, np.complex128))
    return h[:length]
