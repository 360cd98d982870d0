"""IIR / FIR filtering as TPU-parallel primitives.

The reference leaned on scipy for a 5th-order Butterworth 48 Hz high-pass
applied with filtfilt (reference src/vc_infer_pipeline.py:22, :513) and
3-tap median filtering of f0 tracks (:299).  A per-sample loop is a
non-starter on TPU, so IIR filtering is expressed as a cascade of biquad
(second-order-section) linear recurrences evaluated with
`jax.lax.associative_scan` — O(log n) parallel depth instead of O(n)
sequential steps, and SOS keeps the matrix products float32-stable
(a single order-N companion recurrence has pseudospectral transient growth
that overflows f32 for clustered poles).

Coefficient *design* stays on host (scipy — tiny, one-time); all *filtering*
runs on device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def butter_highpass(order: int, cutoff_hz: float, fs: float) -> Tuple[np.ndarray, np.ndarray]:
    """scipy.signal.butter(N, Wn, 'high', fs=fs) — host-side design."""
    from scipy import signal

    b, a = signal.butter(N=order, Wn=cutoff_hz, btype="high", fs=fs)
    return np.asarray(b, np.float64), np.asarray(a, np.float64)


def tf2sos(b, a) -> np.ndarray:
    from scipy import signal

    return np.asarray(signal.tf2sos(b, a), np.float64)


def _biquad_state_space(section: np.ndarray):
    """Transposed DF-II state space of one biquad [b0 b1 b2 1 a1 a2].

    z[n] = A z[n-1] + B x[n];  y[n] = z1[n-1] + b0 x[n].
    """
    b0, b1, b2, a0, a1, a2 = section
    b0, b1, b2, a1, a2 = b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0
    A = np.array([[-a1, 1.0], [-a2, 0.0]])
    B = np.array([b1 - a1 * b0, b2 - a2 * b0])
    return A, B, b0


def _sosfilt_jax(sos: np.ndarray, x: jnp.ndarray, zi: np.ndarray | None):
    from .scan_utils import matrix_linear_scan

    y = x
    n_sections = sos.shape[0]
    for s in range(n_sections):
        A, B, d = _biquad_state_space(sos[s])
        Aj = jnp.asarray(A, y.dtype)
        Bj = jnp.asarray(B, y.dtype)
        z0 = (
            jnp.zeros((2,), y.dtype)
            if zi is None
            else jnp.asarray(zi[s], y.dtype)
        )
        b_seq = y[:, None] * Bj[None, :]
        z = matrix_linear_scan(Aj, b_seq, z0)
        z_prev = jnp.concatenate([z0[None], z[:-1]], axis=0)
        y = z_prev[:, 0] + d * y
    return y


def sosfilt(sos: np.ndarray, x: jnp.ndarray, zi: np.ndarray | None = None) -> jnp.ndarray:
    """scipy.signal.sosfilt equivalent on a 1-D signal (TPU-parallel)."""
    return _sosfilt_jax(np.asarray(sos, np.float64), jnp.asarray(x), zi)


def lfilter(b, a, x: jnp.ndarray) -> jnp.ndarray:
    """scipy.signal.lfilter equivalent via an SOS cascade."""
    return sosfilt(tf2sos(b, a), x)


def sosfiltfilt(sos: np.ndarray, x: jnp.ndarray, padlen: int | None = None) -> jnp.ndarray:
    """Zero-phase forward-backward filtering with odd-extension padding and
    scipy-compatible per-section initial conditions."""
    from scipy import signal

    sos = np.asarray(sos, np.float64)
    x = jnp.asarray(x)
    if padlen is None:
        padlen = 3 * (2 * sos.shape[0] + 1)
    if x.shape[-1] <= padlen:
        raise ValueError("input too short for filtfilt padding")
    left = 2 * x[0] - x[1 : padlen + 1][::-1]
    right = 2 * x[-1] - x[-padlen - 1 : -1][::-1]
    ext = jnp.concatenate([left, x, right])

    zi = signal.sosfilt_zi(sos)  # (n_sections, 2), host-side
    y = _sosfilt_jax(sos, ext, zi * np.asarray(ext[0]))
    y = _sosfilt_jax(sos, y[::-1], zi * np.asarray(y[-1]))[::-1]
    return y[padlen : padlen + x.shape[-1]]


def filtfilt(b, a, x: jnp.ndarray) -> jnp.ndarray:
    """scipy.signal.filtfilt-compatible zero-phase filter (SOS internally).

    Edge-transient handling matches sosfiltfilt; away from the first/last
    few hundred samples this is numerically identical to scipy.filtfilt —
    the property the VC high-pass (reference src/vc_infer_pipeline.py:513)
    actually relies on.
    """
    ntaps = max(len(np.atleast_1d(a)), len(np.atleast_1d(b)))
    return sosfiltfilt(tf2sos(b, a), x, padlen=3 * (ntaps - 1))


@functools.lru_cache(maxsize=8)
def _zero_phase_bank(b_bytes: bytes, a_bytes: bytes, L: int):
    """Host-side: the zero-phase response |H(omega)|^2 as a centered FIR of
    half-width L, partitioned for the bounded-FFT overlap-save engine.
    Returns (1, K, PART+1, 2) float32 (see ops/fftconv.py)."""
    from scipy import signal

    from .fftconv import PART, partition_filter

    b = np.frombuffer(b_bytes, np.float64)
    a = np.frombuffer(a_bytes, np.float64)
    # IR recovered on a >=4L grid so its own circular wrap sits far below
    # the +-L truncation floor
    n_grid = 1 << (4 * max(L, 1)).bit_length()
    _w, h = signal.freqz(b, a, worN=n_grid // 2 + 1, whole=False)
    ir = np.fft.irfft(np.abs(h) ** 2, n=n_grid)
    h_c = np.concatenate([ir[-L:], ir[: L + 1]])  # centered, length 2L+1
    return partition_filter(h_c, PART)[None]


def zero_phase_fft(b, a, x: jnp.ndarray, pad_seconds_samples: int = 16000) -> jnp.ndarray:
    """Zero-phase IIR filtering in the frequency domain: the even FIR
    irfft(|H(omega)|^2), truncated at +-padlen, convolved with the
    odd-extended signal by bounded-FFT partitioned overlap-save
    (ops/fftconv.py — every device FFT is 2^17 points).

    Mathematically this is filtfilt with reflected boundary handling; for
    long signals the interior matches scipy.filtfilt to ~1e-5 — the
    TPU-native path for the VC input high-pass (reference
    vc_infer_pipeline.py:513).  A single whole-track pow-2 FFT (the old
    formulation) is 2^22 points for a 2-minute song and ran ~2.7 s on the
    TPU FFT unit; the partitioned form is length-independent per block and
    ~50x faster at that scale.  The time-domain SOS cascade (sosfiltfilt
    above) remains for exact-parity needs.

    PRECONDITION: the filter's zero-phase impulse response must decay to
    negligible within `padlen` samples (min(pad_seconds_samples, T-1)) —
    the IR is truncated there.  The 48 Hz high-pass this serves has an IR
    of ~10^2 samples, far inside the 16000-sample guard.  New call sites
    with sharper filters must raise pad_seconds_samples (or use
    sosfiltfilt).
    """
    from .fftconv import PART, overlap_save_apply

    x = jnp.asarray(x)
    T = x.shape[-1]
    padlen = min(pad_seconds_samples, T - 1)
    L = padlen
    left = 2 * x[0] - x[1 : padlen + 1][::-1]
    right = 2 * x[-1] - x[-padlen - 1 : -1][::-1]
    # trailing L zeros so the conv's group delay window [L+padlen, L+padlen+T)
    # stays inside the overlap-save output (which is truncated at its input
    # length)
    ext = jnp.concatenate([left, x, right, jnp.zeros((L,), x.dtype)])
    bank = _zero_phase_bank(
        np.ascontiguousarray(np.atleast_1d(b), np.float64).tobytes(),
        np.ascontiguousarray(np.atleast_1d(a), np.float64).tobytes(),
        L,
    )
    y = overlap_save_apply(ext, jnp.asarray(bank), PART)[0]
    return y[L + padlen : L + padlen + T].astype(x.dtype)


def medfilt(x: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """scipy.signal.medfilt equivalent (zero-padded edges) on 1-D input."""
    assert kernel_size % 2 == 1
    half = kernel_size // 2
    xp = jnp.pad(jnp.asarray(x), (half, half))
    stacked = jnp.stack([xp[i : i + x.shape[-1]] for i in range(kernel_size)], axis=0)
    return jnp.median(stacked, axis=0)
