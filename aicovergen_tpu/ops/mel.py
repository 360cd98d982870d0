"""Mel filterbanks and log-mel spectrograms (librosa-compatible).

RMVPE builds its 128-bin mel basis with librosa.filters.mel(htk=True,
norm='slaney') (reference src/rmvpe.py:277-284); librosa is not a
dependency here, so the filterbank math is implemented from the published
formulas (HTK mel scale, Slaney area normalization).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def hz_to_mel(f, htk: bool = False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz(m, htk: bool = False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (np.power(10.0, m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    return np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
    dtype=np.float32,
) -> np.ndarray:
    """librosa.filters.mel equivalent -> (n_mels, 1 + n_fft//2)."""
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2), htk)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(dtype)


def log_mel_spectrogram(
    audio: jnp.ndarray,
    mel_basis: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: np.ndarray,
    clamp: float = 1e-5,
):
    """Log-mel with the reference MelSpectrogram semantics
    (reference src/rmvpe.py:295-325, keyshift=0 path): torch.stft magnitude
    -> mel matmul -> log(clamp).  `window` is a concrete numpy array."""
    from .stft import stft

    spec = stft(audio, n_fft=n_fft, hop=hop, window=window, center=True)
    magnitude = jnp.abs(spec)
    mel = jnp.matmul(jnp.asarray(mel_basis), magnitude)
    return jnp.log(jnp.clip(mel, min=clamp))
