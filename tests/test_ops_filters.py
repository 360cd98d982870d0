"""Filtering / resample / envelope parity vs scipy + torch."""

import numpy as np
import torch
from scipy import signal as sps

import jax.numpy as jnp

from aicovergen_tpu.ops.filters import butter_highpass, lfilter, filtfilt, medfilt
from aicovergen_tpu.ops.envelope import frame_rms, linear_interp_1d, mix_rms_envelope
from aicovergen_tpu.ops.resample import resample, resample_poly_np
from aicovergen_tpu.ops.mel import mel_filterbank


def test_lfilter_matches_scipy():
    b, a = butter_highpass(5, 48, 16000)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4000).astype(np.float64)
    ours = np.asarray(lfilter(b, a, jnp.asarray(x)))
    theirs = sps.sosfilt(sps.tf2sos(b, a), x)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-10)
    # tf vs sos realizations agree away from pathological cases
    np.testing.assert_allclose(ours, sps.lfilter(b, a, x), rtol=1e-5, atol=1e-7)


def test_filtfilt_matches_scipy():
    """The VC input high-pass (reference src/vc_infer_pipeline.py:22, :513)."""
    b, a = butter_highpass(5, 48, 16000)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(16000).astype(np.float64)
    ours = np.asarray(filtfilt(b, a, jnp.asarray(x)))
    # exact vs the sos formulation with identical padding
    theirs_sos = sps.sosfiltfilt(sps.tf2sos(b, a), x, padlen=15)
    np.testing.assert_allclose(ours, theirs_sos, rtol=1e-6, atol=1e-9)
    # and equivalent to scipy.filtfilt away from edge transients (the
    # initial-condition difference decays with the ~0.99 pole radius,
    # i.e. within a few thousand samples)
    theirs_tf = sps.filtfilt(b, a, x)
    np.testing.assert_allclose(ours[4000:-4000], theirs_tf[4000:-4000], rtol=1e-5, atol=1e-6)


def test_filtfilt_float32_stable():
    """f32 (TPU-native) path must stay finite and accurate on long audio."""
    b, a = butter_highpass(5, 48, 16000)
    rng = np.random.default_rng(7)
    x = rng.standard_normal(160000).astype(np.float32)
    ours = np.asarray(filtfilt(b, a, jnp.asarray(x)))
    assert np.all(np.isfinite(ours))
    ref = sps.filtfilt(b, a, x.astype(np.float64))
    err = np.abs(ours[1000:-1000] - ref[1000:-1000]).max()
    assert err < 5e-3


def test_medfilt_matches_scipy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(101)
    np.testing.assert_allclose(np.asarray(medfilt(jnp.asarray(x), 3)), sps.medfilt(x, 3))


def test_frame_rms_matches_librosa_formula():
    """librosa.feature.rms with frame=sr, hop=sr//2 on a known signal."""
    sr = 1000
    x = np.sin(np.linspace(0, 40 * np.pi, 5 * sr)).astype(np.float32)
    ours = np.asarray(frame_rms(jnp.asarray(x), sr // 2 * 2, sr // 2))
    # manual reference: center pad with zeros, frame, rms
    pad = sr // 2
    xp = np.pad(x, (pad, pad))
    n_frames = 1 + (len(xp) - sr) // (sr // 2)
    ref = np.array(
        [np.sqrt(np.mean(xp[i * (sr // 2) : i * (sr // 2) + sr] ** 2)) for i in range(n_frames)]
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_linear_interp_matches_torch():
    rng = np.random.default_rng(3)
    v = rng.standard_normal(37).astype(np.float32)
    out = np.asarray(linear_interp_1d(jnp.asarray(v), 250))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(v)[None, None], size=250, mode="linear"
    )[0, 0].numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=2e-5)


def test_change_rms_matches_reference_math():
    """mix_rms_envelope vs a direct numpy/torch transcription of change_rms
    (reference src/vc_infer_pipeline.py:41-60)."""
    rng = np.random.default_rng(4)
    sr1, sr2 = 16000, 40000
    data1 = rng.standard_normal(sr1 * 3).astype(np.float32)
    data2 = rng.standard_normal(sr2 * 3).astype(np.float32)
    rate = 0.25

    ours = np.asarray(mix_rms_envelope(jnp.asarray(data1), sr1, jnp.asarray(data2), sr2, rate))

    def np_rms(y, frame, hop):
        pad = frame // 2
        yp = np.pad(y, (pad, pad))
        n = 1 + (len(yp) - frame) // hop
        return np.array([np.sqrt(np.mean(yp[i * hop : i * hop + frame] ** 2)) for i in range(n)])

    rms1 = torch.from_numpy(np_rms(data1, sr1 // 2 * 2, sr1 // 2)[None, None, :].astype(np.float32))
    rms2 = torch.from_numpy(np_rms(data2, sr2 // 2 * 2, sr2 // 2)[None, None, :].astype(np.float32))
    rms1 = torch.nn.functional.interpolate(rms1, size=len(data2), mode="linear")[0, 0]
    rms2 = torch.nn.functional.interpolate(rms2, size=len(data2), mode="linear")[0, 0]
    rms2 = torch.max(rms2, torch.zeros_like(rms2) + 1e-6)
    ref = data2 * (rms1 ** (1 - rate) * rms2 ** (rate - 1)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_resample_matches_scipy_poly():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(40000).astype(np.float32)
    ours = np.asarray(resample(jnp.asarray(x), 40000, 16000))
    theirs = resample_poly_np(x, 40000, 16000)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_mel_filterbank_htk_slaney_properties():
    """Structural checks of the librosa-compatible filterbank used by RMVPE
    (reference src/rmvpe.py:277-284): shape, support, slaney normalization."""
    fb = mel_filterbank(16000, 1024, 128, fmin=30, fmax=8000, htk=True)
    assert fb.shape == (128, 513)
    assert np.all(fb >= 0)
    # every filter has nonzero support and peaks strictly inside the band
    assert np.all(fb.sum(axis=1) > 0)
    # slaney norm: filter areas (in Hz) are ~2/(width)*width/2 = 1 → the
    # integral of each triangle against df is ~1
    df = 16000 / 2 / 512
    areas = fb.sum(axis=1) * df
    assert np.all(areas > 0.5) and np.all(areas < 1.6)


def test_zero_phase_fft_matches_filtfilt_interior():
    """The FFT zero-phase path (TPU production path for the VC high-pass)
    vs scipy.filtfilt away from edges."""
    from aicovergen_tpu.ops.filters import zero_phase_fft

    b, a = butter_highpass(5, 48, 16000)
    rng = np.random.default_rng(11)
    x = rng.standard_normal(160000).astype(np.float32)
    ours = np.asarray(zero_phase_fft(b, a, jnp.asarray(x)))
    ref = sps.filtfilt(b, a, x.astype(np.float64))
    err = np.abs(ours[8000:-8000] - ref[8000:-8000]).max()
    assert err < 1e-4, err
