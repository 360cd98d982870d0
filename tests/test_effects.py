"""Effects parity: freeverb vs a per-sample reference loop, compressor
behavior, phase-vocoder pitch shift frequency contract."""

import numpy as np
import pytest

import jax.numpy as jnp

from aicovergen_tpu.ops.dynamics import compressor
from aicovergen_tpu.ops.pitchshift import pitch_shift
from aicovergen_tpu.ops.reverb import (
    ALLPASS_TUNINGS,
    COMB_TUNINGS,
    STEREO_SPREAD,
    freeverb,
)


def _freeverb_reference(x_mono, sr, room_size, damping, wet, dry, width):
    """Per-sample freeverb (JUCE Reverb algorithm) as ground truth."""
    feedback = room_size * 0.28 + 0.7
    damp = damping * 0.4
    gain = 0.015
    T = len(x_mono)

    def channel(spread):
        combs = [int(round((c + spread) * sr / 44100)) for c in COMB_TUNINGS]
        aps = [int(round((a + spread) * sr / 44100)) for a in ALLPASS_TUNINGS]
        bufs = [np.zeros(d) for d in combs]
        fss = [0.0] * len(combs)
        apbufs = [np.zeros(d) for d in aps]
        out = np.zeros(T)
        idxs = [0] * len(combs)
        apidx = [0] * len(aps)
        xin = x_mono * gain
        for n in range(T):
            total = 0.0
            for ci, D in enumerate(combs):
                o = bufs[ci][idxs[ci]]
                fss[ci] = o * (1 - damp) + fss[ci] * damp
                bufs[ci][idxs[ci]] = xin[n] + fss[ci] * feedback
                idxs[ci] = (idxs[ci] + 1) % D
                total += o
            y = total
            for ai, D in enumerate(aps):
                bufout = apbufs[ai][apidx[ai]]
                apbufs[ai][apidx[ai]] = y + bufout * 0.5
                apidx[ai] = (apidx[ai] + 1) % D
                y = -y + bufout
            out[n] = y
        return out

    wet3 = wet * 3.0
    wet1 = wet3 * 0.5 * (1 + width)
    wet2 = wet3 * 0.5 * (1 - width)
    l = channel(0)
    return l * (wet1 + wet2) + x_mono * dry * 2.0


def test_freeverb_matches_per_sample_reference():
    sr = 8000
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    ours = np.asarray(
        freeverb(jnp.asarray(x), sr, room_size=0.15, damping=0.7, wet_level=0.2, dry_level=0.8)
    )
    ref = _freeverb_reference(x.astype(np.float64), sr, 0.15, 0.7, 0.2, 0.8, 1.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


def test_freeverb_stereo_shapes_and_spread():
    sr = 16000
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((2, sr)) * 0.1).astype(np.float32)
    out = np.asarray(freeverb(jnp.asarray(x), sr))
    assert out.shape == (2, sr)
    # stereo spread makes channels differ even for identical input
    same = np.asarray(freeverb(jnp.asarray(np.stack([x[0], x[0]])), sr))
    assert np.abs(same[0] - same[1]).max() > 1e-6


def test_compressor_attenuates_above_threshold():
    sr = 16000
    t = np.arange(sr) / sr
    loud = (0.9 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    quiet = (0.01 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    out_loud = np.asarray(compressor(jnp.asarray(loud), sr))
    out_quiet = np.asarray(compressor(jnp.asarray(quiet), sr))
    # quiet signal passes ~unchanged; loud is compressed toward threshold
    np.testing.assert_allclose(out_quiet, quiet, atol=1e-5)
    steady = np.abs(out_loud[sr // 2 :]).max()
    # static curve: 0.9 -> thr*(0.9/thr)^(1/4) with thr=10^(-15/20)≈0.178
    expected = 0.178 * (0.9 / 0.178) ** 0.25
    assert abs(steady - expected) / expected < 0.1


def test_compressor_release_tail():
    """After a burst ends, gain recovers with ~100 ms release."""
    sr = 16000
    x = np.zeros(sr, np.float32)
    x[: sr // 4] = 0.9
    out = np.asarray(compressor(jnp.asarray(x), sr))
    assert np.abs(out[: sr // 4]).max() < 0.9  # compressed during burst
    assert np.abs(out[sr // 2 :]).max() < 1e-6  # silence stays silence


def test_pitch_shift_frequency_doubles():
    sr = 16000
    t = np.arange(2 * sr) / sr
    x = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    y = np.asarray(pitch_shift(jnp.asarray(x), sr, 12.0))
    assert y.shape == x.shape
    spec = np.abs(np.fft.rfft(y[sr // 2 : sr // 2 + sr]))
    peak_hz = np.argmax(spec) * sr / sr
    assert abs(peak_hz - 400) < 10, peak_hz
    # zero shift is the identity
    np.testing.assert_array_equal(np.asarray(pitch_shift(jnp.asarray(x), sr, 0)), x)


def test_pallas_freeverb_matches_scan():
    """The fused Pallas Freeverb kernel (interpret mode on CPU) must equal
    the scan implementation sample-for-sample."""
    from aicovergen_tpu.ops.reverb import freeverb
    from aicovergen_tpu.ops.reverb_pallas import HAVE_PALLAS, freeverb_pallas

    if not HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(3)
    sr = 44100
    audio = rng.standard_normal((2, sr)).astype(np.float32) * 0.3
    ref = np.asarray(freeverb(jnp.asarray(audio), sr, 0.15, 0.7, 0.2, 0.8))
    out = np.asarray(freeverb_pallas(jnp.asarray(audio), sr, 0.15, 0.7, 0.2, 0.8))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    # mono path too
    mono = audio[0]
    ref1 = np.asarray(freeverb(jnp.asarray(mono), sr, 0.5, 0.5, 0.33, 0.4))
    out1 = np.asarray(freeverb_pallas(jnp.asarray(mono), sr, 0.5, 0.5, 0.33, 0.4))
    np.testing.assert_allclose(out1, ref1, atol=1e-5)


def test_fft_freeverb_matches_scan():
    """The LTI frequency-domain path (freeverb_fft) must agree with the
    blockwise-scan implementation to fp32 noise across parameter extremes."""
    from aicovergen_tpu.ops.reverb import freeverb_fft

    rng = np.random.default_rng(5)
    for sr, T, kw in [
        (44100, 30000, dict(room_size=0.15, damping=0.7, wet_level=0.2, dry_level=0.8)),
        (40960, 25000, dict(room_size=0.95, damping=0.05, wet_level=0.6, dry_level=0.2)),
        (16000, 16000, dict(width=0.3)),
    ]:
        x = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32) * 0.3)
        a = np.asarray(freeverb(x, sr, **kw))
        b = np.asarray(freeverb_fft(x, sr, **kw))
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
        assert err < 1e-5, (sr, T, kw, err)
    mono = jnp.asarray(rng.standard_normal(12000).astype(np.float32))
    a = np.asarray(freeverb(mono, 44100))
    b = np.asarray(freeverb_fft(mono, 44100))
    assert np.max(np.abs(a - b)) / np.max(np.abs(a)) < 1e-5


def test_overlap_save_matches_direct_convolution():
    """The bounded-FFT partitioned engine must be the EXACT linear
    convolution across every block/partition boundary case: filter shorter
    than a partition, spanning several partitions, signal shorter than one
    block, signal crossing many blocks."""
    from aicovergen_tpu.ops.fftconv import overlap_save_apply, partition_filter

    rng = np.random.default_rng(7)
    part = 256  # small partition so a unit test exercises K>1 and many blocks
    for T, L in [(100, 40), (1000, 700), (5000, 1500), (255, 1024)]:
        x = rng.standard_normal(T).astype(np.float32)
        h1 = rng.standard_normal(L).astype(np.float32) * np.exp(
            -np.arange(L) / (L / 4)
        ).astype(np.float32)
        h2 = rng.standard_normal(L).astype(np.float32)
        H = np.stack([partition_filter(h1, part), partition_filter(h2, part)])
        y = np.asarray(overlap_save_apply(jnp.asarray(x), jnp.asarray(H), part))
        ref = np.stack([
            np.convolve(x.astype(np.float64), h1.astype(np.float64))[:T],
            np.convolve(x.astype(np.float64), h2.astype(np.float64))[:T],
        ])
        scale = np.abs(ref).max() + 1e-12
        assert np.max(np.abs(y - ref)) / scale < 1e-5, (T, L)


@pytest.mark.slow
def test_fft_freeverb_production_length():
    """The default reverb path at the 120 s length class — the exact shape
    class that crashed the round-2 bench on TPU (whole-song 2^23 FFT).  The
    partitioned path must execute AND equal the whole-song frequency-domain
    product (computed host-side in numpy, where huge FFTs are legal)."""
    from aicovergen_tpu.ops.reverb import (
        _freeverb_tail_samples,
        _freeverb_transfer,
        _scaled,
        freeverb_fft,
    )

    sr = 44100
    T = 120 * sr
    rng = np.random.default_rng(9)
    x = (rng.standard_normal((2, T)) * 0.1).astype(np.float32)
    kw = dict(room_size=0.15, damping=0.7, wet_level=0.2, dry_level=0.8)
    out = np.asarray(freeverb_fft(jnp.asarray(x), sr, **kw))
    assert out.shape == x.shape and np.isfinite(out).all()

    # host-side whole-song reference (the round-1 "exact" formulation)
    feedback = kw["room_size"] * 0.28 + 0.7
    damp = kw["damping"] * 0.4
    tail = _freeverb_tail_samples(
        feedback, _scaled([c + 23 for c in (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)], sr)
    )
    nfft = 1 << (T + tail - 1).bit_length()
    h_l, h_r = _freeverb_transfer(sr, nfft, round(feedback, 9), round(damp, 9))
    mono = x.mean(axis=0).astype(np.float64) * 0.015
    X = np.fft.rfft(mono, n=nfft)
    wet_l = np.fft.irfft(X * h_l, n=nfft)[:T]
    wet_r = np.fft.irfft(X * h_r, n=nfft)[:T]
    wet3 = kw["wet_level"] * 3.0
    ref = np.stack([
        wet_l * wet3 + x[0] * kw["dry_level"] * 2.0,
        wet_r * wet3 + x[1] * kw["dry_level"] * 2.0,
    ])
    err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-12)
    assert err < 1e-5, err


def test_reverb_dispatch_falls_back_on_backend_error(monkeypatch):
    """If the fft path raises at runtime the dispatcher must finish the cover
    on the scan path and latch the failure for later calls."""
    from aicovergen_tpu.pipeline import effects as fx

    monkeypatch.setattr(fx, "_FFT_REVERB_BROKEN", False)
    monkeypatch.delenv("AICG_REVERB", raising=False)

    def boom(*a, **k):
        raise RuntimeError("UNIMPLEMENTED: TPU backend error (synthetic)")

    import aicovergen_tpu.ops.reverb as rv

    monkeypatch.setattr(rv, "freeverb_fft", boom)
    sr = 16000
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, sr)).astype(np.float32))
    out = np.asarray(fx._reverb(x, sr, room_size=0.15, damping=0.7,
                                wet_level=0.2, dry_level=0.8))
    assert out.shape == (2, sr) and np.isfinite(out).all()
    assert fx._FFT_REVERB_BROKEN  # latched: later covers skip the fft try
    ref = np.asarray(rv.freeverb(x, sr, room_size=0.15, damping=0.7,
                                 wet_level=0.2, dry_level=0.8))
    np.testing.assert_allclose(out, ref, atol=1e-6)
