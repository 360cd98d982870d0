"""Boersma to_pitch_ac implementation (pipeline/praat_ac.py).

No parselmouth ships in this environment, so these are algorithm-property
tests (the same standard as the WORLD Harvest tests): correct pitch on
synthetic tones, octave robustness on harmonic-rich signals (the octave
cost + Viterbi are exactly what separates Boersma's method from a naive
ACF argmax), voicing segmentation, and the reference's p_len pad contract.
"""

import numpy as np

from aicovergen_tpu.pipeline.praat_ac import praat_ac_f0

SR = 16000


def _tone(freq, seconds, amp=0.4):
    t = np.arange(int(seconds * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float64)


def _voiced_err_cents(f0, target):
    v = f0[f0 > 0]
    assert v.size > 0.5 * f0.size, "mostly voiced expected"
    return np.abs(1200 * np.log2(v / target))


def test_pure_tone_pitch():
    x = _tone(220.0, 1.0)
    f0 = praat_ac_f0(x, p_len=100)
    # interior frames: within 5 cents of 220 Hz
    cents = _voiced_err_cents(f0[10:-10], 220.0)
    assert np.median(cents) < 5.0, np.median(cents)


def test_silence_is_unvoiced():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(SR) * 1e-6  # far below silence threshold
    f0 = praat_ac_f0(x, p_len=100)
    assert np.all(f0 == 0.0)


def test_voicing_segmentation():
    x = np.concatenate([_tone(196.0, 1.0), np.zeros(SR), _tone(196.0, 1.0)])
    f0 = praat_ac_f0(x, p_len=300)
    third = len(f0) // 3
    assert np.mean(f0[5 : third - 5] > 0) > 0.8
    assert np.mean(f0[third + 10 : 2 * third - 10] == 0) > 0.8
    assert np.mean(f0[2 * third + 5 : -5] > 0) > 0.8


def test_harmonic_rich_no_octave_error():
    """A sawtooth's ACF has a near-equal peak at twice the period; the
    octave cost and the octave-jump Viterbi cost must keep the track at the
    true f0 (this is the case a plain argmax tracker fails)."""
    t = np.arange(int(1.5 * SR)) / SR
    freq = 150.0
    x = 0.4 * (2 * ((freq * t) % 1.0) - 1.0)  # sawtooth, all harmonics
    f0 = praat_ac_f0(x, p_len=150)
    cents = _voiced_err_cents(f0[10:-10], freq)
    assert np.median(cents) < 20.0, np.median(cents)
    # no frame at the sub-octave
    v = f0[f0 > 0]
    assert np.all(v > 100.0), v.min()


def test_glide_tracks_smoothly():
    t = np.arange(int(2 * SR)) / SR
    inst = 200.0 * (2.0 ** (t / 2.0))  # 200 -> 400 Hz over 2 s
    phase = 2 * np.pi * np.cumsum(inst) / SR
    x = 0.4 * np.sin(phase)
    f0 = praat_ac_f0(x, p_len=200)
    v = f0[20:-20]
    v = v[v > 0]
    assert v.size > 100
    assert v.min() > 180 and v.max() < 430
    # roughly monotonic: the smoothed diff is positive
    d = np.diff(np.convolve(v, np.ones(9) / 9, mode="valid"))
    assert np.mean(d > -0.5) > 0.95


def test_p_len_pad_contract():
    x = _tone(220.0, 0.5)
    for p_len in (10, 50, 200):
        f0 = praat_ac_f0(x, p_len=p_len)
        assert f0.shape == (p_len,)
