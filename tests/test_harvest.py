"""Harvest f0 estimator: synthetic-ground-truth accuracy, voicing decisions,
distinctness from the dio role estimator, and dispatcher contract.

pyworld is unavailable in this environment, so parity is pinned the only
verifiable way: against analytically known f0 tracks (the reference's own
harvest quality on such signals is within a few cents, so agreement with
ground truth bounds divergence from the reference transitively)."""

import numpy as np

from aicovergen_tpu.pipeline.harvest import harvest_f0


SR = 16000


def _harmonic_signal(f0_track, amps=(0.6, 0.3, 0.15), noise=0.005, seed=0):
    phase = 2 * np.pi * np.cumsum(f0_track) / SR
    x = sum(a * np.sin((i + 1) * phase) for i, a in enumerate(amps))
    return x + noise * np.random.default_rng(seed).standard_normal(f0_track.size)


def _truth_at_frames(f0_track, p_len):
    idx = np.minimum((np.arange(p_len) * 0.01 * SR).astype(int), f0_track.size - 1)
    return f0_track[idx]


def test_harvest_vibrato_accuracy():
    """Vibrato (220 Hz +-4 % at 5 Hz): median error < 5 cents, p95 < 15."""
    t = np.arange(SR * 5) / SR
    f0_true = 220.0 * (1 + 0.04 * np.sin(2 * np.pi * 5.0 * t))
    x = _harmonic_signal(f0_true)
    p_len = 500
    f0 = harvest_f0(x, p_len)
    truth = _truth_at_frames(f0_true, p_len)
    voiced = f0 > 0
    assert voiced.mean() > 0.95
    cents = 1200 * np.abs(np.log2(f0[voiced] / truth[voiced]))
    assert np.median(cents) < 5.0, np.median(cents)
    assert np.percentile(cents, 95) < 15.0, np.percentile(cents, 95)


def test_harvest_wide_glide():
    """Octave glide 100->400 Hz tracks without octave errors."""
    t = np.arange(SR * 4) / SR
    f0_true = 100.0 * 2.0 ** (t / 2.0)  # two octaves over 4 s
    x = _harmonic_signal(f0_true, seed=1)
    p_len = 400
    f0 = harvest_f0(x, p_len)
    truth = _truth_at_frames(f0_true, p_len)
    voiced = f0 > 0
    assert voiced.mean() > 0.9
    cents = 1200 * np.abs(np.log2(f0[voiced] / truth[voiced]))
    # no octave jumps anywhere on the voiced track
    assert np.max(cents) < 600, np.max(cents)
    assert np.median(cents) < 10.0, np.median(cents)


def test_harvest_voicing_decision():
    """Noise is overwhelmingly unvoiced; gated voiced regions are caught."""
    rng = np.random.default_rng(3)
    t = np.arange(SR * 6) / SR
    f0c = 180 + 60 * np.sin(2 * np.pi * 0.3 * t)
    phase = 2 * np.pi * np.cumsum(f0c) / SR
    sig = 0.5 * np.sin(phase) + 0.25 * np.sin(2 * phase)
    gate = np.floor(t / 1.0) % 2 == 0
    x = np.where(gate, sig, 0.02 * rng.standard_normal(t.size))
    f0 = harvest_f0(x, 600)
    fg = gate[np.minimum((np.arange(600) * 0.01 * SR).astype(int), t.size - 1)]
    v = f0 > 0
    assert (v & fg).sum() / fg.sum() > 0.9  # recall
    assert (v & ~fg).sum() / (~fg).sum() < 0.2  # false voicing

    pure_noise = 0.1 * rng.standard_normal(SR * 2)
    assert (harvest_f0(pure_noise, 200) > 0).mean() < 0.2


def test_harvest_differs_from_dio():
    """VERDICT r02 item 5: harvest and dio must be DISTINCT estimators —
    the reference treats them as different pyworld methods
    (vc_infer_pipeline.py:27-38 vs :300-309)."""
    from aicovergen_tpu.pipeline.f0 import F0Estimator

    t = np.arange(SR * 3) / SR
    f0_true = 160.0 * (1 + 0.03 * np.sin(2 * np.pi * 4.0 * t))
    x = _harmonic_signal(f0_true, seed=4)
    est = F0Estimator()
    h = est.compute(x, 300, "harvest", filter_radius=3)
    d = est.compute(x, 300, "dio", filter_radius=3)
    assert h.shape == d.shape == (300,)
    # both track the truth ...
    truth = _truth_at_frames(f0_true, 300)
    for trk in (h, d):
        m = trk > 0
        assert m.mean() > 0.8
        cents = 1200 * np.abs(np.log2(trk[m] / truth[m]))
        assert np.median(cents) < 40.0
    # ... but are not the same algorithm output
    both = (h > 0) & (d > 0)
    assert not np.allclose(h[both], d[both])


def test_harvest_degenerate_inputs():
    assert np.all(harvest_f0(np.zeros(SR), 100) == 0)
    assert harvest_f0(np.zeros(10), 50).shape == (50,)
    # short-but-real input still returns the requested length
    t = np.arange(SR // 2) / SR
    f0 = harvest_f0(np.sin(2 * np.pi * 200 * t), 200)
    assert f0.shape == (200,)


def test_f0_divergence_warnings_surface():
    """VERDICT r02 item 9: serving surfaces attach a divergence note to the
    job result when a role-equivalent f0 method is selected."""
    from aicovergen_tpu.pipeline.f0 import f0_divergence_warnings

    assert f0_divergence_warnings("rmvpe") == []
    assert f0_divergence_warnings("mangio-crepe") == []
    assert f0_divergence_warnings(None) == []
    assert len(f0_divergence_warnings("harvest")) == 1
    assert "harvest" in f0_divergence_warnings("harvest")[0]
    assert len(f0_divergence_warnings("pm")) == 1
    assert len(f0_divergence_warnings("hybrid[harvest+dio+rmvpe]")) == 2
