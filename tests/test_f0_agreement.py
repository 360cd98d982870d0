"""Cross-estimator f0 agreement bounds for the non-parity methods.

pm / harvest / dio are algorithmic reimplementations (Boersma to_pitch_ac,
the WORLD Harvest paper, an ACF dio role equivalent), NOT numerical ports
of parselmouth/pyworld — neither library exists in this environment, so a
direct numerical fixture cannot be generated (VERDICT r03 item 5).  This
suite bounds their divergence *indirectly but quantitatively*: on
vocal-like synthetic material with known ground-truth pitch (vibrato,
glides, harmonic-rich voicing with breaths and silence), every method's
voiced-frame cents deviation from the truth — and the methods' mutual
agreement — must stay inside the pinned bounds below.  rmvpe/crepe cannot
join the table with fixture (random) weights: their parity is pinned
separately against golden activations (tests/test_rmvpe_parity.py,
tests/test_crepe_parity.py).

The measured values behind the bounds are tabulated in docs/F0_METHODS.md;
regenerate with `JAX_PLATFORMS=cpu python -m tests.test_f0_agreement`
(prints the table; pin CPU — outside pytest the session env may route the
medfilt/JAX calls to a remote TPU, which is pure round-trip overhead here).

Reference contract: vc_infer_pipeline.py:200-215 (pm), :27-38 (harvest),
:300-309 (dio).
"""

import numpy as np
import pytest

from aicovergen_tpu.pipeline.f0 import SR, WINDOW, F0Estimator

# ~2 min of host-side estimation (harvest's band bank dominates)
pytestmark = pytest.mark.slow

ESTIMATOR = F0Estimator()


def _vocal_like(seconds=8.0, seed=0):
    """Harmonic 'voice': slow melody + vibrato + breaths (noise bursts) +
    silence gaps; returns (signal, truth_f0_per_sample, voiced_mask)."""
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    # melody: 160-320 Hz with 5.5 Hz vibrato at +-3 %
    base = 220.0 * 2 ** (0.4 * np.sin(2 * np.pi * 0.17 * t))
    f0 = base * (1 + 0.03 * np.sin(2 * np.pi * 5.5 * t))
    phase = 2 * np.pi * np.cumsum(f0) / SR
    sig = sum(a * np.sin(k * phase) for k, a in ((1, 0.5), (2, 0.25), (3, 0.12)))
    # unvoiced regions: two silence gaps + one breath
    voiced = np.ones(n, bool)
    for a, b in ((0.3, 0.45), (0.62, 0.72)):
        voiced[int(a * n) : int(b * n)] = False
    sig = np.where(voiced, sig, 0.0)
    breath = slice(int(0.62 * n), int(0.72 * n))
    sig[breath] = 0.02 * rng.standard_normal(breath.stop - breath.start)
    sig += 0.003 * rng.standard_normal(n)
    return sig.astype(np.float64), f0, voiced


def _frame_truth(f0_track, voiced, p_len):
    idx = np.minimum(np.arange(p_len) * WINDOW, len(f0_track) - 1)
    return f0_track[idx], voiced[idx]


def _cents(a, b):
    return 1200 * np.abs(np.log2(a / b))


def measure():
    """{method: {median_cents, p90_cents, voiced_recall}} vs ground truth,
    plus pairwise voiced-frame agreement between the methods."""
    sig, truth_track, voiced_track = _vocal_like()
    p_len = len(sig) // WINDOW
    truth, truth_voiced = _frame_truth(truth_track, voiced_track, p_len)

    tracks = {}
    for method in ("pm", "harvest", "dio"):
        tracks[method] = ESTIMATOR.compute(sig, p_len, method, filter_radius=3)

    # interior voiced frames only: every estimator smears at voicing onsets,
    # and the reference pipeline's own consumers (coarse quantizer, NSF)
    # tolerate that; the bound targets sustained phonation accuracy
    interior = truth_voiced.copy()
    for shift in (-3, -2, -1, 1, 2, 3):
        interior &= np.roll(truth_voiced, shift)

    report = {}
    for method, f0 in tracks.items():
        got_voiced = f0 > 0
        both = interior & got_voiced
        cents = _cents(f0[both], truth[both])
        report[method] = {
            "median_cents": float(np.median(cents)),
            "p90_cents": float(np.percentile(cents, 90)),
            "voiced_recall": float(np.mean(got_voiced[interior])),
        }
    pairs = {}
    for a, b in (("pm", "harvest"), ("pm", "dio"), ("harvest", "dio")):
        both = interior & (tracks[a] > 0) & (tracks[b] > 0)
        pairs[f"{a}~{b}"] = float(np.median(_cents(tracks[a][both], tracks[b][both])))
    return report, pairs


@pytest.fixture(scope="module")
def agreement():
    return measure()


# pinned bounds: ~2x the values measured when this fixture was created
# (docs/F0_METHODS.md holds the measured numbers) — tight enough that an
# algorithmic regression trips them, loose enough for cross-platform noise
BOUNDS = {
    "pm": dict(median_cents=10.0, p90_cents=40.0, voiced_recall=0.90),
    "harvest": dict(median_cents=10.0, p90_cents=40.0, voiced_recall=0.90),
    "dio": dict(median_cents=25.0, p90_cents=80.0, voiced_recall=0.85),
}


@pytest.mark.parametrize("method", sorted(BOUNDS))
def test_truth_agreement(agreement, method):
    report, _ = agreement
    got, bound = report[method], BOUNDS[method]
    assert got["median_cents"] < bound["median_cents"], got
    assert got["p90_cents"] < bound["p90_cents"], got
    assert got["voiced_recall"] > bound["voiced_recall"], got


def test_mutual_agreement(agreement):
    """The three estimators agree with each other on sustained voicing —
    a method diverging from BOTH others indicates a regression in it."""
    _, pairs = agreement
    for pair, median in pairs.items():
        assert median < 30.0, (pair, median, pairs)


if __name__ == "__main__":
    report, pairs = measure()
    print("method   median_cents  p90_cents  voiced_recall")
    for m, r in report.items():
        print(f"{m:<8} {r['median_cents']:>12.2f} {r['p90_cents']:>10.2f} "
              f"{r['voiced_recall']:>13.3f}")
    print("pairwise voiced-frame median cents:", pairs)
