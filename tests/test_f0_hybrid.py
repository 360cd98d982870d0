"""hybrid[...] f0 combiner: member dispatch, median semantics, and a
functional end-to-end track (VERDICT r04 item 6 — previously only warning
COUNTS touched the hybrid path).

Reference contract: get_f0_hybrid_computation
(/root/reference/src/vc_infer_pipeline.py:175-260) — method-string parsing
(:188-191), 0.999-quantile amplitude normalization of the member input
(:196-197), first-frame drop for crepe/crepe-tiny/harvest/dio members
(:219-244), nanmedian across the stack (:255-259).  Documented repairs (see
pipeline/f0.py::_hybrid): members are length-fitted to p_len (the reference
nanmedians a ragged stack — a crash on modern numpy whenever members
disagree by one frame), and unvoiced zeros abstain (NaN) instead of dragging
the median to half-pitch.
"""

import numpy as np

from aicovergen_tpu.pipeline.f0 import F0Estimator, get_f0

SR = 16000


class FakeMemberEstimator(F0Estimator):
    """Intercepts member-method calls inside _hybrid with canned tracks and
    records the input each member saw."""

    def __init__(self, tracks):
        super().__init__()
        self.tracks = tracks
        self.calls = []

    def compute(self, x, p_len, method, filter_radius=3, crepe_hop_length=128):
        if method in self.tracks:
            self.calls.append((method, np.asarray(x, np.float64).copy()))
            return np.asarray(self.tracks[method], np.float64)
        return super().compute(x, p_len, method, filter_radius, crepe_hop_length)


def test_hybrid_parsing_and_member_dispatch():
    """'hybrid[harvest+pm]' splits on 'hybrid', strips brackets, '+'-joins
    (reference :188-191); each member is called exactly once."""
    p_len = 10
    est = FakeMemberEstimator(
        {"harvest": np.full(p_len + 1, 100.0), "pm": np.full(p_len, 300.0)}
    )
    out = est.compute(np.random.default_rng(0).standard_normal(SR), p_len, "hybrid[harvest+pm]")
    assert [m for m, _ in est.calls] == ["harvest", "pm"]
    assert out.shape == (p_len,)
    # nanmedian of two voiced members == their mean
    np.testing.assert_allclose(out, 200.0)


def test_hybrid_first_frame_drop_membership():
    """harvest/dio/crepe/crepe-tiny members lose their first frame
    (reference :219-244); pm and mangio-crepe do not."""
    p_len = 6
    # harvest's first frame is a 999 sentinel: if the drop were missing, the
    # median of frame 0 would include it
    est = FakeMemberEstimator(
        {
            "harvest": np.array([999.0] + [100.0] * p_len),
            "dio": np.array([999.0] + [100.0] * p_len),
            "mangio-crepe": np.full(p_len, 100.0),
        }
    )
    out = est.compute(np.zeros(SR), p_len, "hybrid[harvest+dio+mangio-crepe]")
    np.testing.assert_allclose(out, 100.0)


def test_hybrid_zero_abstain_and_all_unvoiced():
    """A member voting unvoiced (0) abstains from the median; frames every
    member calls unvoiced stay 0 (nan_to_num)."""
    p_len = 4
    est = FakeMemberEstimator(
        {
            "pm": np.array([200.0, 0.0, 0.0, 200.0]),
            "mangio-crepe": np.array([220.0, 210.0, 0.0, 0.0]),
        }
    )
    out = est.compute(np.zeros(SR), p_len, "hybrid[pm+mangio-crepe]")
    np.testing.assert_allclose(out, [210.0, 210.0, 0.0, 200.0])


def test_hybrid_single_member_passthrough():
    """len(stack)==1 returns the member track unchanged (reference :256-257)."""
    p_len = 5
    est = FakeMemberEstimator({"pm": np.arange(p_len, dtype=np.float64)})
    out = est.compute(np.zeros(SR), p_len, "hybrid[pm]")
    np.testing.assert_allclose(out, np.arange(p_len))


def test_hybrid_quantile_normalization():
    """Members see x / quantile(|x|, 0.999) (reference :196-197): scale the
    input 50x and the member must see the same (normalized) signal."""
    rng = np.random.default_rng(1)
    base = rng.standard_normal(SR)
    p_len = 8
    tracks = {"pm": np.full(p_len, 150.0)}
    a = FakeMemberEstimator(tracks)
    a.compute(base, p_len, "hybrid[pm]")
    b = FakeMemberEstimator(tracks)
    b.compute(base * 50.0, p_len, "hybrid[pm]")
    np.testing.assert_allclose(a.calls[0][1], b.calls[0][1], rtol=1e-12)
    q = np.quantile(np.abs(base), 0.999)
    np.testing.assert_allclose(a.calls[0][1], base / q, rtol=1e-12)


def test_hybrid_ragged_members_are_length_fitted():
    """Members of different lengths combine without error (repair: the
    reference's raw nanmedian would fail on the ragged stack)."""
    p_len = 8
    est = FakeMemberEstimator(
        {"pm": np.full(p_len + 3, 100.0), "mangio-crepe": np.full(p_len - 2, 300.0)}
    )
    out = est.compute(np.zeros(SR), p_len, "hybrid[pm+mangio-crepe]")
    assert out.shape == (p_len,)
    # the short member is symmetrically zero-padded (the reference's pm pad
    # logic, :290-294); its padded edge frames abstain, so the edges carry
    # the long member alone and the interior is the two-member median
    np.testing.assert_allclose(out[1:-1], 200.0)
    np.testing.assert_allclose(out[[0, -1]], 100.0)


def _harmonic(f0_track, seed=0):
    phase = 2 * np.pi * np.cumsum(f0_track) / SR
    x = 0.6 * np.sin(phase) + 0.3 * np.sin(2 * phase) + 0.15 * np.sin(3 * phase)
    return x + 0.005 * np.random.default_rng(seed).standard_normal(f0_track.size)


def test_hybrid_functional_harvest_dio():
    """Real members end to end: hybrid[harvest+dio] on a vibrato harmonic
    tracks ground truth (median < 10 cents) and stays an actual combination
    (not either member alone)."""
    t = np.arange(SR * 4) / SR
    f0_true = 200.0 * (1 + 0.03 * np.sin(2 * np.pi * 5.0 * t))
    x = _harmonic(f0_true)
    p_len = 400
    est = F0Estimator()
    hyb = est.compute(x, p_len, "hybrid[harvest+dio]", filter_radius=3)
    assert hyb.shape == (p_len,)
    truth = f0_true[np.minimum((np.arange(p_len) * 0.01 * SR).astype(int), t.size - 1)]
    voiced = hyb > 0
    assert voiced.mean() > 0.9
    cents = 1200 * np.abs(np.log2(hyb[voiced] / truth[voiced]))
    assert np.median(cents) < 10.0, np.median(cents)

    h = est.compute(x, p_len, "harvest", filter_radius=3)
    d = est.compute(x, p_len, "dio", filter_radius=3)
    # the hybrid sits between its members framewise wherever both are voiced
    # (the member drop+refit re-aligns indices: _fit_length pads the dropped
    # first frame back at the front).  The hybrid's members run on the
    # quantile-normalized signal, so allow a small estimator tolerance.
    both = (h > 0) & (d > 0) & voiced
    both[0] = False  # frame 0 is the re-padded abstain frame
    lo = np.minimum(h, d) * 2 ** (-5 / 1200)
    hi = np.maximum(h, d) * 2 ** (5 / 1200)
    frac_between = ((hyb >= lo) & (hyb <= hi))[both].mean()
    assert frac_between > 0.9, frac_between


def test_get_f0_hybrid_contract():
    """get_f0 with a hybrid method: (coarse 1..255 ints, float Hz track) and
    the semitone shift applies to the combined track."""
    t = np.arange(SR * 3) / SR
    f0_true = np.full(t.size, 180.0)
    x = _harmonic(f0_true, seed=2)
    p_len = 300
    est = F0Estimator()
    coarse, f0bak = get_f0(est, x, p_len, f0_up_key=0, method="hybrid[harvest+dio]")
    assert coarse.shape == (p_len,) and f0bak.shape == (p_len,)
    assert coarse.dtype.kind in "iu"
    assert coarse.min() >= 1 and coarse.max() <= 255
    voiced = f0bak > 0
    assert np.median(np.abs(f0bak[voiced] - 180.0)) < 5.0

    coarse_up, f0_up = get_f0(est, x, p_len, f0_up_key=12, method="hybrid[harvest+dio]")
    np.testing.assert_allclose(f0_up[voiced], 2.0 * f0bak[voiced], rtol=1e-9)
