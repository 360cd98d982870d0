"""Bandwidth-normalization units: the Metrics transfer ledger and bench's
re-costing model (VERDICT r04 item 4).

The model: critical-path D2H bytes are blocking, so they re-cost in full
from the probed to the canonical bandwidth; sync-posture cache downloads
ride the writer thread and only the EXPOSED portion (the host_io/flush
wait) re-costs — fully-hidden cache traffic must not credit the number.
"""

import numpy as np

import bench
from aicovergen_tpu.utils.metrics import Metrics


def test_metrics_transfer_ledger_accumulates_and_reports():
    m = Metrics(audio_seconds=120.0)
    m.xfer("d2h_crit", 10_000_000, 0.5)
    m.xfer("d2h_crit", 14_000_000, 0.25)
    m.xfer("d2h_deferred", 70_000_000)
    rep = m.report()
    assert rep["transfers"]["d2h_crit"] == {"mb": 24.0, "seconds": 0.75}
    assert rep["transfers"]["d2h_deferred"] == {"mb": 70.0, "seconds": 0.0}


def test_norm_wall_crit_only():
    rep = {"transfers": {"d2h_crit": {"mb": 24.0}}, "stages": {}}
    w, mb = bench._norm_wall(4.78, rep, probed_mbps=17.9, include_cache=False)
    assert mb == 24.0
    expect = 4.78 - 24.0 / 17.9 + 24.0 / bench.CANON_D2H_MBPS
    np.testing.assert_allclose(w, expect)


def test_norm_wall_hidden_cache_costs_nothing():
    """flush = 0: every cache byte was hidden under compute — only the
    critical-path bytes re-cost."""
    rep = {
        "transfers": {"d2h_crit": {"mb": 24.0}, "d2h_cache": {"mb": 74.0}},
        "stages": {"host_io/flush": {"seconds": 0.0}},
    }
    w_cache, mb = bench._norm_wall(7.87, rep, 17.9, include_cache=True)
    w_nocache, _ = bench._norm_wall(7.87, rep, 17.9, include_cache=False)
    np.testing.assert_allclose(w_cache, w_nocache)
    assert mb == 24.0


def test_norm_wall_exposed_flush_recosts():
    """2 s of exposed flush at 17.9 MB/s = 35.8 MB of unhidden cache bytes:
    subtract the wait, add the canonical-bandwidth cost."""
    rep = {
        "transfers": {"d2h_crit": {"mb": 24.0}, "d2h_cache": {"mb": 74.0}},
        "stages": {"host_io/flush": {"seconds": 2.0}},
    }
    w, mb = bench._norm_wall(9.0, rep, 17.9, include_cache=True)
    exposed_mb = 2.0 * 17.9
    expect = (
        9.0
        - 24.0 / 17.9 + 24.0 / bench.CANON_D2H_MBPS
        - 2.0 + exposed_mb / bench.CANON_D2H_MBPS
    )
    np.testing.assert_allclose(w, expect)
    np.testing.assert_allclose(mb, 24.0 + exposed_mb)


def test_norm_wall_degenerate_probe():
    rep = {"transfers": {"d2h_crit": {"mb": 24.0}}, "stages": {}}
    w, mb = bench._norm_wall(5.0, rep, probed_mbps=0.0, include_cache=True)
    assert w == 5.0 and mb == 24.0
    w, mb = bench._norm_wall(5.0, {"transfers": {}, "stages": {}}, 20.0, True)
    assert w == 5.0 and mb == 0.0
