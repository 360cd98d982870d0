"""Full-song, multi-segment parity vs the recorded reference output.

``scripts/make_parity.py`` drove the reference's actual torch host pipeline
(/root/reference/src/vc_infer_pipeline.py:474-653) on an 85 s multi-segment
song and committed its int16 output + whole-track rmvpe f0 to
``tests/fixtures/parity_full_song.npz``.  This test replays OUR pipeline on
the same song with the same seeded weights (rebuilt deterministically in the
reference's on-disk formats) and asserts the BASELINE.md north star:
spectral correlation >= 0.999 against the reference output, at full song
scale — exercising the energy-minimum split search, multi-segment bucketed
batching, windowed NSF decode, and bucketed assembly end to end.

Slow tier: one full CPU cover (~minutes).  Needs torch only to rebuild the
seeded reference-format checkpoints; the reference pipeline itself is not
re-run (its output is the committed fixture).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

_PARITY_ENV = {
    "AICG_TPU_BF16": "0",
    "AICG_ZERO_NOISE": "1",
    "AICG_X_PAD": "1",
    "AICG_X_QUERY": "6",
    "AICG_X_CENTER": "38",
    "AICG_X_MAX": "41",
}


@pytest.fixture()
def parity_env():
    saved = {k: os.environ.get(k) for k in _PARITY_ENV}
    os.environ.update(_PARITY_ENV)
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def _load_harness():
    """Import scripts/make_parity.py as a module (helpers only; main guarded)."""
    spec = importlib.util.spec_from_file_location(
        "aicg_parity_harness", os.path.join(REPO, "scripts", "make_parity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_full_song_cover_matches_reference(parity_env):
    pytest.importorskip("torch")
    fx_path = os.path.join(FIXTURE_DIR, "parity_full_song.npz")
    if not os.path.exists(fx_path):
        pytest.skip("parity fixture not generated (run scripts/make_parity.py)")
    fx = np.load(fx_path)
    song, ref_out, ref_f0 = fx["song"], fx["ref_audio"], fx["ref_f0"]
    assert len(song) / 16000 > 41, "fixture must be multi-segment (> x_max)"

    mp = _load_harness()
    mp._install_stubs()
    mp.build_assets()

    from aicovergen_tpu.io.assets import AssetStore
    from aicovergen_tpu.pipeline.loader import build_voice_converter

    store = AssetStore(mp.ASSETS)
    vc = build_voice_converter(store, "ParityVoice", exact_search=False)
    ours, out_sr = vc.convert(
        song,
        f0_up_key=0,
        f0_method="rmvpe",
        index_rate=float(fx["index_rate"]),
        filter_radius=3,
        rms_mix_rate=float(fx["rms_mix_rate"]),
        protect=float(fx["protect"]),
    )
    ours = np.asarray(ours)
    assert len(ours) == len(ref_out)

    a = ref_out.astype(np.float64) / 32768.0
    b = ours.astype(np.float64) / 32768.0
    spec_corr = mp.spectral_correlation(a, b)
    wave_corr = mp.waveform_correlation(a, b)
    assert spec_corr >= 0.999, f"spectral correlation {spec_corr:.6f} < 0.999"
    assert wave_corr >= 0.99, f"waveform correlation {wave_corr:.6f} < 0.99"

    # stage-level: whole-track rmvpe f0.  Tail frames inside the x_pad trim
    # region may diverge (our 32 s audio bucket vs the reference's mel-tail
    # reflect pad, rmvpe.py:353-357) — they never reach the output audio, so
    # the contract is: bulk p99.9 tight, outliers confined to the tail.
    f0_ours = np.asarray(
        vc.f0_estimator.compute(mp._our_padded_hp(song), len(ref_f0), "rmvpe", 3, 128)
    )
    n = min(len(ref_f0), len(f0_ours))
    voiced = (ref_f0[:n] > 0) & (f0_ours[:n] > 0)
    assert np.mean((ref_f0[:n] > 0) == (f0_ours[:n] > 0)) > 0.995
    cents = np.abs(1200 * np.log2(f0_ours[:n][voiced] / ref_f0[:n][voiced]))
    assert np.percentile(cents, 99.9) < 1.0
    tail = n - 100 * int(os.environ.get("AICG_X_PAD", "1"))  # x_pad seconds of frames
    bad = np.flatnonzero(cents > 50)
    vidx = np.flatnonzero(voiced)
    assert all(vidx[i] >= tail for i in bad), (
        f"f0 outliers outside the trimmed tail region: {[int(vidx[i]) for i in bad]}"
    )
