"""Stem-cache write policy (AICG_STEM_CACHE=sync|behind|off).

sync keeps the reference's files-exist-on-return contract (covered by
test_full_cover); behind defers the cache downloads/writes to a pipeline
writer thread and must (a) return the cover before the cache lands, or at
least produce it, (b) land every cache file after drain_cache(), and
(c) keep the cache-hit contract when the same song is covered again while
writes may still be pending.  off must write no stem cache at all.
"""

import os

import numpy as np
import pytest

from aicovergen_tpu.io.audio import read_wav
from aicovergen_tpu.pipeline.cover import CoverPipeline, _fetch_int16
from aicovergen_tpu.utils.config import RuntimeConfig

from test_full_cover import asset_base  # noqa: F401  (fixture reuse)

pytestmark = pytest.mark.slow


def _pipeline(store):
    return CoverPipeline(
        store,
        runtime=RuntimeConfig(x_pad=1, x_query=2, x_center=5, x_max=8,
                              bucket_samples=16000),
        mdx_batch_size=4,
    )


def test_fetch_int16_sliced_matches_bulk():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    host = (rng.standard_normal((2, 70001)) * 1000).astype(np.int16)
    dev = jnp.asarray(host)
    np.testing.assert_array_equal(_fetch_int16(dev, 16384), host)
    np.testing.assert_array_equal(_fetch_int16(dev, 0), host)
    mono = jnp.asarray(host[0])
    np.testing.assert_array_equal(_fetch_int16(mono, 30000), host[0])


def test_write_behind_lands_after_drain(asset_base, monkeypatch):  # noqa: F811
    store, song_path = asset_base
    monkeypatch.setenv("AICG_STEM_CACHE", "behind")
    pipeline = _pipeline(store)
    cover = pipeline.song_cover(
        song_path, "TestVoice", pitch_change=0, keep_files=False,
        index_rate=0.0, output_format="wav",
    )
    assert os.path.exists(cover)
    song_dir = os.path.dirname(cover)
    pipeline.drain_cache()
    base = os.path.splitext(os.path.basename(song_path))[0]
    for suffix in ("Instrumental", "Vocals_Backup", "Vocals_Main_DeReverb"):
        path = os.path.join(song_dir, f"{base}_{suffix}.wav")
        assert os.path.exists(path), suffix
        audio, sr = read_wav(path)
        assert np.isfinite(audio).all()
    # deferred-write bookkeeping is empty after drain
    assert not pipeline._cache_futures


def test_write_behind_recover_joins_pending(asset_base, monkeypatch):  # noqa: F811
    """A second cover of the same song must see a consistent cache even if
    the first cover's writes were still queued (song_cover drains its own
    song's futures before the cache check)."""
    store, song_path = asset_base
    monkeypatch.setenv("AICG_STEM_CACHE", "behind")
    pipeline = _pipeline(store)
    first = pipeline.song_cover(
        song_path, "TestVoice", pitch_change=0, keep_files=False,
        index_rate=0.0, output_format="wav",
    )
    second = pipeline.song_cover(
        song_path, "TestVoice", pitch_change=0, keep_files=False,
        index_rate=0.0, output_format="wav",
    )
    assert first == second
    a1, _ = read_wav(second)
    assert np.isfinite(a1).all() and np.abs(a1).max() > 1e-4
    pipeline.drain_cache()


def test_cache_off_writes_no_stems(asset_base, monkeypatch, tmp_path):  # noqa: F811
    store, song_path = asset_base
    # a fresh song (distinct content hash) so earlier tests' caches of the
    # shared fixture song can't satisfy this run
    from aicovergen_tpu.io.audio import write_wav

    sr = 44100
    t = np.arange(6 * sr) / sr
    wave = (0.25 * np.sin(2 * np.pi * (260 + 20 * np.sin(2 * np.pi * t)) * t)
            + 0.15 * np.sin(2 * np.pi * 130 * t)).astype(np.float32)
    song2 = str(tmp_path / "song_off.wav")
    write_wav(song2, np.stack([wave, wave * 0.9]), sr)

    monkeypatch.setenv("AICG_STEM_CACHE", "off")
    pipeline = _pipeline(store)
    cover = pipeline.song_cover(
        song2, "TestVoice", pitch_change=0, keep_files=False,
        index_rate=0.0, output_format="wav",
    )
    assert os.path.exists(cover)
    song_dir = os.path.dirname(cover)
    stems = [
        f for f in os.listdir(song_dir)
        if f.endswith(".wav") and f != os.path.basename(cover)
    ]
    # only the final cover may exist — no cache stems, no converted vocals
    assert stems == [], stems


def test_bad_cache_mode_rejected(monkeypatch):
    from aicovergen_tpu.utils.config import stem_cache_mode

    monkeypatch.setenv("AICG_STEM_CACHE", "banana")
    with pytest.raises(ValueError):
        stem_cache_mode()
