"""Unit tests for the write-behind stem-cache machinery (no full covers):
atomic WAV writes, writer backpressure, and failure isolation — the
invariants that keep concurrent serving safe (pipeline/cover.py
_cache_submit_behind / drain_cache, io/audio.py write_wav)."""

import os
import threading

import numpy as np
import pytest

from aicovergen_tpu.io.audio import read_wav, write_wav
from aicovergen_tpu.pipeline.cover import CoverPipeline


def test_write_wav_atomic_roundtrip(tmp_path):
    path = str(tmp_path / "x.wav")
    audio = np.clip(
        np.random.default_rng(0).standard_normal((2, 4410)) * 0.3, -0.9, 0.9
    ).astype(np.float32)
    write_wav(path, audio, 44100, atomic=True)
    back, sr = read_wav(path)
    assert sr == 44100
    np.testing.assert_allclose(back, audio, atol=2 / 32767)
    # no temp residue: a concurrent existence check never sees a partial file
    assert os.listdir(tmp_path) == ["x.wav"]


def test_cache_backpressure_bounds_pending(monkeypatch):
    """With AICG_CACHE_MAX_PENDING=2, a third submit must block until the
    writer finishes one queued job — the backlog (and the HBM the closures
    pin) stays bounded under sustained load."""
    monkeypatch.setenv("AICG_CACHE_MAX_PENDING", "2")
    pipeline = CoverPipeline(store=None)
    release = threading.Event()
    done = []

    def slow_job():
        release.wait(10)
        done.append(1)

    pipeline._cache_submit_behind("/tmp/songA", slow_job)
    pipeline._cache_submit_behind("/tmp/songA", slow_job)

    third_submitted = threading.Event()

    def submit_third():
        pipeline._cache_submit_behind("/tmp/songB", lambda: done.append(1))
        third_submitted.set()

    t = threading.Thread(target=submit_third, daemon=True)
    t.start()
    # the third submit is blocked behind the cap while the writer is stuck
    assert not third_submitted.wait(0.3)
    release.set()
    assert third_submitted.wait(5)
    pipeline.drain_cache()
    assert len(done) == 3


def test_drain_cache_failure_isolation(monkeypatch):
    """A failed CACHE write surfaces via drain_cache() by default, but the
    pre-cover join (raise_errors=False) must swallow it: the next user's
    cover re-separates instead of aborting on a non-essential file."""
    monkeypatch.setenv("AICG_CACHE_MAX_PENDING", "16")
    pipeline = CoverPipeline(store=None)

    def boom():
        raise OSError("disk full")

    pipeline._cache_submit_behind("/tmp/songC", boom)
    pipeline.drain_cache("/tmp/songC", raise_errors=False)  # must not raise
    assert not pipeline._cache_futures

    pipeline._cache_submit_behind("/tmp/songC", boom)
    with pytest.raises(OSError):
        pipeline.drain_cache("/tmp/songC")


def test_stem_cache_pipeline_knob(monkeypatch):
    """The serving entry points pass the posture per-pipeline instead of
    mutating os.environ; explicit env still wins through the default arg."""
    from aicovergen_tpu.utils.config import stem_cache_mode

    monkeypatch.delenv("AICG_STEM_CACHE", raising=False)
    assert stem_cache_mode() == "sync"
    assert stem_cache_mode(default="behind") == "behind"
    monkeypatch.setenv("AICG_STEM_CACHE", "off")
    assert stem_cache_mode(default="behind") == "off"

    with pytest.raises(ValueError):
        CoverPipeline(store=None, stem_cache="banana")
    assert CoverPipeline(store=None, stem_cache="behind").stem_cache == "behind"
