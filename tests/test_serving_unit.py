"""Fast unit tests for round-5 serving behaviors: the in-flight admission
bound (AICG_MAX_INFLIGHT), per-model MDX chunk-batch selection, and
multi-class warmup — all exercised through stubs, no device compute.
"""

import os
import threading
import time

import numpy as np
import pytest

from aicovergen_tpu.pipeline.cover import CoverPipeline


def test_admission_bounds_inflight_covers(monkeypatch):
    """With AICG_MAX_INFLIGHT=2, six concurrent song_cover calls never have
    more than two bodies in flight; all six complete."""
    monkeypatch.setenv("AICG_MAX_INFLIGHT", "2")
    pipeline = CoverPipeline(store=None)
    state = {"now": 0, "peak": 0}
    lock = threading.Lock()

    def fake_body(self, *a, metrics=None, **kw):
        with lock:
            state["now"] += 1
            state["peak"] = max(state["peak"], state["now"])
        time.sleep(0.05)
        with lock:
            state["now"] -= 1
        return "out"

    monkeypatch.setattr(CoverPipeline, "_song_cover", fake_body)
    threads = [
        threading.Thread(target=pipeline.song_cover, args=("s", "v"))
        for _ in range(6)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert state["peak"] == 2, state
    assert state["now"] == 0

    # 0 disables the bound
    monkeypatch.setenv("AICG_MAX_INFLIGHT", "0")
    p2 = CoverPipeline(store=None)
    assert p2._admission is None


def test_admission_wait_is_a_named_stage(monkeypatch):
    from aicovergen_tpu.utils.metrics import Metrics

    monkeypatch.setenv("AICG_MAX_INFLIGHT", "1")
    pipeline = CoverPipeline(store=None)
    monkeypatch.setattr(
        CoverPipeline, "_song_cover", lambda self, *a, metrics=None, **kw: "out"
    )
    metrics = Metrics()
    pipeline.song_cover("s", "v", metrics=metrics)
    assert "serving/admission_wait" in metrics.stages


def test_mdx_batch_doubles_for_short_chunk_models(monkeypatch):
    """dim_t <= 256 models run 2x the base batch; dim_t 512 keeps the base
    (padding waste would exceed the per-row gain — docs/PERFORMANCE.md)."""
    import aicovergen_tpu.pipeline.cover as cover_mod
    from aicovergen_tpu.pipeline.separate import MDXParams

    seen = {}

    def fake_separate(wave, model_fn, params, denoise=True, batch_size=8,
                      shard=None, compute_dtype=None, device_out=False):
        seen[params.dim_t] = batch_size
        return wave, wave

    monkeypatch.setattr(cover_mod, "separate", fake_separate)
    pipeline = CoverPipeline(store=None)

    def fake_load(self, name):
        dim_t = 512 if "Reverb" in name else 256
        return (lambda s: s), MDXParams(dim_f=3072, dim_t=dim_t, n_fft=7680)

    monkeypatch.setattr(CoverPipeline, "_load_mdx", fake_load)
    wave = np.zeros((2, 1000), np.float32)
    pipeline._run_separation(wave, "UVR-MDX-NET-Voc_FT.onnx")
    pipeline._run_separation(wave, "Reverb_HQ_By_FoxJoy.onnx")
    assert seen == {256: 16, 512: 8}, seen

    monkeypatch.setenv("AICG_MDX_BATCH", "4")
    pipeline._run_separation(wave, "UVR-MDX-NET-Voc_FT.onnx")
    assert seen[256] == 8  # 2x the overridden base


def test_warmup_accepts_class_list(monkeypatch, tmp_path):
    """warmup((240, 120)) runs one synthetic cover per length class."""
    from aicovergen_tpu.io.assets import AssetStore

    store = AssetStore(str(tmp_path))
    os.makedirs(store.rvc_models_dir, exist_ok=True)
    pipeline = CoverPipeline(store=store)
    lengths = []

    def fake_cover(self, song, voice, **kw):
        from aicovergen_tpu.io.audio import read_wav

        wave, sr = read_wav(song)
        lengths.append(round(wave.shape[-1] / sr))
        out_dir = tmp_path / f"out{len(lengths)}"
        out_dir.mkdir()
        out = out_dir / "cover.wav"
        out.write_bytes(b"")
        return str(out)

    monkeypatch.setattr(CoverPipeline, "song_cover", fake_cover)
    monkeypatch.setattr(
        CoverPipeline, "_ensure_warmup_voice", lambda self: "stub"
    )
    pipeline.warmup(seconds=(8, 4))
    assert lengths == [8, 4]
    lengths.clear()
    pipeline.warmup(seconds=6.0)
    assert lengths == [6]
