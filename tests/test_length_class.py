"""Production length-class tier (VERDICT r02 item 4).

The round-2 regression shipped because nothing in the suite executed any
device program at the production 120 s length class — the default reverb
crashed ONLY at song length on the real TPU.  This tier closes that hole:

  * a slow-marked CPU test drives the FULL cover pipeline on a 120 s song
    with the production (32 s) length classes, so every whole-track program
    (effects chain, vc hpf-split, RMVPE pad, VC assemble/post, mixdown
    resample/combine/quantize) compiles and executes at the same shape
    class the bench uses;
  * an AICG_TEST_TPU=1-gated smoke runs the whole-track DSP program family
    once on the real chip at the 120 s class (no model weights needed, a
    few seconds of TPU time after compile).

Chunk-based programs (MDX separation, CREPE, HuBERT segment batches) are
intentionally out of scope here: their compiled shapes are
length-independent by design (fixed chunk/segment buckets), so the fast
tier already covers their only shape class.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

SR = 44100
T120 = 120 * SR


def _class_len(n, bucket):
    return max(1, -(-n // bucket)) * bucket


def _run_whole_track_programs():
    """Execute every whole-track (length-class-shaped) DSP program at the
    120 s class; returns nothing, asserts finiteness.  Shared by the CPU
    slow test and the TPU smoke."""
    from aicovergen_tpu.ops.pitchshift import pitch_shift
    from aicovergen_tpu.ops.filters import butter_highpass, zero_phase_fft
    from aicovergen_tpu.pipeline.effects import (
        add_audio_effects_device,
        combine_audio_device,
        quantize_int16,
        to_stereo_device,
    )
    from aicovergen_tpu.ops.resample import resample
    from aicovergen_tpu.utils.config import len_bucket_s

    bucket = SR * len_bucket_s()
    Tc = _class_len(T120, bucket)
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((2, Tc)) * 0.1).astype(np.float32))

    # effects chain (hpf + compressor + default fft reverb) — the r02 crash
    fx = jax.block_until_ready(add_audio_effects_device(x, SR))
    assert bool(jnp.isfinite(fx).all())

    # vc/hpf_split: zero-phase butterworth via whole-track FFT at 16 kHz
    T16 = _class_len(120 * 16000, 16000 * len_bucket_s())
    x16 = jnp.asarray((rng.standard_normal(T16) * 0.1).astype(np.float32))
    b, a = butter_highpass(5, 48, 16000)
    hp = jax.block_until_ready(zero_phase_fft(b, a, x16))
    assert bool(jnp.isfinite(hp).all())

    # pitch_shift_all at the class (phase vocoder over the whole track)
    ps = jax.block_until_ready(pitch_shift(x, SR, 2.0))
    assert bool(jnp.isfinite(ps).all())

    # mixdown: 40k->44.1k resample + gain-staged combine + int16 quantize
    T40 = _class_len(120 * 40000, 40000 * len_bucket_s())
    v40 = jnp.asarray((rng.standard_normal(T40) * 0.1).astype(np.float32))
    v44 = resample(v40, 40000, SR)
    mix = combine_audio_device(
        to_stereo_device(v44), to_stereo_device(x), to_stereo_device(x)
    )
    q = jax.block_until_ready(quantize_int16(mix))
    assert q.dtype == jnp.int16


@pytest.mark.slow
def test_whole_track_programs_at_120s_class():
    """Every whole-track device program at the production 120 s class (CPU:
    compile cost is the test — the r02 failure family compiled fine and
    died at execution, which this also exercises)."""
    _run_whole_track_programs()


@pytest.mark.skipif(
    os.environ.get("AICG_TEST_TPU", "0") != "1",
    reason="real-TPU smoke; opt in with AICG_TEST_TPU=1",
)
def test_whole_track_programs_tpu_smoke():
    """Same program family once on the real chip — the exact check whose
    absence shipped the r02 regression."""
    assert jax.devices()[0].platform != "cpu"
    _run_whole_track_programs()


@pytest.mark.slow
def test_full_cover_at_120s_song(tmp_path):
    """End-to-end cover of a 120 s song at PRODUCTION length classes on the
    CPU backend (tiny MDX nets — separation programs are length-independent;
    everything whole-track-shaped runs at the real class)."""
    import shutil
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.environ["AICG_BENCH_MDX_SCALE"] = "tiny"
    os.environ["AICG_BENCH_VC_SCALE"] = "tiny"
    os.environ["AICG_TPU_BF16"] = "0"
    import bench

    old_assets = bench.BENCH_ASSETS
    bench.BENCH_ASSETS = os.path.join(repo, ".dryrun_assets")
    try:
        base = bench._build_assets()
        song = os.path.join(str(tmp_path), "len_song.wav")
        bench._make_song(song, 120.0, seed=11)

        from aicovergen_tpu.io.assets import AssetStore
        from aicovergen_tpu.io.audio import read_wav
        from aicovergen_tpu.pipeline.cover import CoverPipeline

        store = AssetStore(base)
        shutil.rmtree(store.output_dir, ignore_errors=True)
        pipe = CoverPipeline(store=store)
        out = pipe.song_cover(song, "BenchVoice", index_rate=0.0, output_format="wav")
        wave, sr = read_wav(out)
        assert sr == SR
        assert abs(wave.shape[-1] - T120) < SR  # within 1 s of the source
        assert np.isfinite(wave).all()
        assert np.abs(wave).max() > 1e-4  # not silence
        shutil.rmtree(store.output_dir, ignore_errors=True)
    finally:
        bench.BENCH_ASSETS = old_assets
