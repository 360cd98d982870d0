"""Full cover-pipeline integration test: synthetic song + fabricated model
assets (fixture weights) through the CLI-level API.

Exercises the complete reference workflow (BASELINE config-2 shape):
3-stage MDX separation (ONNX frontend) -> RVC conversion (HuBERT + rmvpe +
synthesizer) -> effects -> mixdown -> output file, including the stage-cache
contract on a second run.
"""

import json
import os

import numpy as np
import pytest
import torch

from conftest import FIXTURE_DIR, load_fixture
from aicovergen_tpu.convert.onnx_proto import write_onnx
from aicovergen_tpu.io.assets import AssetStore
from aicovergen_tpu.io.audio import write_wav
from aicovergen_tpu.pipeline.cover import CoverPipeline
from aicovergen_tpu.utils.config import RuntimeConfig


pytestmark = pytest.mark.slow

SR = 44100


def _write_fake_mdx(path, dim_f=256, dim_t_log2=5, n_fft=1024, stem="Vocals", seed=0):
    """A tiny sigmoid-mask conv net with the MDX I/O contract."""
    rng = np.random.default_rng(seed)
    c = 4
    w1 = rng.standard_normal((8, c, 3, 3)).astype(np.float32) * 0.1
    b1 = np.zeros(8, np.float32)
    w2 = rng.standard_normal((c, 8, 1, 1)).astype(np.float32) * 0.1
    b2 = np.zeros(c, np.float32)
    nodes = [
        ("Conv", ["input", "w1", "b1"], ["h"], {"kernel_shape": [3, 3], "pads": [1, 1, 1, 1]}),
        ("Relu", ["h"], ["hr"], {}),
        ("Conv", ["hr", "w2", "b2"], ["m"], {"kernel_shape": [1, 1]}),
        ("Sigmoid", ["m"], ["mask"], {}),
        ("Mul", ["mask", "input"], ["output"], {}),
    ]
    write_onnx(
        path, nodes, {"w1": w1, "b1": b1, "w2": w2, "b2": b2},
        {"input": [None, 4, dim_f, 2**dim_t_log2]}, ["output"],
    )
    with open(os.path.splitext(path)[0] + ".json", "w") as f:
        json.dump(
            {"compensate": 1.02, "dim_f": dim_f, "dim_t_log2": dim_t_log2,
             "n_fft": n_fft, "primary_stem": stem},
            f,
        )


@pytest.fixture(scope="module")
def asset_base(tmp_path_factory):
    base = tmp_path_factory.mktemp("aicg_base")
    store = AssetStore(str(base))
    os.makedirs(store.mdx_models_dir)
    for name, stem in [
        ("UVR-MDX-NET-Voc_FT.onnx", "Vocals"),
        ("UVR_MDXNET_KARA_2.onnx", "Vocals"),
        ("Reverb_HQ_By_FoxJoy.onnx", "Reverb"),
    ]:
        _write_fake_mdx(store.mdx_model_path(name), stem=stem)

    # voice model: fixture synthesizer weights re-saved as a real .pth
    fx = load_fixture("rvc_synth_v2f0.npz")
    weight = {
        k[3:]: torch.from_numpy(fx[k]) for k in fx.files if k.startswith("sd:")
    }
    cpt = {
        "config": [1025, 32, 192, 192, 768, 2, 6, 3, 0, "1",
                   [3, 7, 11], [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
                   [10, 10, 2, 2], 512, [16, 16, 4, 4], 109, 256, 40000],
        "weight": weight,
        "f0": 1,
        "version": "v2",
    }
    voice_dir = os.path.join(store.rvc_models_dir, "TestVoice")
    os.makedirs(voice_dir)
    torch.save(cpt, os.path.join(voice_dir, "TestVoice.pth"))

    hx = load_fixture("hubert_base.npz")
    torch.save(
        {k[3:]: torch.from_numpy(hx[k]) for k in hx.files if k.startswith("sd:")},
        store.hubert_path(),
    )
    rx = load_fixture("rmvpe_e2e.npz")
    torch.save(
        {k[3:]: torch.from_numpy(rx[k]) for k in rx.files if k.startswith("sd:")},
        store.rmvpe_path(),
    )

    # the song: 6 s of "vocals" (sine melody) + "instrumental" (chords)
    t = np.arange(6 * SR) / SR
    melody = 0.3 * np.sin(2 * np.pi * (220 + 30 * np.sin(2 * np.pi * 0.5 * t)) * t)
    chords = 0.2 * (np.sin(2 * np.pi * 110 * t) + np.sin(2 * np.pi * 165 * t))
    song = np.stack([melody + chords, melody * 0.8 + chords]).astype(np.float32)
    song_path = os.path.join(str(base), "song.wav")
    write_wav(song_path, song, SR)
    return store, song_path


def test_full_cover_generation(asset_base):
    store, song_path = asset_base
    pipeline = CoverPipeline(
        store,
        runtime=RuntimeConfig(x_pad=1, x_query=2, x_center=5, x_max=8, bucket_samples=16000),
        mdx_batch_size=4,
    )
    cover = pipeline.song_cover(
        song_path, "TestVoice", pitch_change=0, keep_files=True,
        index_rate=0.0, output_format="wav",
    )
    assert os.path.exists(cover)
    from aicovergen_tpu.io.audio import read_wav

    audio, sr = read_wav(cover)
    assert sr == SR
    assert audio.shape[0] == 2
    assert abs(audio.shape[1] - 6 * SR) < SR  # ~6 s
    assert np.abs(audio).max() > 1e-4
    assert np.isfinite(audio).all()

    # stage cache: all expected stem files present (main.py:105-122 contract)
    song_dir = os.path.dirname(cover)
    base = os.path.splitext(os.path.basename(song_path))[0]
    for suffix in ("Vocals", "Instrumental", "Vocals_Main", "Vocals_Backup",
                   "Vocals_Main_DeReverb"):
        assert os.path.exists(os.path.join(song_dir, f"{base}_{suffix}.wav")), suffix


def test_cover_rerun_uses_cache(asset_base):
    """Second run with same song skips separation (cache contract
    main.py:269-283) and reuses the converted vocals file."""
    store, song_path = asset_base
    pipeline = CoverPipeline(
        store,
        runtime=RuntimeConfig(x_pad=1, x_query=2, x_center=5, x_max=8, bucket_samples=16000),
        mdx_batch_size=4,
    )
    import time

    t0 = time.time()
    cover = pipeline.song_cover(
        song_path, "TestVoice", pitch_change=0, keep_files=False,
        index_rate=0.0, output_format="wav",
    )
    elapsed = time.time() - t0
    assert os.path.exists(cover)
    # cached rerun must be much faster than the first full run (no MDX, no VC)
    assert elapsed < 60
