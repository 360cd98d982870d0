"""Training usability: dataset prep -> feature extraction -> train steps ->
checkpoint -> reload -> inference (the loop the reference never closed; its
preprocessor is dead code, reference src/trainset_preprocess_pipeline_print.py:14)."""

import os

import numpy as np
import pytest

import jax

from conftest import load_fixture
from aicovergen_tpu.models.rvc import RVCConfig
from aicovergen_tpu.train import (
    Slicer,
    extract_features,
    load_train_state,
    make_batches,
    preprocess_trainset,
    save_rvc_pth,
    save_train_state,
)

pytestmark = pytest.mark.slow

TINY_CFG = RVCConfig(
    spec_channels=33,
    segment_size=16,
    inter_channels=64,
    hidden_channels=64,
    filter_channels=128,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    resblock="1",
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    upsample_rates=(10, 16),
    upsample_initial_channel=64,
    upsample_kernel_sizes=(20, 32),
    spk_embed_dim=4,
    gin_channels=32,
    sr=16000,
    version="v2",
    if_f0=True,
)


def _hubert_params():
    from aicovergen_tpu.convert.hubert_convert import transformers_state_to_tree

    fx = load_fixture("hubert_base.npz")
    return transformers_state_to_tree({k[3:]: fx[k] for k in fx.files if k.startswith("sd:")})


def _make_voice_wavs(dirpath, n=2, seconds=5.0, sr=16000):
    """Synthetic 'voice' recordings with silent gaps (for the slicer)."""
    from aicovergen_tpu.io.audio import write_wav

    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        t = np.arange(int(seconds * sr)) / sr
        f0 = 180 + 40 * np.sin(2 * np.pi * 0.7 * t + i)
        voiced = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / sr)
        gate = (np.sin(2 * np.pi * 0.25 * t) > -0.6).astype(np.float64)  # silences
        audio = voiced * gate + 0.002 * rng.standard_normal(len(t))
        write_wav(os.path.join(dirpath, f"rec{i}.wav"), audio.astype(np.float32), sr,
                  subtype="FLOAT")


def test_slicer_splits_on_silence():
    sr = 16000
    t = np.arange(sr * 6) / sr
    audio = 0.5 * np.sin(2 * np.pi * 220 * t)
    audio[2 * sr : 3 * sr] = 0.0001  # 1 s silence in the middle
    clips = Slicer(sr=sr).slice(audio)
    assert len(clips) >= 2
    assert sum(len(c) for c in clips) <= len(audio) + sr  # no duplication blowup


def test_preprocess_trainset(tmp_path):
    raw = str(tmp_path / "raw")
    exp = str(tmp_path / "exp")
    _make_voice_wavs(raw)
    n = preprocess_trainset(raw, 16000, exp)
    assert n > 0
    gt = sorted(os.listdir(os.path.join(exp, "0_gt_wavs")))
    k16 = sorted(os.listdir(os.path.join(exp, "1_16k_wavs")))
    assert gt == k16 and len(gt) == n
    from aicovergen_tpu.io.audio import read_wav

    clip, sr = read_wav(os.path.join(exp, "0_gt_wavs", gt[0]))
    assert sr == 16000
    # 3 s windows: no clip longer than per + overlap
    assert clip.shape[-1] <= int(3.3 * 16000) + 1
    assert np.abs(clip).max() <= 1.0


def test_train_roundtrip_infer(tmp_path):
    """prep -> features -> 2 GAN steps -> .pth export -> reload -> infer."""
    from aicovergen_tpu.convert.rvc_convert import load_rvc_checkpoint
    from aicovergen_tpu.models.rvc import synthesizer_infer
    from aicovergen_tpu.parallel.mesh import make_mesh
    from aicovergen_tpu.parallel.train import make_train_step
    from aicovergen_tpu.pipeline.f0 import F0Estimator
    from aicovergen_tpu.train.dataset import extract_features, make_batches

    raw = str(tmp_path / "raw")
    exp = str(tmp_path / "exp")
    _make_voice_wavs(raw, n=2, seconds=5.0)
    assert preprocess_trainset(raw, 16000, exp) > 0

    samples = extract_features(
        exp, _hubert_params(), TINY_CFG, f0_estimator=F0Estimator(), f0_method="pm"
    )
    assert samples and all(s["frames"] > 0 for s in samples)
    batches = list(make_batches(samples, batch_size=2, frames=48, seed=0))
    assert batches

    mesh = make_mesh(1)
    init_state, step_fn = make_train_step(TINY_CFG, mesh)
    state = init_state()
    import jax.numpy as jnp

    for i, batch in enumerate(batches[:2]):
        state, metrics = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()},
                                 jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss/gen_total"]))
    assert int(state.step) >= 1

    # full-state save/restore: step count and params survive exactly
    ckpt = str(tmp_path / "state.npz")
    save_train_state(ckpt, state, TINY_CFG)
    template = init_state()
    restored, cfg_meta = load_train_state(ckpt, template)
    assert int(restored.step) == int(state.step)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.gen_params)[0]),
        np.asarray(jax.tree.leaves(state.gen_params)[0]),
    )
    assert cfg_meta["sr"] == 16000

    # .pth export loads through the standard inference loader
    pth = str(tmp_path / "TestTrained.pth")
    save_rvc_pth(pth, state.gen_params, TINY_CFG, epoch=1)
    params, cfg = load_rvc_checkpoint(pth)
    assert cfg.sr == 16000 and cfg.version == "v2" and cfg.if_f0
    assert "enc_q" not in params

    T = 32
    rng = np.random.default_rng(1)
    audio = synthesizer_infer(
        params,
        cfg,
        jnp.asarray(rng.standard_normal((1, T, 768)).astype(np.float32) * 0.1),
        jnp.asarray([T]),
        jnp.asarray(rng.integers(1, 255, (1, T))),
        jnp.asarray(rng.uniform(100, 300, (1, T)).astype(np.float32)),
        jnp.asarray([0]),
    )
    out = np.asarray(audio)
    assert out.shape == (1, 1, T * TINY_CFG.upp)
    assert np.isfinite(out).all()


def test_rvc_presets_consistency():
    """Presets match the reference per-SR configs (src/configs/*.json):
    upsample product equals hop (sr // 100), spec channels match the STFT."""
    from aicovergen_tpu.models.rvc_presets import rvc_preset

    for sr_name, sr in (("32k", 32000), ("40k", 40000), ("48k", 48000)):
        for version in ("v1", "v2"):
            cfg = rvc_preset(sr_name, version)
            assert cfg.sr == sr and cfg.version == version
            assert cfg.upp == sr // 100  # hop == 10 ms everywhere
            expected_spec = (1024 if sr == 32000 else 2048) // 2 + 1
            assert cfg.spec_channels == expected_spec
            assert cfg.segment_size > 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        rvc_preset("44k")
