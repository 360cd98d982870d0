"""ONNX synthesizer export parity: the exported graph (the reference's
models_onnx.py deployment variant, rebuilt through our wire writer) must
reproduce synthesizer_infer bit-for-tolerance when run through OnnxExecutor
with the same explicit noise inputs."""

import numpy as np
import pytest

import jax.numpy as jnp

from aicovergen_tpu.convert.onnx_proto import read_onnx
from aicovergen_tpu.convert.rvc_onnx_export import export_synthesizer_onnx
from aicovergen_tpu.models.mdx import OnnxExecutor
from aicovergen_tpu.models.rvc import RVCConfig, synthesizer_infer
from aicovergen_tpu.models.rvc_train import init_synthesizer_params

pytestmark = pytest.mark.slow

TINY = RVCConfig(
    spec_channels=33,
    segment_size=16,
    inter_channels=16,
    hidden_channels=16,
    filter_channels=32,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    resblock="1",
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 4),
    upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8),
    spk_embed_dim=4,
    gin_channels=8,
    sr=16000,
    version="v2",
    if_f0=True,
)


def _feed(cfg, t, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "phone": rng.standard_normal((1, t, 768)).astype(np.float32) * 0.1,
        "pitch": rng.integers(1, 255, (1, t)).astype(np.int64),
        "nsff0": rng.uniform(80, 400, (1, t)).astype(np.float32),
        "sid": np.asarray([1], np.int64),
        "rnd": rng.standard_normal((1, cfg.inter_channels, t)).astype(np.float32),
        "sine_noise": rng.standard_normal((1, t * cfg.upp, 1)).astype(np.float32),
    }


def test_export_matches_synthesizer_infer(tmp_path):
    t = 20
    params = init_synthesizer_params(TINY, seed=0)
    params.pop("enc_q", None)
    path = str(tmp_path / "synth.onnx")
    export_synthesizer_onnx(path, params, TINY, t)

    executor = OnnxExecutor(read_onnx(path), fuse=False)
    feed = _feed(TINY, t)
    onnx_audio = np.asarray(executor(feed))

    ref = np.asarray(
        synthesizer_infer(
            params,
            TINY,
            jnp.asarray(feed["phone"]),
            jnp.asarray([t]),
            jnp.asarray(feed["pitch"]),
            jnp.asarray(feed["nsff0"]),
            jnp.asarray(feed["sid"]),
            zp_noise=jnp.asarray(feed["rnd"]),
            sine_noise=jnp.asarray(feed["sine_noise"]),
        )
    )
    assert onnx_audio.shape == ref.shape == (1, 1, t * TINY.upp)
    np.testing.assert_allclose(onnx_audio, ref, rtol=1e-4, atol=1e-5)


def test_export_nono_variant(tmp_path):
    cfg = RVCConfig(**{**TINY.__dict__, "if_f0": False})
    t = 16
    params = init_synthesizer_params(cfg, seed=1)
    params.pop("enc_q", None)
    path = str(tmp_path / "synth_nono.onnx")
    export_synthesizer_onnx(path, params, cfg, t)
    executor = OnnxExecutor(read_onnx(path), fuse=False)

    rng = np.random.default_rng(2)
    feed = {
        "phone": rng.standard_normal((1, t, 768)).astype(np.float32) * 0.1,
        "sid": np.asarray([0], np.int64),
        "rnd": rng.standard_normal((1, cfg.inter_channels, t)).astype(np.float32),
    }
    onnx_audio = np.asarray(executor(feed))
    ref = np.asarray(
        synthesizer_infer(
            params, cfg,
            jnp.asarray(feed["phone"]), jnp.asarray([t]), None, None,
            jnp.asarray(feed["sid"]), zp_noise=jnp.asarray(feed["rnd"]),
        )
    )
    assert onnx_audio.shape == ref.shape
    np.testing.assert_allclose(onnx_audio, ref, rtol=1e-4, atol=1e-5)
