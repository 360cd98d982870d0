"""Multi-device tests on the 8-device fake CPU mesh: sharded separation
chunk batches and the distributed GAN training step (dp and dp+tp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicovergen_tpu.models.rvc import RVCConfig
from aicovergen_tpu.parallel.mesh import make_chunk_sharder, make_mesh, shard_batch
from aicovergen_tpu.parallel.train import make_synthetic_batch, make_train_step
from aicovergen_tpu.pipeline.separate import MDXParams, separate


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
    upsample_rates=(4, 4),
    upsample_initial_channel=64,
    upsample_kernel_sizes=(8, 8),
    spk_embed_dim=4,
    gin_channels=32,
    sr=16000,
    version="v2",
    if_f0=True,
)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_separation_matches_single_device():
    mesh = make_mesh(8)
    params = MDXParams(dim_f=128, dim_t=32, n_fft=512, hop=256)
    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, params.chunk_size * 5)).astype(np.float32) * 0.3
    model_fn = lambda spec: spec * 0.5

    single, _ = separate(wave, model_fn, params, denoise=False, batch_size=8)
    sharded, _ = separate(
        wave, model_fn, params, denoise=False, batch_size=8,
        shard=make_chunk_sharder(mesh),
    )
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_train_step_dp():
    mesh = make_mesh(8)
    init_state, step_fn = make_train_step(TINY_CFG, mesh)
    state = init_state()
    batch = make_synthetic_batch(TINY_CFG, batch_size=8, frames=32)
    batch = {k: shard_batch(jnp.asarray(v), mesh) for k, v in batch.items()}
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert state.step == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # a second step continues from the updated params
    state, metrics2 = step_fn(state, batch, jax.random.PRNGKey(1))
    assert state.step == 2
    assert np.isfinite(float(metrics2["loss/gen_total"]))


def test_train_step_dp_tp():
    """4-way data x 2-way tensor parallel: the FFN/QKV shardings compile
    and produce finite losses."""
    mesh = make_mesh(8, model_parallel=2)
    init_state, step_fn = make_train_step(TINY_CFG, mesh)
    state = init_state(tensor_parallel=True)
    batch = make_synthetic_batch(TINY_CFG, batch_size=4, frames=32)
    batch = {k: shard_batch(jnp.asarray(v), mesh) for k, v in batch.items()}
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss/gen_total"]))
    assert np.isfinite(float(metrics["loss/disc"]))


def _vc_fixture_params():
    from conftest import load_fixture
    from aicovergen_tpu.convert.hubert_convert import transformers_state_to_tree
    from aicovergen_tpu.convert.torch_reader import fold_weight_norm, nest

    fx = load_fixture("rvc_synth_v2f0.npz")
    flat = {
        k[3:]: fx[k]
        for k in fx.files
        if k.startswith("sd:")
        and not k[3:].startswith("enc_q.")
        and not k.endswith("num_batches_tracked")
    }
    synth_params = nest(fold_weight_norm(flat))
    hx = load_fixture("hubert_base.npz")
    hubert_params = transformers_state_to_tree(
        {k[3:]: hx[k] for k in hx.files if k.startswith("sd:")}
    )
    return synth_params, hubert_params


def test_vc_dp_tp_matches_single_device():
    """Serving-path tensor parallelism (VERDICT r03 item 8): the same
    VoiceConverter on a 4-data x 2-model mesh with Megatron param shardings
    (parallel/tp.py) must reproduce the single-device output."""
    from aicovergen_tpu.parallel.tp import hubert_tp_spec, synth_tp_spec, tp_place
    from aicovergen_tpu.pipeline.f0 import F0Estimator
    from aicovergen_tpu.pipeline.vc import SR, VoiceConverter
    from aicovergen_tpu.utils.config import RuntimeConfig

    synth_params, hubert_params = _vc_fixture_params()
    runtime = RuntimeConfig(x_pad=1, x_query=1, x_center=3, x_max=5, bucket_samples=8000)
    t = np.arange(SR * 7) / SR
    audio = (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float64)
    cfg = RVCConfig(version="v2", if_f0=True)

    single = VoiceConverter(
        synth_params=synth_params, synth_cfg=cfg, hubert_params=hubert_params,
        f0_estimator=F0Estimator(), runtime=runtime,
    )
    out_single, sr_single = single.convert(audio, f0_method="pm", index_rate=0.0)

    mesh = make_mesh(8, model_parallel=2)
    tp = VoiceConverter(
        synth_params=tp_place(synth_params, mesh, synth_tp_spec),
        synth_cfg=cfg,
        hubert_params=tp_place(hubert_params, mesh, hubert_tp_spec),
        f0_estimator=F0Estimator(),
        runtime=runtime,
        shard=make_chunk_sharder(mesh),
        data_parallel=mesh.shape["data"],
    )
    out_tp, sr_tp = tp.convert(audio, f0_method="pm", index_rate=0.0)
    assert sr_single == sr_tp
    assert out_single.shape == out_tp.shape
    np.testing.assert_allclose(
        out_tp.astype(np.int32), out_single.astype(np.int32), atol=2
    )


def test_sharded_vc_matches_single_device():
    """Full VoiceConverter with the segment batch sharded over the 8-device
    "data" axis must reproduce the unsharded output (per-row fold_in noise
    makes the draw invariant to batch padding)."""
    from conftest import load_fixture
    from aicovergen_tpu.convert.hubert_convert import transformers_state_to_tree
    from aicovergen_tpu.convert.torch_reader import fold_weight_norm, nest
    from aicovergen_tpu.parallel.mesh import make_chunk_sharder
    from aicovergen_tpu.pipeline.f0 import F0Estimator
    from aicovergen_tpu.pipeline.vc import SR, VoiceConverter
    from aicovergen_tpu.utils.config import RuntimeConfig

    fx = load_fixture("rvc_synth_v2f0.npz")
    flat = {
        k[3:]: fx[k]
        for k in fx.files
        if k.startswith("sd:")
        and not k[3:].startswith("enc_q.")
        and not k.endswith("num_batches_tracked")
    }
    synth_params = nest(fold_weight_norm(flat))
    hx = load_fixture("hubert_base.npz")
    hubert_params = transformers_state_to_tree(
        {k[3:]: hx[k] for k in hx.files if k.startswith("sd:")}
    )
    runtime = RuntimeConfig(x_pad=1, x_query=1, x_center=3, x_max=5, bucket_samples=8000)
    common = dict(
        synth_params=synth_params,
        synth_cfg=RVCConfig(version="v2", if_f0=True),
        hubert_params=hubert_params,
        f0_estimator=F0Estimator(),
        runtime=runtime,
    )
    t = np.arange(SR * 7) / SR
    audio = (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float64)

    single = VoiceConverter(**common)
    out_single, sr_single = single.convert(audio, f0_method="pm", index_rate=0.0)

    mesh = make_mesh(8)
    sharded = VoiceConverter(
        **common, shard=make_chunk_sharder(mesh), data_parallel=mesh.shape["data"]
    )
    out_sharded, sr_sharded = sharded.convert(audio, f0_method="pm", index_rate=0.0)

    assert sr_single == sr_sharded
    assert out_single.shape == out_sharded.shape
    # int16 outputs: identical up to one quantization step
    np.testing.assert_allclose(
        out_sharded.astype(np.int32), out_single.astype(np.int32), atol=2
    )

    # device-resident output path: exercises the shard_map assemble
    # (_assemble_sharded — local scan per shard + one psum over "data"),
    # which the host path above returns before reaching
    dev_single, dsr1, n1 = single.convert(
        audio, f0_method="pm", index_rate=0.0, output="device_int16"
    )
    dev_sharded, dsr2, n2 = sharded.convert(
        audio, f0_method="pm", index_rate=0.0, output="device_int16"
    )
    assert (dsr1, n1) == (dsr2, n2)
    np.testing.assert_allclose(
        np.asarray(dev_sharded[:n2], np.int32),
        np.asarray(dev_single[:n1], np.int32),
        atol=2,
    )
