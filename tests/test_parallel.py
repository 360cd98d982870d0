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
