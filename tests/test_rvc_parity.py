"""RVC synthesizer parity vs reference golden fixtures.

Fixtures were produced by scripts/make_fixtures.py running the *reference's
own torch modules* (SynthesizerTrnMs768NSFsid / ..._nono, reference
src/infer_pack/models.py) with seeded random weights and zeroed noise.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import load_fixture
from aicovergen_tpu.convert.torch_reader import fold_weight_norm, nest
from aicovergen_tpu.models.rvc import RVCConfig, synthesizer_infer, text_encoder



pytestmark = pytest.mark.slow

def _params_from_fixture(fx):
    flat = {k[3:]: fx[k] for k in fx.files if k.startswith("sd:")}
    flat = {k: v for k, v in flat.items() if not k.startswith("enc_q.")}
    flat = {k: v for k, v in flat.items() if not k.endswith("num_batches_tracked")}
    return nest(fold_weight_norm(flat))


CFG = RVCConfig(version="v2", if_f0=True)  # matches fixture config (40k arch)


def test_text_encoder_parity():
    fx = load_fixture("rvc_synth_v2f0.npz")
    params = _params_from_fixture(fx)
    m, logs, x_mask = text_encoder(
        params["enc_p"],
        jnp.asarray(fx["phone"], jnp.float32),
        jnp.asarray(fx["pitch"]),
        jnp.asarray(fx["lengths"]),
        CFG,
    )
    np.testing.assert_allclose(np.asarray(m), fx["m_p"], rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logs), fx["logs_p"], rtol=1e-4, atol=2e-4)


def test_full_infer_parity_v2_f0():
    fx = load_fixture("rvc_synth_v2f0.npz")
    params = _params_from_fixture(fx)
    audio = synthesizer_infer(
        params,
        CFG,
        jnp.asarray(fx["phone"], jnp.float32),
        jnp.asarray(fx["lengths"]),
        jnp.asarray(fx["pitch"]),
        jnp.asarray(fx["nsff0"], jnp.float32),
        jnp.asarray(fx["sid"]),
    )
    ref = fx["audio"]
    ours = np.asarray(audio)
    assert ours.shape == ref.shape
    # waveform correlation is the metric that matters for audio parity
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9999, f"waveform corr {corr}"
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=5e-4)


def test_full_infer_parity_v1_nono():
    fx = load_fixture("rvc_synth_v1nono.npz")
    params = _params_from_fixture(fx)
    cfg = RVCConfig(version="v1", if_f0=False)
    audio = synthesizer_infer(
        params,
        cfg,
        jnp.asarray(fx["phone"], jnp.float32),
        jnp.asarray(fx["lengths"]),
        None,
        None,
        jnp.asarray(fx["sid"]),
    )
    ref = fx["audio"]
    ours = np.asarray(audio)
    assert ours.shape == ref.shape
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9999, f"waveform corr {corr}"
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=5e-4)


def test_generator_nsf_windowed_matches_full():
    """The windowed NSF decoder (fixed-size programs for serving) equals the
    full-length computation everywhere except the global signal edges
    (boundary-padding semantics), which the VC pipeline's t_pad trim zones
    discard.  Interior must match to fp tolerance."""
    from aicovergen_tpu.models.rvc import (
        RVCConfig,
        generator_nsf,
        generator_nsf_windowed,
    )
    from aicovergen_tpu.models.rvc_train import init_synthesizer_params

    cfg = RVCConfig(
        spec_channels=33, segment_size=16, inter_channels=32, hidden_channels=32,
        filter_channels=64, n_heads=2, n_layers=2, kernel_size=3, resblock="1",
        resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        upsample_rates=(10, 4, 2), upsample_initial_channel=64,
        upsample_kernel_sizes=(16, 8, 4), spk_embed_dim=4, gin_channels=16,
        sr=16000, version="v2", if_f0=True,
    )
    params = init_synthesizer_params(cfg, seed=3)["dec"]
    rng = np.random.default_rng(4)
    B, T = 2, 300
    x = jnp.asarray(rng.standard_normal((B, cfg.inter_channels, T)).astype(np.float32) * 0.1)
    f0 = jnp.asarray(rng.uniform(80, 400, (B, T)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, cfg.gin_channels, 1)).astype(np.float32) * 0.1)

    ref = np.asarray(generator_nsf(params, x, f0, g, cfg))
    win = np.asarray(generator_nsf_windowed(params, x, f0, g, cfg, window_frames=128))
    assert ref.shape == win.shape == (B, 1, T * cfg.upp)
    # interior: exact to fp (skip one window of samples at each global edge)
    edge = cfg.upp * 64
    np.testing.assert_allclose(win[:, :, edge:-edge], ref[:, :, edge:-edge],
                               rtol=1e-4, atol=1e-5)
    # edges: bounded (these land in the VC pipeline's discarded trim zones)
    assert np.abs(win - ref).max() < 0.05
