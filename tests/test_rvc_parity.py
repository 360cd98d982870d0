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
