"""Mixed-precision (bf16) parity: the bf16 compute path must stay close to
fp32 (the reference ships fp16-on-CUDA as its default precision,
src/rvc.py:29-75; bf16 is the TPU equivalent)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import load_fixture
from aicovergen_tpu.convert.hubert_convert import transformers_state_to_tree
from aicovergen_tpu.convert.torch_reader import fold_weight_norm, nest
from aicovergen_tpu.models.rvc import RVCConfig
from aicovergen_tpu.pipeline.f0 import F0Estimator
from aicovergen_tpu.pipeline.vc import SR, VoiceConverter
from aicovergen_tpu.utils.config import RuntimeConfig
from aicovergen_tpu.utils.precision import cast_floats, tree_dtype

pytestmark = pytest.mark.slow


def _hubert_params():
    fx = load_fixture("hubert_base.npz")
    return transformers_state_to_tree({k[3:]: fx[k] for k in fx.files if k.startswith("sd:")})


def _synth():
    fx = load_fixture("rvc_synth_v2f0.npz")
    flat = {k[3:]: fx[k] for k in fx.files if k.startswith("sd:")}
    flat = {
        k: v
        for k, v in flat.items()
        if not k.startswith("enc_q.") and not k.endswith("num_batches_tracked")
    }
    return nest(fold_weight_norm(flat)), RVCConfig(version="v2", if_f0=True)


def _convert(use_bf16: bool):
    synth_params, cfg = _synth()
    hubert_params = _hubert_params()
    if use_bf16:
        synth_params = cast_floats(synth_params, jnp.bfloat16)
        hubert_params = cast_floats(hubert_params, jnp.bfloat16)
    vc = VoiceConverter(
        synth_params=synth_params,
        synth_cfg=cfg,
        hubert_params=hubert_params,
        f0_estimator=F0Estimator(),
        runtime=RuntimeConfig(x_pad=1, x_query=2, x_center=5, x_max=8, bucket_samples=8000),
    )
    t = np.arange(SR * 2) / SR
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float64)
    out, out_sr = vc.convert(audio, f0_method="pm", index_rate=0.0, rms_mix_rate=1.0)
    return out.astype(np.float64), out_sr


def test_cast_floats_dtypes():
    tree = {"a": np.ones((4, 4), np.float32), "b": {"w": np.arange(3, dtype=np.int64)}}
    cast = cast_floats(tree, jnp.bfloat16)
    assert cast["a"].dtype == jnp.bfloat16
    assert cast["b"]["w"].dtype == np.int64  # ints untouched
    assert tree_dtype(cast) == jnp.bfloat16


def test_bf16_vc_output_correlates_with_fp32():
    """End-to-end VC in bf16 vs fp32: waveform correlation must stay high —
    this bounds the quality cost of the MXU-native precision."""
    ref, sr_ref = _convert(use_bf16=False)
    out, sr_out = _convert(use_bf16=True)
    assert sr_ref == sr_out
    n = min(len(ref), len(out))
    assert n > 0 and abs(len(ref) - len(out)) <= 1
    corr = np.corrcoef(ref[:n], out[:n])[0, 1]
    assert corr > 0.95, f"bf16/fp32 correlation too low: {corr}"
    # energy must be in the same ballpark (no silent collapse)
    r_ref = np.sqrt(np.mean(ref**2)) + 1e-9
    r_out = np.sqrt(np.mean(out**2)) + 1e-9
    assert 0.7 < r_out / r_ref < 1.4
