"""HuBERT encoder parity vs a transformers HubertModel golden fixture."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import load_fixture
from aicovergen_tpu.convert.hubert_convert import transformers_state_to_tree
from aicovergen_tpu.models.hubert import hubert_extract



pytestmark = pytest.mark.slow

def _params(fx):
    state = {k[3:]: fx[k] for k in fx.files if k.startswith("sd:")}
    return transformers_state_to_tree(state)


def test_hubert_final_layer_parity():
    fx = load_fixture("hubert_base.npz")
    params = _params(fx)
    out = hubert_extract(params, jnp.asarray(fx["audio"]), output_layer=12)
    ref = fx["final"]
    ours = np.asarray(out)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_hubert_layer9_tap_parity():
    """The v1 tap (reference vc_infer_pipeline.py:401: output_layer=9)."""
    fx = load_fixture("hubert_base.npz")
    params = _params(fx)
    out = hubert_extract(params, jnp.asarray(fx["audio"]), output_layer=9)
    np.testing.assert_allclose(np.asarray(out), fx["layer9"], rtol=1e-3, atol=2e-4)
