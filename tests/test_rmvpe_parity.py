"""RMVPE parity vs reference golden fixtures (E2E net + cents decode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import load_fixture
from aicovergen_tpu.convert.torch_reader import nest
from aicovergen_tpu.models.rmvpe import RMVPE, decode_cents, e2e_forward



pytestmark = pytest.mark.slow

def test_e2e_parity():
    fx = load_fixture("rmvpe_e2e.npz")
    flat = {
        k[3:]: fx[k]
        for k in fx.files
        if k.startswith("sd:") and not k.endswith("num_batches_tracked")
    }
    params = nest(flat)
    out = e2e_forward(params, jnp.asarray(fx["mel"]))
    ref = fx["hidden"]
    ours = np.asarray(out)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_decode_parity():
    fx = load_fixture("rmvpe_decode.npz")
    f0 = np.asarray(decode_cents(jnp.asarray(fx["salience"]), thred=0.03))
    np.testing.assert_allclose(f0, fx["f0"], rtol=1e-5, atol=1e-3)


def test_infer_from_audio_shape():
    """End-to-end wrapper: frame count and padding contract
    (reference rmvpe.py:350-357, 366-383)."""
    fx = load_fixture("rmvpe_e2e.npz")
    flat = {
        k[3:]: fx[k]
        for k in fx.files
        if k.startswith("sd:") and not k.endswith("num_batches_tracked")
    }
    model = RMVPE(nest(flat))
    sr = 16000
    t = np.arange(sr) / sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    f0 = np.asarray(model.infer(jnp.asarray(audio)))
    assert f0.shape == (sr // 160 + 1,)
    assert np.all(np.isfinite(f0))


def test_bn_folding_equivalence():
    """BN-folded tree (the production form) matches the raw tree."""
    from aicovergen_tpu.convert.bn_fold import fold_rmvpe_tree

    fx = load_fixture("rmvpe_e2e.npz")
    flat = {
        k[3:]: fx[k]
        for k in fx.files
        if k.startswith("sd:") and not k.endswith("num_batches_tracked")
    }
    raw = nest(flat)
    folded = fold_rmvpe_tree(raw)
    mel = jnp.asarray(fx["mel"])
    out_raw = np.asarray(e2e_forward(raw, mel))
    out_folded = np.asarray(e2e_forward(folded, mel))
    np.testing.assert_allclose(out_folded, out_raw, rtol=1e-4, atol=1e-5)


def test_e2e_tiny_parity():
    """The depth-flexible loader (layer counts read from the tree, not the
    module constants) against a reference E2E(1, 1, (2,2), en_de_layers=2,
    inter_layers=1, en_out_channels=8) golden — the dryrun/test tier's tiny
    checkpoint family must be exactly as trustworthy as the released shape."""
    fx = load_fixture("rmvpe_tiny.npz")
    flat = {
        k[3:]: fx[k]
        for k in fx.files
        if k.startswith("sd:") and not k.endswith("num_batches_tracked")
    }
    out = e2e_forward(nest(flat), jnp.asarray(fx["mel"]))
    ref = fx["hidden"]
    ours = np.asarray(out)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)
