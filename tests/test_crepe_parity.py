"""CREPE parity vs golden fixtures (torch twin of torchcrepe's architecture;
decode goldens from a numpy transcription of torchcrepe.decode.viterbi).
Covers the forward net, viterbi path, weighted-argmax decode, and the
end-to-end predict() contract used by the f0 dispatcher
(reference src/vc_infer_pipeline.py:96-165)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import load_fixture
from aicovergen_tpu.models.crepe import (
    cents_to_hz,
    crepe_forward,
    frame_audio,
    predict,
    torchcrepe_state_to_tree,
    viterbi_bins,
    weighted_argmax_cents,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fx():
    return load_fixture("crepe_full.npz")


@pytest.fixture(scope="module")
def params(fx):
    return torchcrepe_state_to_tree(
        {k[3:]: fx[k] for k in fx.files if k.startswith("sd:")}
    )


def test_frame_audio_matches_golden(fx):
    frames = frame_audio(fx["audio"], int(fx["hop"]))
    np.testing.assert_allclose(frames, fx["frames"], rtol=1e-5, atol=1e-5)


def test_forward_parity(fx, params):
    probs = np.asarray(crepe_forward(params, jnp.asarray(fx["frames"])))
    np.testing.assert_allclose(probs, fx["probs"], rtol=1e-4, atol=1e-4)


def test_viterbi_parity(fx):
    path = np.asarray(viterbi_bins(jnp.asarray(fx["probs"])))
    np.testing.assert_array_equal(path, fx["viterbi_path"])


def test_weighted_argmax_decode(fx):
    """Against a direct numpy transcription of to_local_average_cents."""
    probs = fx["probs"]
    bins = fx["viterbi_path"]
    ours = np.asarray(weighted_argmax_cents(jnp.asarray(probs), jnp.asarray(bins)))

    padded = np.pad(probs, ((0, 0), (4, 4)))
    cents_all = 20.0 * (np.arange(368) - 4) + 1997.3794084376191
    ref = np.empty(len(bins))
    for t, b in enumerate(bins):
        w = padded[t, b : b + 9]
        ref[t] = (w * cents_all[b : b + 9]).sum() / max(w.sum(), 1e-12)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_predict_end_to_end(fx, params):
    f0, pd = predict(params, fx["audio"], int(fx["hop"]), decoder="viterbi")
    assert f0.shape == pd.shape == (fx["probs"].shape[0],)
    assert np.isfinite(f0).all() and (f0 > 0).all()
    assert (pd >= 0).all() and (pd <= 1).all()
    # decode chain consistency: f0 == cents->Hz of the weighted average on
    # the range-masked salience along the viterbi path
    cents_min = 1200 * np.log2(50.0 / 10.0)
    cents_max = 1200 * np.log2(1100.0 / 10.0)
    bin_cents = 20.0 * np.arange(360) + 1997.3794084376191
    masked = fx["probs"] * ((bin_cents >= cents_min) & (bin_cents <= cents_max))[None, :]
    bins = np.asarray(viterbi_bins(jnp.asarray(masked)))
    cents = np.asarray(weighted_argmax_cents(jnp.asarray(masked), jnp.asarray(bins)))
    np.testing.assert_allclose(f0, np.asarray(cents_to_hz(cents)), rtol=1e-5)
