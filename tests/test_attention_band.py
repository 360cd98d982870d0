"""Banded relative-position skew helpers vs the reference pad/shift path.

multi_head_attention computes the rel-pos terms as 2w+1-wide bands
(attention.py _band_to_dense/_dense_to_band) instead of the reference's
(T, 2T-1) shuffles (reference src/infer_pack/attentions.py:313-348); this
pins the two formulations to identical values, including the small-T edge
cases where the band is clipped.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from aicovergen_tpu.models.attention import (
    _band_to_dense,
    _dense_to_band,
    _relative_to_absolute,
)


@pytest.mark.parametrize("t,w", [(50, 10), (8, 10), (1, 10), (64, 3), (2, 1)])
def test_band_skew_matches_reference(t, w):
    rng = np.random.default_rng(0)
    w_eff = min(w, t - 1)
    k = 2 * w_eff + 1
    b, h = 2, 2
    band = jnp.asarray(rng.standard_normal((b, h, t, k)).astype(np.float32))
    wide = np.zeros((b, h, t, 2 * t - 1), np.float32)
    c = t - 1
    wide[..., c - w_eff : c + w_eff + 1] = np.asarray(band)
    dense_ref = np.asarray(_relative_to_absolute(jnp.asarray(wide)))
    t_idx = np.arange(t)[:, None]
    s_idx = np.arange(t)[None, :]
    inband = np.abs(s_idx - t_idx) <= w_eff
    dense_new = np.where(inband, np.asarray(_band_to_dense(band, w_eff)), 0)
    np.testing.assert_allclose(dense_ref, dense_new)

    p = jnp.asarray(rng.standard_normal((b, h, t, t)).astype(np.float32))
    s_pos = t_idx + np.arange(-w_eff, w_eff + 1)[None, :]
    valid = (s_pos >= 0) & (s_pos < t)
    idx = np.clip(s_pos, 0, t - 1)[None, None].repeat(b, 0).repeat(h, 1)
    strips_ref = np.where(valid, np.take_along_axis(np.asarray(p), idx, axis=-1), 0)
    strips_new = np.where(valid, np.asarray(_dense_to_band(p, w_eff)), 0)
    np.testing.assert_allclose(strips_ref, strips_new)


@pytest.mark.parametrize("t,w", [(256, 10), (512, 10), (384, 3)])
def test_blocked_band_matches_fallback(t, w):
    from aicovergen_tpu.models.attention import _band_add_blocked, _strips_blocked

    rng = np.random.default_rng(1)
    b, h = 2, 2
    k = 2 * w + 1
    band = jnp.asarray(rng.standard_normal((b, h, t, k)).astype(np.float32))
    scores = jnp.asarray(rng.standard_normal((b, h, t, t)).astype(np.float32))
    t_idx = np.arange(t)[:, None]
    s_idx = np.arange(t)[None, :]
    inband = np.abs(s_idx - t_idx) <= w
    ref = np.asarray(scores) + np.where(inband, np.asarray(_band_to_dense(band, w)), 0)
    got = np.asarray(_band_add_blocked(scores, band, w))
    np.testing.assert_allclose(ref, got, atol=1e-6)

    p = jnp.asarray(rng.standard_normal((b, h, t, t)).astype(np.float32))
    s_pos = t_idx + np.arange(-w, w + 1)[None, :]
    valid = (s_pos >= 0) & (s_pos < t)
    strips_ref = np.where(valid, np.asarray(_dense_to_band(p, w)), 0)
    got_strips = np.asarray(_strips_blocked(p, w))
    np.testing.assert_allclose(strips_ref, got_strips, atol=1e-6)
