"""Parity of the experimental NHWC flat-position Pallas conv (interpret
mode): single conv and the fused conv->relu->conv pair vs lax convs,
including image-edge and W-edge tap masking."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aicovergen_tpu.ops.pallas_conv_nhwc as pc


def _ref_conv(x_nhwc, w, b):
    x = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NCHW", "OIHW", "NCHW")
    ) + b.reshape(1, -1, 1, 1)
    return jnp.transpose(y, (0, 2, 3, 1))


@pytest.mark.parametrize("shape", [(2, 4, 8, 16, 128), (1, 8, 8, 32, 256)])
def test_nhwc_conv_and_pair_match_lax(shape):
    b, c_in, c_out, h, w = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c_in)).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((c_out, c_in, 3, 3)) * 0.1).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal((c_out,)).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((c_out, c_out, 3, 3)) * 0.1).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal((c_out,)).astype(np.float32))

    orig = pc.pl.pallas_call

    def interpreted(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pc.pl, "pallas_call", interpreted):
        y = pc.conv3x3_nhwc(x, w1, b1)
        yp = pc.conv3x3_nhwc_pair(x, w1, b1, w2, b2)
    ref = _ref_conv(x, w1, b1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)
    refp = _ref_conv(jax.nn.relu(ref), w2, b2)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(refp), atol=2e-5)
