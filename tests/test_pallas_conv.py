"""Parity of the experimental Pallas 3x3 conv kernel (interpreter mode).

Pins the kernel's semantics against lax.conv_general_dilated on CPU via
pallas interpret mode; the TPU-compiled path shares the same kernel body
(see scripts/microbench_pallas_conv.py for on-device verification).
"""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aicovergen_tpu.ops.pallas_conv as pc


@pytest.mark.parametrize("shape", [(2, 4, 64, 128), (1, 32, 32, 256)])
def test_conv3x3_matches_lax(shape):
    b, c_in, h, w = shape
    c_out = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    wk = jnp.asarray((rng.standard_normal((c_out, c_in, 3, 3)) * 0.1).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((c_out,)).astype(np.float32))
    assert pc.conv3x3_supported(
        x.shape, wk.shape, (1, 1), (1, 1), ((1, 1), (1, 1)), 1, x.dtype
    )

    orig = pc.pl.pallas_call

    def interpreted(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pc.pl, "pallas_call", interpreted):
        y = pc.conv3x3_nchw(x, wk, bias)
    ref = jax.lax.conv_general_dilated(
        x, wk, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NCHW", "OIHW", "NCHW")
    ) + bias.reshape(1, -1, 1, 1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_conv3x3_supported_gates():
    dt = jnp.float32
    ok = ((8, 32, 3072, 256), (32, 32, 3, 3))
    assert pc.conv3x3_supported(ok[0], ok[1], (1, 1), (1, 1), ((1, 1), (1, 1)), 1, dt)
    # stride, pads, kernel size, lane width gates
    assert not pc.conv3x3_supported(ok[0], ok[1], (2, 2), (1, 1), ((1, 1), (1, 1)), 1, dt)
    assert not pc.conv3x3_supported(ok[0], ok[1], (1, 1), (1, 1), ((0, 0), (0, 0)), 1, dt)
    assert not pc.conv3x3_supported(ok[0], (32, 32, 1, 1), (1, 1), (1, 1), ((1, 1), (1, 1)), 1, dt)
    assert not pc.conv3x3_supported((8, 32, 3072, 250), ok[1], (1, 1), (1, 1), ((1, 1), (1, 1)), 1, dt)
