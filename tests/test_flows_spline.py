"""Neural-spline flow properties: invertibility, exact log-det (vs autodiff),
tail behavior, and the ConvFlow round-trip (reference transforms.py /
modules.py ConvFlow — dead code at inference in the reference, implemented
for completeness)."""

import numpy as np

import jax
import jax.numpy as jnp

from aicovergen_tpu.models.flows_spline import (
    conv_flow,
    piecewise_rational_quadratic_transform,
    unconstrained_rational_quadratic_spline,
)


def _spline_params(shape, num_bins=10, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal(shape + (num_bins,)) * 0.5),
        jnp.asarray(rng.standard_normal(shape + (num_bins,)) * 0.5),
        jnp.asarray(rng.standard_normal(shape + (num_bins - 1,)) * 0.5),
    )


def test_spline_invertibility():
    uw, uh, ud = _spline_params((64,))
    x = jnp.asarray(np.random.default_rng(1).uniform(-8, 8, 64))  # incl. tails
    y, ld_f = unconstrained_rational_quadratic_spline(x, uw, uh, ud, tail_bound=5.0)
    x_back, ld_i = unconstrained_rational_quadratic_spline(
        y, uw, uh, ud, inverse=True, tail_bound=5.0
    )
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-6)
    # inverse log-det is the negation of the forward one
    np.testing.assert_allclose(np.asarray(ld_i), -np.asarray(ld_f), atol=1e-6)


def test_spline_logdet_matches_autodiff():
    uw, uh, ud = _spline_params((16,), seed=2)
    x = jnp.asarray(np.random.default_rng(3).uniform(-4.5, 4.5, 16))

    def f_scalar(xi, w, h, d):
        y, _ = unconstrained_rational_quadratic_spline(
            xi[None], w[None], h[None], d[None], tail_bound=5.0
        )
        return y[0]

    grads = jax.vmap(jax.grad(f_scalar))(x, uw, uh, ud)
    _, logdet = unconstrained_rational_quadratic_spline(x, uw, uh, ud, tail_bound=5.0)
    np.testing.assert_allclose(np.asarray(logdet), np.log(np.abs(np.asarray(grads))), atol=1e-5)


def test_spline_identity_tails():
    uw, uh, ud = _spline_params((8,), seed=4)
    x = jnp.asarray(np.array([-9.0, -6.0, 6.0, 9.0, 100.0, -100.0, 5.5, -5.5]))
    y, ld = unconstrained_rational_quadratic_spline(x, uw, uh, ud, tail_bound=5.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(np.asarray(ld), 0.0)


def test_piecewise_dispatcher_no_tails():
    uw, uh, ud = _spline_params((32,), seed=5)
    ud = jnp.pad(ud, ((0, 0), (1, 1)))  # interval mode takes bins+1 derivatives
    x = jnp.asarray(np.random.default_rng(6).uniform(0.01, 0.99, 32))
    y, _ = piecewise_rational_quadratic_transform(x, uw, uh, ud)
    assert ((np.asarray(y) > 0) & (np.asarray(y) < 1)).all()


def _conv_flow_params(half, filt, kernel, n_layers, num_bins, seed=0):
    rng = np.random.default_rng(seed)

    def conv(out, inp, k):
        return {
            "weight": jnp.asarray(rng.standard_normal((out, inp, k)) * 0.1),
            "bias": jnp.zeros(out),
        }

    def ln(c):
        return {"gamma": jnp.ones(c), "beta": jnp.zeros(c)}

    return {
        "pre": conv(filt, half, 1),
        "convs": {
            "convs_sep": {
                str(i): {
                    "weight": jnp.asarray(rng.standard_normal((filt, 1, kernel)) * 0.1),
                    "bias": jnp.zeros(filt),
                }
                for i in range(n_layers)
            },
            "convs_1x1": {str(i): conv(filt, filt, 1) for i in range(n_layers)},
            "norms_1": {str(i): ln(filt) for i in range(n_layers)},
            "norms_2": {str(i): ln(filt) for i in range(n_layers)},
        },
        # proj is zero-initialized in the reference (modules.py:489-490):
        # an untrained ConvFlow is the identity transform
        "proj": {
            "weight": jnp.zeros((half * (num_bins * 3 - 1), filt, 1)),
            "bias": jnp.zeros(half * (num_bins * 3 - 1)),
        },
    }


def test_conv_flow_roundtrip_and_zero_init_identity():
    half, filt, kernel, n_layers, num_bins = 4, 16, 3, 3, 10
    params = _conv_flow_params(half, filt, kernel, n_layers, num_bins)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 2 * half, 12)) * 2)
    x_mask = jnp.ones((2, 1, 12))

    # zero-init proj (the reference's init, modules.py:489-490): the x0 half
    # passes through untouched and the spline half stays invertible
    y, logdet = conv_flow(params, x, x_mask, kernel, n_layers, num_bins)
    np.testing.assert_allclose(np.asarray(y)[:, :half], np.asarray(x)[:, :half])
    x_back = conv_flow(params, y, x_mask, kernel, n_layers, num_bins, reverse=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-5)
    assert np.isfinite(np.asarray(logdet)).all()

    # non-trivial proj: forward then reverse recovers the input
    params["proj"]["weight"] = jnp.asarray(
        rng.standard_normal(params["proj"]["weight"].shape) * 0.3
    )
    params["proj"]["bias"] = jnp.asarray(
        rng.standard_normal(params["proj"]["bias"].shape) * 0.3
    )
    y, _ = conv_flow(params, x, x_mask, kernel, n_layers, num_bins)
    x_back = conv_flow(params, y, x_mask, kernel, n_layers, num_bins, reverse=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-5)
