"""Neural-spline flow: piecewise rational-quadratic transform + ConvFlow.

Functional-JAX equivalent of reference src/infer_pack/transforms.py:12-209
and the ConvFlow / DDSConv modules (src/infer_pack/modules.py:87-133,
465-522).  In the reference these are reachable only through ConvFlow, which
no shipped synthesizer instantiates at inference — they are part of the
upstream VITS flow family, provided here for architectural completeness and
for training experiments.  The math follows Durkan et al., "Neural Spline
Flows" (monotonic rational-quadratic splines with linear tails).

Everything is vectorized (no data-dependent Python control flow): bin lookup
is a one-hot sum rather than searchsorted-and-gather, so the transform jits
and shards cleanly.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import conv1d, layer_norm

DEFAULT_MIN_BIN_WIDTH = 1e-3  # reference transforms.py:8-10
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Monotonic RQ spline on [left,right]->[bottom,top]
    (reference transforms.py:100-209).  All inputs share a leading elementwise
    shape; the trailing axis of the unnormalized params is num_bins (+1 for
    derivatives).  Returns (outputs, logabsdet)."""
    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left)
    cumwidths = cumwidths.at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    # bin index: number of knots strictly below the input, clamped
    # (transforms.py searchsorted semantics, :45-47)
    grid = cumheights if inverse else cumwidths
    bin_idx = jnp.sum(inputs[..., None] >= grid[..., 1:-1], axis=-1)
    onehot = jax.nn.one_hot(bin_idx, num_bins, dtype=inputs.dtype)

    def pick(arr):
        return jnp.sum(arr * onehot, axis=-1)

    input_cumwidths = pick(cumwidths[..., :-1])
    input_bin_widths = pick(widths)
    input_cumheights = pick(cumheights[..., :-1])
    input_heights = pick(heights)
    delta = heights / widths
    input_delta = pick(delta)
    input_derivatives = pick(derivatives[..., :-1])
    input_derivatives_p1 = pick(derivatives[..., 1:])

    if inverse:
        a = (inputs - input_cumheights) * (
            input_derivatives + input_derivatives_p1 - 2 * input_delta
        ) + input_heights * (input_delta - input_derivatives)
        b = input_heights * input_derivatives - (inputs - input_cumheights) * (
            input_derivatives + input_derivatives_p1 - 2 * input_delta
        )
        c = -input_delta * (inputs - input_cumheights)
        discriminant = jnp.square(b) - 4 * a * c
        root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(discriminant, 0.0)))
        outputs = root * input_bin_widths + input_cumwidths
        theta_one_minus_theta = root * (1 - root)
        denominator = input_delta + (
            (input_derivatives + input_derivatives_p1 - 2 * input_delta)
            * theta_one_minus_theta
        )
        derivative_numerator = jnp.square(input_delta) * (
            input_derivatives_p1 * jnp.square(root)
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * jnp.square(1 - root)
        )
        logabsdet = -(jnp.log(derivative_numerator) - 2 * jnp.log(denominator))
        return outputs, logabsdet

    theta = (inputs - input_cumwidths) / input_bin_widths
    theta_one_minus_theta = theta * (1 - theta)
    numerator = input_heights * (
        input_delta * jnp.square(theta) + input_derivatives * theta_one_minus_theta
    )
    denominator = input_delta + (
        (input_derivatives + input_derivatives_p1 - 2 * input_delta)
        * theta_one_minus_theta
    )
    outputs = input_cumheights + numerator / denominator
    derivative_numerator = jnp.square(input_delta) * (
        input_derivatives_p1 * jnp.square(theta)
        + 2 * input_delta * theta_one_minus_theta
        + input_derivatives * jnp.square(1 - theta)
    )
    logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
    return outputs, logabsdet


def unconstrained_rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear tails outside [-tail_bound, tail_bound]
    (reference transforms.py:50-97)."""
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    # pad edge derivatives with the constant that maps to slope 1
    constant = math.log(math.exp(1 - min_derivative) - 1)
    pads = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    unnormalized_derivatives = jnp.pad(
        unnormalized_derivatives, pads, constant_values=constant
    )

    # clamp outside inputs into range so the spline math stays finite, then
    # select identity there
    safe_inputs = jnp.clip(inputs, -tail_bound, tail_bound)
    outputs_in, logabsdet_in = rational_quadratic_spline(
        safe_inputs,
        unnormalized_widths,
        unnormalized_heights,
        unnormalized_derivatives,
        inverse=inverse,
        left=-tail_bound,
        right=tail_bound,
        bottom=-tail_bound,
        top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
    outputs = jnp.where(inside, outputs_in, inputs)
    logabsdet = jnp.where(inside, logabsdet_in, 0.0)
    return outputs, logabsdet


def piecewise_rational_quadratic_transform(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    inverse: bool = False,
    tails: Optional[str] = None,
    tail_bound: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatcher (reference transforms.py:12-42)."""
    if tails == "linear":
        return unconstrained_rational_quadratic_spline(
            inputs,
            unnormalized_widths,
            unnormalized_heights,
            unnormalized_derivatives,
            inverse=inverse,
            tail_bound=tail_bound,
        )
    return rational_quadratic_spline(
        inputs,
        unnormalized_widths,
        unnormalized_heights,
        unnormalized_derivatives,
        inverse=inverse,
    )


# ----------------------------------------------------------------- ConvFlow


def dds_conv(p, x, x_mask, kernel_size: int, n_layers: int, g=None):
    """Dilated depth-separable conv stack (reference modules.py:87-133)."""
    if g is not None:
        x = x + g
    for i in range(n_layers):
        dilation = kernel_size**i
        padding = (kernel_size * dilation - dilation) // 2
        si = str(i)
        y = conv1d(
            p["convs_sep"][si], x * x_mask,
            padding=padding, dilation=dilation, groups=x.shape[1],
        )
        y = layer_norm(p["norms_1"][si], y, axis=1)
        y = jax.nn.gelu(y, approximate=False)
        y = conv1d(p["convs_1x1"][si], y)
        y = layer_norm(p["norms_2"][si], y, axis=1)
        y = jax.nn.gelu(y, approximate=False)
        x = x + y
    return x * x_mask


def conv_flow(
    p,
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    kernel_size: int = 3,
    n_layers: int = 3,
    num_bins: int = 10,
    tail_bound: float = 5.0,
    g=None,
    reverse: bool = False,
):
    """ConvFlow.forward (reference modules.py:494-522) on (B, C, T).
    Returns (x, logdet) forward, x alone in reverse."""
    half = x.shape[1] // 2
    x0, x1 = x[:, :half], x[:, half:]
    filter_channels = p["pre"]["weight"].shape[0]
    h = conv1d(p["pre"], x0)
    h = dds_conv(p["convs"], h, x_mask, kernel_size, n_layers, g=g)
    h = conv1d(p["proj"], h) * x_mask

    b, c, t = x0.shape
    h = h.reshape(b, c, -1, t).transpose(0, 1, 3, 2)  # (B, C, T, 3*bins-1)
    scale = math.sqrt(filter_channels)
    uw = h[..., :num_bins] / scale
    uh = h[..., num_bins : 2 * num_bins] / scale
    ud = h[..., 2 * num_bins :]

    x1, logabsdet = piecewise_rational_quadratic_transform(
        x1, uw, uh, ud, inverse=reverse, tails="linear", tail_bound=tail_bound
    )
    out = jnp.concatenate([x0, x1], axis=1) * x_mask
    if reverse:
        return out
    return out, jnp.sum(logabsdet * x_mask, axis=(1, 2))
