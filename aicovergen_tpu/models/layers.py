"""Functional NN primitives over pytree parameters (torch-layout weights).

Every model in this framework is a pure function ``f(params, *inputs)`` where
``params`` is a nested dict mirroring the source checkpoint's
``state_dict()`` structure (split on '.').  That makes weight conversion
mechanical (convert/torch_reader.py) and keeps everything jit/vmap/pjit
transparent.

Weight layouts follow torch conventions so converted checkpoints drop in
unchanged:
  Linear          weight (out, in)
  Conv1d          weight (out, in/groups, k)
  ConvTranspose1d weight (in, out/groups, k)
  Conv2d          weight (out, in/groups, kh, kw)
  GRU             weight_ih (3H, in) gate order [r, z, n]
Weight-norm is folded at conversion time, never at runtime.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1  # reference src/infer_pack/modules.py:17


def leaky_relu(x, slope: float = LRELU_SLOPE):
    return jnp.where(x >= 0, x, x * slope)


def linear(p, x):
    y = jnp.matmul(x, p["weight"].T)
    if "bias" in p:
        y = y + p["bias"]
    return y


def embedding(p, ids):
    return jnp.take(p["weight"], ids, axis=0)


def layer_norm(p, x, axis: int = -1, eps: float = 1e-5):
    """LayerNorm over `axis` with weight/bias (or gamma/beta) params.
    Statistics are computed in >=fp32 regardless of the bf16 compute dtype."""
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(cdt)
    mean = jnp.mean(xf, axis=axis, keepdims=True)
    var = jnp.var(xf, axis=axis, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    w = p.get("weight", p.get("gamma"))
    b = p.get("bias", p.get("beta"))
    shape = [1] * x.ndim
    shape[axis] = -1
    out = xn * w.reshape(shape).astype(cdt) + b.reshape(shape).astype(cdt)
    return out.astype(x.dtype)


def group_norm(p, x, num_groups: int, eps: float = 1e-5, valid_len=None):
    """torch GroupNorm over (B, C, ...).

    valid_len (B,) restricts the statistics to the first valid_len positions
    of the last axis — required for static-bucket padding to be exact, since
    GN statistics span the whole time axis.
    """
    b, c = x.shape[0], x.shape[1]
    g = num_groups
    cdt = jnp.promote_types(x.dtype, jnp.float32)  # fp32 statistics under bf16
    xg = x.astype(cdt).reshape((b, g, c // g) + x.shape[2:])
    axes = tuple(range(2, xg.ndim))
    if valid_len is None:
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.var(xg, axis=axes, keepdims=True)
    else:
        mask_shape = (b,) + (1,) * (xg.ndim - 2) + (x.shape[-1],)
        mask = (jnp.arange(x.shape[-1])[None, :] < valid_len[:, None]).reshape(mask_shape)
        count = jnp.sum(mask, axis=axes, keepdims=True) * (c // g) * 1.0
        xm = jnp.where(mask, xg, 0.0)
        mean = jnp.sum(xm, axis=axes, keepdims=True) / count
        var = jnp.sum(jnp.where(mask, jnp.square(xg - mean), 0.0), axis=axes, keepdims=True) / count
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    xn = xg.reshape(x.shape)
    shape = (1, c) + (1,) * (x.ndim - 2)
    out = xn * p["weight"].reshape(shape).astype(cdt) + p["bias"].reshape(shape).astype(cdt)
    return out.astype(x.dtype)


def batch_norm(p, x, eps: float = 1e-5):
    """Inference-mode BatchNorm (running statistics) over (B, C, ...).
    The scale/shift are folded in >=fp32 and applied in the compute dtype."""
    c = x.shape[1]
    shape = (1, c) + (1,) * (x.ndim - 2)
    cdt = jnp.promote_types(x.dtype, jnp.float32)
    w = p["weight"].astype(cdt)
    rv = p["running_var"].astype(cdt)
    rm = p["running_mean"].astype(cdt)
    b = p["bias"].astype(cdt)
    scale = w * jax.lax.rsqrt(rv + eps)
    shift = b - rm * scale
    return x * scale.reshape(shape).astype(x.dtype) + shift.reshape(shape).astype(x.dtype)


def conv1d(p, x, stride: int = 1, padding: int = 0, dilation: int = 1, groups: int = 1):
    """torch Conv1d on (B, C, T)."""
    y = jax.lax.conv_general_dilated(
        x,
        p["weight"],
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"][None, :, None]
    return y


def conv_transpose1d(p, x, stride: int = 1, padding: int = 0, output_padding: int = 0):
    """torch ConvTranspose1d on (B, C, T): conv with input dilation and a
    flipped, in/out-swapped kernel."""
    w = p["weight"]  # (in, out, k)
    k = w.shape[-1]
    w = jnp.flip(w, axis=-1).swapaxes(0, 1)  # (out, in, k)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding + output_padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if "bias" in p:
        y = y + p["bias"][None, :, None]
    return y


def conv2d(p, x, stride=(1, 1), padding=(0, 0), dilation=(1, 1), groups: int = 1):
    """torch Conv2d on (B, C, H, W)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    y = jax.lax.conv_general_dilated(
        x,
        p["weight"],
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"][None, :, None, None]
    return y


def conv_transpose2d(p, x, stride=(1, 1), padding=(0, 0), output_padding=(0, 0)):
    """torch ConvTranspose2d on (B, C, H, W)."""
    w = p["weight"]  # (in, out, kh, kw)
    kh, kw = w.shape[-2], w.shape[-1]
    w = jnp.flip(w, axis=(-2, -1)).swapaxes(0, 1)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[
            (kh - 1 - padding[0], kh - 1 - padding[0] + output_padding[0]),
            (kw - 1 - padding[1], kw - 1 - padding[1] + output_padding[1]),
        ],
        lhs_dilation=stride,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in p:
        y = y + p["bias"][None, :, None, None]
    return y


def avg_pool2d(x, kernel: Sequence[int]):
    """torch AvgPool2d(kernel) with stride == kernel on (B, C, H, W)."""
    kh, kw = kernel
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, kh, kw), (1, 1, kh, kw), "VALID"
    ) / (kh * kw)


def gru_cell_scan(p, x, h0, reverse: bool = False, suffix: str = ""):
    """One direction of a torch nn.GRU layer on (B, T, in).

    The input projection (the big matmul) is hoisted out of the scan so the
    MXU sees one large (B*T, in) x (in, 3H) contraction; the scan carries only
    the (B, H) hidden matvec.
    """
    w_ih = p[f"weight_ih_l0{suffix}"]  # (3H, in)
    w_hh = p[f"weight_hh_l0{suffix}"]  # (3H, H)
    b_ih = p.get(f"bias_ih_l0{suffix}")
    b_hh = p.get(f"bias_hh_l0{suffix}")
    hidden = w_hh.shape[1]

    xp = jnp.einsum("bti,hi->bth", x, w_ih)
    if b_ih is not None:
        xp = xp + b_ih

    def step(h, xt):
        hp = jnp.matmul(h, w_hh.T)
        if b_hh is not None:
            hp = hp + b_hh
        xr, xz, xn = jnp.split(xt, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    xs = jnp.swapaxes(xp, 0, 1)  # (T, B, 3H)
    _, ys = jax.lax.scan(step, jnp.broadcast_to(h0, (x.shape[0], hidden)), xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


def bigru(p, x):
    """torch nn.GRU(bidirectional=True, num_layers=1, batch_first=True):
    returns (B, T, 2H) with [forward, backward] concatenated."""
    hidden = p["weight_hh_l0"].shape[1]
    h0 = jnp.zeros((hidden,), x.dtype)
    fwd = gru_cell_scan(p, x, h0, reverse=False, suffix="")
    bwd = gru_cell_scan(p, x, h0, reverse=True, suffix="_reverse")
    return jnp.concatenate([fwd, bwd], axis=-1)


def interpolate_nearest_2x(x):
    """F.interpolate(scale_factor=2, mode='nearest') on (B, C, T)."""
    return jnp.repeat(x, 2, axis=-1)


def interpolate_nearest(x, scale: int):
    return jnp.repeat(x, scale, axis=-1)


def interpolate_linear_align_corners(x, scale: int):
    """F.interpolate(scale_factor=s, mode='linear', align_corners=True)
    on (B, C, T)."""
    t_in = x.shape[-1]
    t_out = t_in * scale
    if t_in == 1:
        return jnp.repeat(x, t_out, axis=-1)
    pos = jnp.arange(t_out) * (t_in - 1) / (t_out - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    w = (pos - lo).astype(x.dtype)
    return x[..., lo] * (1 - w) + x[..., hi] * w


def sequence_mask(lengths, max_len: int):
    """commons.sequence_mask (reference src/infer_pack/commons.py:126-130):
    (B,) lengths -> (B, max_len) bool."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def fused_gate(x_in, g_l, hidden: int):
    """fused_add_tanh_sigmoid_multiply
    (reference src/infer_pack/commons.py:105-112)."""
    in_act = x_in + g_l
    t_act = jnp.tanh(in_act[:, :hidden])
    s_act = jax.nn.sigmoid(in_act[:, hidden:])
    return t_act * s_act
