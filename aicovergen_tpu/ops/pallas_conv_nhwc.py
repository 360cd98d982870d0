"""Pallas TPU kernel: 3x3 same-padding conv in NHWC flat-position form.

STATUS: experimental, NOT wired into the MDX executor — measured SLOWER
than XLA's conv.  Amortized on the session v5e at the conv-TDF scale-0
shape (B8 C32->32 3072x256 bf16):

    lax.conv_general_dilated      14.3 ms   8.1 TF/s
    this kernel (single conv)     27.7 ms   4.2 TF/s
    this kernel (fused conv pair) 54.9 ms   4.2 TF/s

Third formulation attempt (see ops/pallas_conv.py for the NCHW one).  The
idea: flatten the image to (positions, C) so every patch tap (dy, dx) is
the same array shifted by dy*W + dx - 1 rows — sublane-offset views, a 2D
MXU dot (M, 9C) x (9C, C_out), and a layout that lets conv -> relu ->
conv fuse in VMEM with one halo of recompute.  The math is exact (see
tests/test_pallas_conv_nhwc.py) but the performance dies on the same
rock as the NCHW version: with C = 32 every vector op uses a quarter of
the 128 lanes, and the x9[:, k*C:(k+1)*C] column writes are lane-subtile
stores that shuffle.  Conclusion recorded for future rounds: beating
XLA's conv on this part needs C >= 128 per lane-tile — i.e. a different
network layout, not a better kernel for this one.

Halo handling (the part worth keeping): BlockSpecs cannot overlap and
manual DMA slices need 128-aligned minor dims, so each grid step takes
THREE tile views of the input (prev/cur/next, block indices clamped at
the edges); taps whose global row leaves the image — including reads of
a clamped duplicate block — are masked by an iota predicate, as are
W-edge taps that wrap across rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_h_tile(c_in: int, c_out: int, h: int, w: int, itemsize: int, halo: int) -> int:
    budget = 48 * 1024 * 1024
    for h_t in (32, 16, 8):
        if h % h_t:
            continue
        m = (h_t + halo) * w
        need = (
            3 * 2 * h_t * w * c_in * itemsize  # 3 input views, double-buffered
            + 3 * h_t * w * c_in * itemsize  # xcat value
            + m * 9 * c_in * itemsize  # patch matrix
            + 2 * h_t * w * c_out * itemsize  # out blocks x2
            + m * max(c_in, c_out) * 4  # f32 accumulator
        )
        if need <= budget:
            return h_t
    return 0


def k_idx(dy: int, dx: int) -> int:
    return dy * 3 + dx


def _build_patches(xcat, base: int, m: int, w: int, c: int, rows0, h_total: int, x9):
    """xcat: (rows, C) value.  Writes x9[:, k*C:(k+1)*C] =
    xcat[base + p + dy*W + dx - 1] for output-row positions p in [0, m),
    masked to zero wherever the tap's global row falls outside
    [0, h_total) or wraps across a W edge.  rows0 = global image row of
    position p = 0 (may be a traced value)."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    col = pos % w
    row = pos // w
    left_edge = col == 0
    right_edge = col == w - 1
    for dy in range(3):
        g_row = rows0 + row + (dy - 1)
        in_img = (g_row >= 0) & (g_row < h_total)
        for dx in range(3):
            start = base + dy * w + dx - 1
            tap = jax.lax.slice_in_dim(xcat, start, start + m, axis=0)
            bad = ~in_img
            if dx == 0:
                bad = bad | left_edge
            elif dx == 2:
                bad = bad | right_edge
            tap = jnp.where(bad, jnp.zeros_like(tap), tap)
            x9[:, k_idx(dy, dx) * c : (k_idx(dy, dx) + 1) * c] = tap
    return x9


def _kernel(prev_ref, cur_ref, next_ref, w9a_ref, ba_ref, w9b_ref, bb_ref,
            out_ref, x9a, mid, x9b, *, c_in: int, c_mid: int, c_out: int,
            h_t: int, w: int, h_total: int, pair: bool, out_dtype):
    i = pl.program_id(1)
    m_out = h_t * w
    xcat = jnp.concatenate([prev_ref[0], cur_ref[0], next_ref[0]], axis=0)

    if pair:
        m_mid = m_out + 2 * w
        # conv1 over the +-1-row halo; its out-of-image rows are zeroed so
        # conv2 sees same-padding semantics (zeros, not conv1-of-padding)
        p1 = _build_patches(
            xcat, m_out - 2 * w, m_mid, w, c_in, i * h_t - 1, h_total, x9a
        )
        acc1 = jax.lax.dot_general(
            p1[:], w9a_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + ba_ref[:].astype(jnp.float32)
        g_row = jax.lax.broadcasted_iota(jnp.int32, (m_mid, 1), 0) // w + i * h_t - 1
        inimg = (g_row >= 0) & (g_row < h_total)
        mid[:] = jnp.where(inimg, jax.nn.relu(acc1), 0).astype(mid.dtype)
        # conv2's output position p reads mid rows p + dy*W + dx - 1
        # (mid row j holds global position (i*h_t - 1)*W + j); the front and
        # tail guards keep the two single-element corner-tap slices in
        # bounds (their values are masked anyway)
        p2 = _build_patches(
            jnp.pad(mid[:], ((8, 8), (0, 0))), 8, m_out, w, c_mid,
            i * h_t, h_total, x9b,
        )
        acc2 = jax.lax.dot_general(
            p2[:], w9b_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bb_ref[:].astype(jnp.float32)
        out_ref[:] = acc2.reshape(1, m_out, c_out).astype(out_dtype)
    else:
        p1 = _build_patches(xcat, m_out - w, m_out, w, c_in, i * h_t, h_total, x9a)
        acc1 = jax.lax.dot_general(
            p1[:], w9a_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + ba_ref[:].astype(jnp.float32)
        out_ref[:] = acc1.reshape(1, m_out, c_out).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("h_t", "w", "pair"))
def _conv_call(xf, w9a, ba, w9b, bb, h_t: int, w: int, pair: bool):
    b, rows, c_in = xf.shape
    h = rows // w
    c_mid = w9a.shape[1]
    c_out = w9b.shape[1] if pair else c_mid
    m_out = h_t * w
    m_mid = m_out + 2 * w
    n_tiles = h // h_t
    kern = functools.partial(
        _kernel, c_in=c_in, c_mid=c_mid, c_out=c_out, h_t=h_t, w=w,
        h_total=h, pair=pair, out_dtype=xf.dtype,
    )

    def tile_spec(off):
        def imap(bi, i):
            return (bi, jnp.clip(i + off, 0, n_tiles - 1), 0)

        return pl.BlockSpec((1, m_out, c_in), imap, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            tile_spec(-1),
            tile_spec(0),
            tile_spec(1),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, m_out, c_out), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c_out), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM(((m_mid if pair else m_out), 9 * c_in), xf.dtype),
            pltpu.VMEM((m_mid, c_mid) if pair else (16, 16), xf.dtype),
            pltpu.VMEM((m_out, 9 * c_mid) if pair else (16, 16), xf.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * (c_in * c_mid + (c_mid * c_out if pair else 0)),
            bytes_accessed=xf.size * xf.dtype.itemsize * 4,
            transcendentals=0,
        ),
    )(xf, xf, xf, w9a, ba, w9b, bb)


def _prep_w(w, dtype):
    """OIHW -> (9*C_in, C_out) with k = dy*3+dx then c ordering."""
    c_out, c_in = w.shape[0], w.shape[1]
    return jnp.transpose(w, (2, 3, 1, 0)).reshape(9 * c_in, c_out).astype(dtype)


def conv3x3_nhwc(x, w, bias=None):
    """Single 3x3 stride-1 same-pad conv: x (B,H,W,C) -> (B,H,W,C_out)."""
    b, h, width, c_in = x.shape
    c_out = w.shape[0]
    h_t = _pick_h_tile(c_in, c_out, h, width, x.dtype.itemsize, 0)
    w9 = _prep_w(w, x.dtype)
    ba = (bias if bias is not None else jnp.zeros((c_out,), x.dtype)).reshape(1, c_out).astype(x.dtype)
    xf = x.reshape(b, h * width, c_in)
    dummy_w = jnp.zeros((1, 1), x.dtype)
    dummy_b = jnp.zeros((1, 1), x.dtype)
    out = _conv_call(xf, w9, ba, dummy_w, dummy_b, h_t, width, False)
    return out.reshape(b, h, width, c_out)


def conv3x3_nhwc_pair(x, w1, b1, w2, b2):
    """conv2(relu(conv1(x))): both 3x3 stride-1 same-pad, fused in VMEM."""
    b, h, width, c_in = x.shape
    c_mid, c_out = w1.shape[0], w2.shape[0]
    h_t = _pick_h_tile(c_in, max(c_mid, c_out), h, width, x.dtype.itemsize, 2)
    w9a = _prep_w(w1, x.dtype)
    w9b = _prep_w(w2, x.dtype)
    ba = b1.reshape(1, c_mid).astype(x.dtype)
    bb = b2.reshape(1, c_out).astype(x.dtype)
    xf = x.reshape(b, h * width, c_in)
    out = _conv_call(xf, w9a, ba, w9b, bb, h_t, width, True)
    return out.reshape(b, h, width, c_out)
