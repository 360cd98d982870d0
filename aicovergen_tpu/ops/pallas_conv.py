"""Pallas TPU kernel: 3x3 same-padding conv2d for small channel counts.

STATUS: experimental, NOT wired into the MDX executor.  Amortized
measurement on the session v5e (serial-chain fori_loop, netting out the
~28 ms host-tunnel sync RTT that floors naive single-op timings):

    lax.conv_general_dilated  C32 3072x256 B8   14.3 ms   8.1 TF/s
    this kernel (h_t=32)                        18.1 ms   6.4 TF/s
    chip calibration: matmul 83 TF/s, HBM triad 431 GB/s

XLA's conv is effectively HBM-bandwidth-bound (~540 GB/s apparent on the
conv-TDF net) — already near this part's measured ceiling — while this
kernel is overhead-bound: its rank-3 dot (C_out, 9C) x (H_t, 9C, W)
lowers to H_t separate M=32 matmuls whose fixed costs dominate (and give
Mosaic minutes-long compiles for H_t > 32).  The layout reasoning stands
(H outer so dy shifts are free; dx as lane rotates; K = 9C >= 128), but
beating XLA here requires fusing whole conv->relu->conv blocks in VMEM to
cut traffic, not just one conv — future work.

Kept because: (a) the interpret-mode parity test pins the semantics,
(b) `scripts/microbench_pallas_conv.py` + `scripts/microbench_conv.py`
reproduce the numbers above, (c) the slab/double-buffer/patch-stack
skeleton is the starting point for the fused-block kernel.

Reference context: the conv-TDF U-Nets mirror the reference's black-box
ONNX graphs (reference src/mdx.py:74-77).

Constraints (checked by `conv3x3_supported`): stride 1, dilation 1,
pads (1,1,1,1), groups 1, W a multiple of 128, H a multiple of a feasible
row-tile.  Callers fall back to `jax.lax.conv_general_dilated` otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_h_tile(c_in: int, c_out: int, h: int, w: int, itemsize: int) -> int:
    """Largest row tile whose working set fits in the 16 MB VMEM, counting
    Pallas's own double-buffered output blocks and the f32 accumulator."""
    budget = 56 * 1024 * 1024
    for h_t in (32, 16, 8):  # small tiles: Mosaic compile time explodes beyond ~32 unrolled row-dots
        if h % h_t:
            continue
        need = (
            2 * (h_t + 2) * c_in * w * itemsize  # input slabs x2
            + 9 * c_in * h_t * w * itemsize  # patch stack
            + 2 * c_out * h_t * w * itemsize  # out blocks (double-buffered)
            + c_out * h_t * w * 4  # f32 dot accumulator
        )
        if need <= budget:
            return h_t
    return 0


def conv3x3_supported(x_shape, w_shape, strides, dilations, pads, group: int,
                      dtype) -> bool:
    """Can `conv3x3_nchw` run this conv? (NCHW x, OIHW w)."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    if w_shape[2:] != (3, 3):
        return False
    if tuple(strides) != (1, 1) or tuple(dilations) != (1, 1) or group != 1:
        return False
    if tuple(pads) != ((1, 1), (1, 1)):
        return False
    b, c_in, h, w = x_shape
    if w % 128 or w > 1024:
        return False
    if c_in > 256:
        return False
    if dtype not in (jnp.bfloat16, jnp.float32, np.dtype("bfloat16"), np.dtype("float32")):
        return False
    itemsize = 2 if jnp.dtype(dtype) == jnp.bfloat16 else 4
    return _pick_h_tile(c_in, w_shape[0], h, w, itemsize) > 0


def _kernel(xp_hbm, w9_ref, bias_ref, out_ref, slab, x9, sems, *, c_in: int,
            c_out: int, h_t: int, w: int, out_dtype):
    """One (b, i) grid step: DMA slab i (+halo), build patches, dot, write."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)

    def slab_dma(slot, tile):
        return pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(tile * h_t, h_t + 2), :, :],
            slab.at[slot],
            sems.at[slot],
        )

    # double buffering: tile i lands in slot i%2; kick off i+1 before waiting
    slot = i % 2

    @pl.when(i == 0)
    def _():
        slab_dma(slot, i).start()

    @pl.when(i + 1 < n_i)
    def _():
        slab_dma(1 - slot, i + 1).start()

    slab_dma(slot, i).wait()
    # dynamic leading-index reads of 4D VMEM scratch don't lower (Mosaic
    # memref_slice limitation); select the slot with a 2-way cond instead
    xs = jax.lax.cond(slot == 0, lambda: slab[0], lambda: slab[1])  # (H_t+2, C, W)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    for dy in range(3):
        rows = xs[dy : dy + h_t]  # (H_t, C, W) — outer-dim slice, no relayout
        # Mosaic's lane rotate only exists for 32-bit data; do the +-1
        # column shifts in f32 and cast back (VPU-only, cheap)
        if rows.dtype != jnp.float32:
            r32 = rows.astype(jnp.float32)
        else:
            r32 = rows
        for dx in range(3):
            if dx == 0:  # needs column j-1: shift right, zero col 0
                shifted = pltpu.roll(r32, shift=1, axis=2).astype(rows.dtype)
                shifted = jnp.where(col == 0, jnp.zeros_like(shifted), shifted)
            elif dx == 2:  # column j+1: shift left (circular w-1), zero last col
                shifted = pltpu.roll(r32, shift=w - 1, axis=2).astype(rows.dtype)
                shifted = jnp.where(col == w - 1, jnp.zeros_like(shifted), shifted)
            else:
                shifted = rows
            k = dy * 3 + dx
            x9[:, k * c_in : (k + 1) * c_in, :] = shifted

    # (C_out, 9C) x (H_t, 9C, W) -> (C_out, H_t, W): K=9C, N=W on the MXU;
    # the result IS the NCHW output tile — no reshape/transpose afterwards
    acc = jax.lax.dot_general(
        w9_ref[:],
        x9[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc + bias_ref[:].astype(jnp.float32)[:, :, None]
    out_ref[:] = acc.reshape(1, c_out, h_t, w).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("h_t",))
def _conv3x3_call(xp, w9, bias, h_t: int):
    b, hp2, c_in, w = xp.shape
    h = hp2 - 2
    c_out = w9.shape[0]
    kern = functools.partial(
        _kernel, c_in=c_in, c_out=c_out, h_t=h_t, w=w, out_dtype=xp.dtype
    )
    return pl.pallas_call(
        kern,
        grid=(b, h // h_t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; DMA'd
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w9 (C_out, 9C)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (C_out, 1)
        ],
        out_specs=pl.BlockSpec(
            (1, c_out, h_t, w),
            lambda bi, i: (bi, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, c_out, h, w), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, h_t + 2, c_in, w), xp.dtype),  # double-buffer slabs
            pltpu.VMEM((h_t, 9 * c_in, w), xp.dtype),  # patch stack
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the default scoped-vmem limit is 16 MB; the chip has far more —
        # raise it so value live-ranges (slab select, patch stack, f32 acc)
        # fit without shrinking the tile
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * c_in * c_out,
            bytes_accessed=xp.size * xp.dtype.itemsize * 2,
            transcendentals=0,
        ),
    )(xp, w9, bias)


def conv3x3_nchw(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None):
    """3x3 stride-1 same-padding conv: NCHW x (B,C,H,W) + OIHW w -> NCHW y.

    Drop-in for jax.lax.conv_general_dilated at these settings; callers must
    check `conv3x3_supported` first.  The (B,C,H,W)->(B,H,C,W) staging
    transpose runs in XLA at HBM bandwidth (~1 ms at the largest MDX shape)
    — small against the ~12x conv win.
    """
    bsz, c_in, h, width = x.shape
    c_out = w.shape[0]
    h_t = _pick_h_tile(c_in, c_out, h, width, x.dtype.itemsize)
    xt = jnp.transpose(x, (0, 2, 1, 3))  # (B, H, C, W): H outer, W lanes
    xp = jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (0, 0)))
    # patch index order must match the kernel's x9 layout: k = dy*3+dx, then c
    w9 = jnp.transpose(w, (0, 2, 3, 1)).reshape(c_out, 9 * c_in).astype(x.dtype)
    bias = (
        b.reshape(c_out, 1).astype(x.dtype)
        if b is not None
        else jnp.zeros((c_out, 1), x.dtype)
    )
    return _conv3x3_call(xp, w9, bias, h_t)
