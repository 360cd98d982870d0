"""Freeverb as a single fused Pallas TPU kernel.

The scan-based implementation (ops/reverb.py) evaluates the 8 feedback
combs and 4 serial allpasses as 12 separate `lax.scan` programs — each one
a full HBM round trip over the signal.  This kernel runs the entire
network in one pass: the grid walks 128-sample blocks sequentially, all
delay-line state lives in VMEM scratch, and the per-block damping
recurrence (a one-pole IIR) is evaluated as a matvec against a static
lower-triangular Toeplitz operator — sequential math turned into MXU work.

Correctness relies on every delay being >= the 128-sample block: within a
block each comb/allpass read lands in already-committed state.  The
shortest Freeverb line is the 225-sample allpass, so the kernel supports
sample rates >= 225/128 * 44100/225 ... i.e. any sr >= ~25 kHz (the cover
pipeline runs it at the synthesizer rate, 32/40/48 kHz).  Callers should
fall back to ops.reverb.freeverb otherwise (effects.py does).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .reverb import ALLPASS_TUNINGS, COMB_TUNINGS, STEREO_SPREAD, _scaled

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _interpret() -> bool:
    """Interpreter mode off TPU (CPU tests run the same kernel semantics)."""
    return jax.default_backend() != "tpu"

BLOCK = 128
_BUF = 2048  # ring capacity; max scaled comb delay (48 kHz) is 1785 < 2048


def _toeplitz_pow(d1: float) -> np.ndarray:
    """L[i, j] = d1^(i-j) for i >= j else 0 — applying it to a block of
    inputs evaluates fs[n] = d1*fs[n-1] + in[n] with fs[-1] = 0."""
    i = np.arange(BLOCK)[:, None]
    j = np.arange(BLOCK)[None, :]
    p = i - j
    return np.where(p >= 0, np.power(np.float64(d1), np.maximum(p, 0)), 0.0).astype(
        np.float32
    )


SUB = 8  # 128-sample sub-blocks per grid step (tile constraint: (8, 128))
_ROWS = _BUF // BLOCK  # ring rows; each row is one BLOCK of samples


def _ring_read(buf, ci: int, row: jnp.ndarray, lane_off: int):
    """128 samples starting `lane_off` lanes into ring row `row` (dynamic
    row, STATIC lane offset).

    Mosaic cannot concatenate or slice across lane tiles, so the two
    aligned row reads are each lane-rotated by the same static amount and
    merged with a static mask: positions [0, BLOCK-off) come from row r0,
    the rest from row r1 — single-tile ops only."""
    r0 = jax.lax.rem(row, jnp.int32(_ROWS))
    a = buf[ci, pl.ds(r0, 1), :]  # (1, BLOCK)
    if lane_off == 0:
        return a[0]
    r1 = jax.lax.rem(row + jnp.int32(1), jnp.int32(_ROWS))
    b = buf[ci, pl.ds(r1, 1), :]
    ra = pltpu.roll(a, shift=BLOCK - lane_off, axis=1)
    rb = pltpu.roll(b, shift=BLOCK - lane_off, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
    return jnp.where(lane < BLOCK - lane_off, ra, rb)[0]


def _freeverb_kernel(
    x_ref,  # (1, SUB, BLOCK) input (pre-gained mono)
    toep_ref,  # (BLOCK, BLOCK) damping Toeplitz operator
    powv_ref,  # (SUB, BLOCK) d1^(n+1) carry weights (rows identical)
    out_ref,  # (1, SUB, BLOCK) wet output
    comb_buf,  # scratch (n_combs, _ROWS, BLOCK) ring
    comb_fs,  # scratch (n_combs, 1) damping carry
    ap_buf,  # scratch (n_allpass, _ROWS, BLOCK) ring
    *,
    comb_delays,
    ap_delays,
    feedback,
    damp,
):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        comb_buf[:] = jnp.zeros_like(comb_buf)
        comb_fs[:] = jnp.zeros_like(comb_fs)
        ap_buf[:] = jnp.zeros_like(ap_buf)

    d2 = 1.0 - damp
    for si in range(SUB):  # sequential 128-sample sub-blocks
        x = x_ref[0, si, :]  # (BLOCK,)
        t_row = step * SUB + si  # current block index == write row (mod _ROWS)

        total = jnp.zeros((BLOCK,), jnp.float32)
        outs = []
        for ci, delay in enumerate(comb_delays):
            # read samples [t - delay, t - delay + BLOCK): delay is static,
            # so the lane offset is static and only the row is dynamic
            row_back = (delay + BLOCK - 1) // BLOCK
            lane_off = (-delay) % BLOCK
            out = _ring_read(comb_buf, ci, t_row - row_back + _ROWS, lane_off)
            outs.append(out)
            total = total + out
        # damping one-pole per comb: fs = Toeplitz @ (d2*out) + d1^(n+1)*fs0,
        # all combs at once as one (BLOCK, n_combs) matmul on the MXU
        outs_m = jnp.stack(outs, axis=1)  # (BLOCK, n_combs)
        fs_blocks = jnp.dot(
            toep_ref[:], outs_m * d2, preferred_element_type=jnp.float32
        ) + powv_ref[0, :][:, None] * comb_fs[:, 0][None, :]

        w_row = jax.lax.rem(t_row, jnp.int32(_ROWS))
        for ci, delay in enumerate(comb_delays):
            writes = x + fs_blocks[:, ci] * feedback
            comb_buf[ci, pl.ds(w_row, 1), :] = writes[None, :]
        comb_fs[:, 0] = fs_blocks[BLOCK - 1, :]  # (n_combs,) carry vector

        y = total
        for ai, delay in enumerate(ap_delays):
            row_back = (delay + BLOCK - 1) // BLOCK
            lane_off = (-delay) % BLOCK
            buf_out = _ring_read(ap_buf, ai, t_row - row_back + _ROWS, lane_off)
            new_in = y + 0.5 * buf_out
            y = -y + buf_out
            ap_buf[ai, pl.ds(w_row, 1), :] = new_in[None, :]

        out_ref[0, si, :] = y


@functools.partial(jax.jit, static_argnames=("sr", "feedback", "damp", "spread"))
def _freeverb_channel_pallas(mono_in: jnp.ndarray, sr: int, feedback: float,
                             damp: float, spread: int) -> jnp.ndarray:
    """(T,) pre-gained mono -> (T,) wet signal of one Freeverb channel."""
    comb_delays = _scaled([c + spread for c in COMB_TUNINGS], sr)
    ap_delays = _scaled([a + spread for a in ALLPASS_TUNINGS], sr)
    assert min(ap_delays + comb_delays) >= BLOCK, "delay shorter than the block"
    assert max(comb_delays) <= _BUF

    t = mono_in.shape[0]
    step_samples = SUB * BLOCK
    n_steps = -(-t // step_samples)
    xp = jnp.pad(mono_in.astype(jnp.float32), (0, n_steps * step_samples - t))
    xp = xp.reshape(n_steps, SUB, BLOCK)

    toep = jnp.asarray(_toeplitz_pow(damp))
    powv = jnp.broadcast_to(
        jnp.asarray(np.power(np.float64(damp), np.arange(1, BLOCK + 1)).astype(np.float32)),
        (SUB, BLOCK),
    )

    kernel = functools.partial(
        _freeverb_kernel,
        comb_delays=tuple(comb_delays),
        ap_delays=tuple(ap_delays),
        feedback=float(feedback),
        damp=float(damp),
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, SUB, BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, BLOCK), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, BLOCK), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUB, BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, SUB, BLOCK), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((len(COMB_TUNINGS), _ROWS, BLOCK), jnp.float32),
            pltpu.VMEM((len(COMB_TUNINGS), 1), jnp.float32),
            pltpu.VMEM((len(ALLPASS_TUNINGS), _ROWS, BLOCK), jnp.float32),
        ],
        interpret=_interpret(),
    )(xp, toep, powv)
    return out.reshape(-1)[:t]


def freeverb_pallas(
    audio: jnp.ndarray,
    sr: int,
    room_size: float = 0.5,
    damping: float = 0.5,
    wet_level: float = 0.33,
    dry_level: float = 0.4,
    width: float = 1.0,
) -> jnp.ndarray:
    """Drop-in for ops.reverb.freeverb via the fused kernel.  Raises if the
    sample rate makes a delay line shorter than the block (callers fall
    back to the scan implementation)."""
    x = audio
    squeeze = False
    if x.ndim == 1:
        x = x[None]
        squeeze = True
    stereo = x.shape[0] == 2

    feedback = room_size * 0.28 + 0.7
    damp = damping * 0.4
    wet = wet_level * 3.0
    dry_gain = dry_level * 2.0
    wet1 = wet * 0.5 * (1.0 + width)
    wet2 = wet * 0.5 * (1.0 - width)

    mono_in = jnp.mean(x, axis=0) * 0.015
    out_l = _freeverb_channel_pallas(mono_in, sr, feedback, damp, 0)
    if stereo:
        out_r = _freeverb_channel_pallas(mono_in, sr, feedback, damp, STEREO_SPREAD)
        left = out_l * wet1 + out_r * wet2 + x[0] * dry_gain
        right = out_r * wet1 + out_l * wet2 + x[1] * dry_gain
        result = jnp.stack([left, right])
    else:
        result = (out_l * (wet1 + wet2) + x[0] * dry_gain)[None]
    return result[0] if squeeze else result
