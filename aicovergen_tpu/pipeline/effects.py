"""Post-processing & mixdown (pedalboard/sox/pydub equivalents, on device).

  * add_audio_effects: HighpassFilter -> Compressor(4:1, -15 dB) -> Reverb
    (reference src/main.py:206-226) — one fused device pass instead of the
    reference's 1-second streamed chunks.
  * pitch_shift_all: phase-vocoder semitone shift (reference main.py:138-147).
  * combine_audio: gain-staged overlay with the reference's built-in
    -4/-6/-7 dB staging (reference main.py:229-233).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.dynamics import compressor, highpass_1st_order
from ..ops.pitchshift import pitch_shift
from ..ops.reverb import freeverb


@functools.partial(
    jax.jit, static_argnames=("sr", "wet1", "wet2", "dry_gain", "stereo")
)
def _effects_chain_fused(x, H, sr: int, wet1: float, wet2: float,
                         dry_gain: float, stereo: bool):
    """hpf -> compressor -> partitioned freeverb as ONE device program.

    The unfused chain is 3+ separately-jitted dispatches; on a remote-TPU
    tunnel each dispatch costs a host round-trip, which dominated the
    steady-state effects stage (~1.1 s measured vs ~0.3 s of compute).
    Fusing also lets XLA overlap the scan stages with the reverb FFTs."""
    from ..ops.reverb import freeverb_os_core

    x = highpass_1st_order(x, sr)
    x = compressor(x, sr, threshold_db=-15.0, ratio=4.0)
    return freeverb_os_core(x, H, wet1, wet2, dry_gain, stereo)


def add_audio_effects_device(
    audio: jnp.ndarray,
    sr: int,
    reverb_rm_size: float = 0.15,
    reverb_wet: float = 0.2,
    reverb_dry: float = 0.8,
    reverb_damping: float = 0.7,
) -> jnp.ndarray:
    """(C, T) device float -> processed (C, T), fully in HBM."""
    global _FFT_REVERB_BROKEN, _FFT_CHAIN_PROVEN
    x = audio.astype(jnp.float32)
    if os.environ.get("AICG_REVERB", "fft") == "fft" and not _FFT_REVERB_BROKEN:
        from ..ops.reverb import freeverb_fft_plan

        stereo = x.shape[0] == 2
        H, wet1, wet2, dry_gain = freeverb_fft_plan(
            sr, stereo, room_size=reverb_rm_size, damping=reverb_damping,
            wet_level=reverb_wet, dry_level=reverb_dry,
        )
        try:
            out = _effects_chain_fused(
                x, jnp.asarray(H), sr, wet1, wet2, dry_gain, stereo
            )
            # block on the FIRST chain of each program (programs are per
            # length-class/sr/layout): backend errors surface lazily and
            # must trigger the unfused fallback below, not kill the cover
            # at the next fetch.  Once a program is proven, dispatch async
            # so the chain pipelines with the mixdown stages.
            key = (x.shape, x.dtype.name, sr)
            if key not in _FFT_CHAIN_PROVEN:
                out = jax.block_until_ready(out)
                _FFT_CHAIN_PROVEN.add(key)
            return out
        except Exception as e:  # pragma: no cover - backend-specific
            _FFT_REVERB_BROKEN = True
            print(f"[effects] fused fft effects chain failed on this backend "
                  f"({e}); falling back to the scan reverb for this process")
    x = highpass_1st_order(x, sr)
    x = compressor(x, sr, threshold_db=-15.0, ratio=4.0)
    x = _reverb(
        x,
        sr,
        room_size=reverb_rm_size,
        damping=reverb_damping,
        wet_level=reverb_wet,
        dry_level=reverb_dry,
    )
    return x


def add_audio_effects(
    audio: np.ndarray,
    sr: int,
    reverb_rm_size: float = 0.15,
    reverb_wet: float = 0.2,
    reverb_dry: float = 0.8,
    reverb_damping: float = 0.7,
) -> np.ndarray:
    """(C, T) float -> processed (C, T)."""
    x = add_audio_effects_device(
        jnp.asarray(audio, jnp.float32), sr,
        reverb_rm_size, reverb_wet, reverb_dry, reverb_damping,
    )
    return np.asarray(x, np.float32)


# latched True after the fft path dies on this backend so every later cover
# in the process skips straight to the scan fallback
_FFT_REVERB_BROKEN = False

# latched True after the fused fft chain SUCCEEDS once on this backend:
# later covers skip the defensive block_until_ready, so the effects stage
# dispatches asynchronously and pipelines with the mixdown/encode stages
# (the block existed only to route backend errors into the scan fallback —
# once one full-size chain has executed, the program is known-good and a
# sync would serialize ~0.3 s of host round-trip per cover on a remote
# tunnel for nothing)
_FFT_CHAIN_PROVEN: set = set()


def _reverb(x, sr: int, **kwargs):
    """Freeverb dispatch (AICG_REVERB=fft|scan|pallas, default fft).

    fft — the network is LTI, so the wet path is applied exactly as a
    bounded-FFT partitioned convolution (ops/reverb.py freeverb_fft — every
    FFT is 2^17 points regardless of song length) instead of a
    ~T/min(delay)-step sequential scan.  Agrees with the scan path to fp32
    noise (tested).  If the backend still rejects it at runtime the scan
    path takes over for the rest of the process — the default path can never
    hard-fail a cover.

    scan — the blockwise-scan reference implementation (parity baseline).

    pallas — fused VMEM-resident kernel (ops/reverb_pallas.py); needs every
    delay line > the 128-sample kernel block (sr >= ~25 kHz).  Measured ~1.25x
    slower than the scan path on v5e (the serial comb->allpass chain is
    latency-bound); kept for reference."""
    global _FFT_REVERB_BROKEN
    mode = os.environ.get("AICG_REVERB", "fft")
    if mode == "pallas":
        try:
            from ..ops.reverb_pallas import HAVE_PALLAS, freeverb_pallas

            if HAVE_PALLAS and sr >= 25000:
                return freeverb_pallas(x, sr, **kwargs)
            print(
                "[effects] pallas freeverb needs Pallas support and sr >= "
                f"25 kHz (have pallas={HAVE_PALLAS}, sr={sr}); using fft path"
            )
        except Exception as e:  # pragma: no cover - backend-specific
            print(f"[effects] pallas freeverb unavailable ({e}); using fft path")
    if mode != "scan" and not _FFT_REVERB_BROKEN:
        import jax

        from ..ops.reverb import freeverb_fft

        try:
            # block before returning: XLA raises backend errors lazily at
            # materialization, which would escape this try and kill the cover
            return jax.block_until_ready(freeverb_fft(x, sr, **kwargs))
        except Exception as e:  # pragma: no cover - backend-specific
            _FFT_REVERB_BROKEN = True
            print(f"[effects] fft freeverb failed on this backend ({e}); "
                  "falling back to the scan path for this process")
    return freeverb(x, sr, **kwargs)


def pitch_shift_all(audio: np.ndarray, sr: int, semitones: float) -> np.ndarray:
    return np.asarray(pitch_shift(jnp.asarray(audio, jnp.float32), sr, semitones), np.float32)


def _db_gain(db: float) -> float:
    return 10.0 ** (db / 20.0)


def to_stereo_device(x: jnp.ndarray) -> jnp.ndarray:
    """(C, T) or (T,) device audio -> (2, T)."""
    if x.ndim == 1:
        x = x[None, :]
    if x.shape[0] == 1:
        return jnp.repeat(x, 2, axis=0)
    return x[:2]


def quantize_int16(x: jnp.ndarray) -> jnp.ndarray:
    """Device float [-1, 1] -> int16 with write_wav's PCM-16 rounding, so a
    device-quantized download is byte-identical to a float download written
    through io.audio.write_wav."""
    return jnp.clip(jnp.round(x * 32767.0), -32768, 32767).astype(jnp.int16)


def combine_audio_device(
    main_vocals: jnp.ndarray,
    backup_vocals: jnp.ndarray,
    instrumentals: jnp.ndarray,
    main_gain_db: float = 0.0,
    backup_gain_db: float = 0.0,
    inst_gain_db: float = 0.0,
) -> jnp.ndarray:
    """Device-resident combine_audio: (2, T) stems -> (2, T_main) float mix.
    Same gain staging/length contract as combine_audio; stems stay in HBM so
    only the final mix crosses the host boundary."""
    length = main_vocals.shape[-1]

    def prep(x, gain_db):
        g = _db_gain(gain_db)
        if x.shape[-1] < length:
            x = jnp.pad(x, ((0, 0), (0, length - x.shape[-1])))
        return x[..., :length] * g

    return (
        prep(main_vocals.astype(jnp.float32), -4 + main_gain_db)
        + prep(backup_vocals.astype(jnp.float32), -6 + backup_gain_db)
        + prep(instrumentals.astype(jnp.float32), -7 + inst_gain_db)
    )


def combine_audio(
    main_vocals: np.ndarray,
    backup_vocals: np.ndarray,
    instrumentals: np.ndarray,
    main_gain_db: float = 0.0,
    backup_gain_db: float = 0.0,
    inst_gain_db: float = 0.0,
) -> np.ndarray:
    """Overlay with the reference gain staging: main -4 dB, backup -6 dB,
    instrumental -7 dB plus user offsets (reference main.py:229-233).
    All inputs (C, T) at the same sr; output trimmed/padded to the longest
    (pydub overlay keeps the base segment's length — the main vocal)."""
    length = main_vocals.shape[-1]

    def prep(x, gain_db):
        g = _db_gain(gain_db)
        if x.shape[-1] < length:
            x = np.pad(x, ((0, 0), (0, length - x.shape[-1])))
        return x[..., :length] * g

    mix = (
        prep(main_vocals, -4 + main_gain_db)
        + prep(backup_vocals, -6 + backup_gain_db)
        + prep(instrumentals, -7 + inst_gain_db)
    )
    return mix.astype(np.float32)
