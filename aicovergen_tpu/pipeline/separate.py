"""MDX-Net source separation, TPU-style.

Behavioral contract from the reference (src/mdx.py):
  * stereo audio is cut into chunks of ``hop * (dim_t - 1)`` samples with
    ``n_fft//2`` edge trims and zero padding (pad_wave, mdx.py:143-171);
  * each chunk: STFT -> 4-channel real/imag spectrogram truncated to dim_f
    (mdx.py:37-43) -> conv-TDF net -> iSTFT (mdx.py:45-54);
  * optional denoise trick: out = 0.5*(-model(-x) + model(x)) (mdx.py:261-263);
  * peak-normalize in, restore peak out (mdx.py:259-267);
  * the complementary stem is reconstructed as
    ``-primary*compensation + input`` (mdx.py:280).

The TPU redesign replaces the reference's 2-thread chunk loop with one
batched, jitted chunk pipeline: all chunks form a leading batch dimension
that `parallel.mesh` can shard across devices; STFT -> net -> iSTFT fuse into
a single XLA program so spectra never leave HBM.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import stft, istft, hann_window


def spec_pack(x: jnp.ndarray, n_fft: int, hop: int, window: jnp.ndarray, dim_f: int):
    """(B, 2, chunk) waveform -> (B, 4, dim_f, dim_t) real/imag spectrogram.

    Channel packing order [L_re, L_im, R_re, R_im] matches MDXModel.stft
    (reference src/mdx.py:37-43).
    """
    b = x.shape[0]
    chunk = x.shape[-1]
    spec = stft(x.reshape(-1, chunk), n_fft, hop, window)  # (B*2, bins, T) complex
    ri = jnp.stack([spec.real, spec.imag], axis=1)  # (B*2, 2, bins, T)
    ri = ri.reshape(b, 4, spec.shape[-2], spec.shape[-1])
    return ri[:, :, :dim_f]


def spec_unpack(x: jnp.ndarray, n_fft: int, hop: int, window: jnp.ndarray, chunk: int):
    """(B, 4, dim_f, dim_t) -> (B, 2, chunk); zero-pads truncated bins
    (MDXModel.istft, reference src/mdx.py:45-54)."""
    b, _, dim_f, dim_t = x.shape
    n_bins = n_fft // 2 + 1
    x = jnp.pad(x, ((0, 0), (0, 0), (0, n_bins - dim_f), (0, 0)))
    x = x.reshape(b * 2, 2, n_bins, dim_t)
    spec = jax.lax.complex(x[:, 0], x[:, 1])
    y = istft(spec, n_fft, hop, window, length=chunk)
    return y.reshape(b, 2, chunk)


@dataclass(frozen=True)
class MDXParams:
    """Registry hyperparameters of one MDX checkpoint
    (mdxnet_models/model_data.json schema)."""

    dim_f: int
    dim_t: int  # actual frames (registry stores log2)
    n_fft: int
    hop: int = 1024
    stem_name: Optional[str] = None
    compensation: float = 1.0

    @property
    def chunk_size(self) -> int:
        return self.hop * (self.dim_t - 1)

    @property
    def trim(self) -> int:
        return self.n_fft // 2


# complement-stem naming (reference src/mdx.py:16)
STEM_NAMING = {
    "Vocals": "Instrumental",
    "Other": "Instruments",
    "Instrumental": "Vocals",
    "Drums": "Drumless",
    "Bass": "Bassless",
}


def chunk_wave(wave: np.ndarray, params: MDXParams) -> tuple[np.ndarray, int]:
    """Host-side: (2, n) -> (num_chunks, 2, chunk_size) with the pad_wave
    layout (reference src/mdx.py:143-171).  Returns (chunks, pad)."""
    n_sample = wave.shape[1]
    trim = params.trim
    gen_size = params.chunk_size - 2 * trim
    pad = gen_size - n_sample % gen_size
    wave_p = np.concatenate(
        [np.zeros((2, trim), wave.dtype), wave, np.zeros((2, pad + trim), wave.dtype)], axis=1
    )
    starts = np.arange(0, n_sample + pad, gen_size)
    chunks = np.stack([wave_p[:, s : s + params.chunk_size] for s in starts])
    return chunks.astype(np.float32), pad


def chunk_wave_device(wave: jnp.ndarray, params: MDXParams) -> tuple[jnp.ndarray, int]:
    """Device-side chunk_wave: keeps intermediate stems in HBM when
    separations chain (the reference round-trips WAV files between stages,
    src/main.py:166-190; here audio never leaves the device)."""
    n_sample = wave.shape[1]
    trim = params.trim
    gen_size = params.chunk_size - 2 * trim
    pad = gen_size - n_sample % gen_size
    wave_p = jnp.pad(wave, ((0, 0), (trim, pad + trim)))
    n_chunks = (n_sample + pad) // gen_size
    # index generated on device (iota): as a host array it would be a ~22 MB
    # upload per separation stage over a remote-TPU tunnel
    idx = (
        jnp.arange(n_chunks, dtype=jnp.int32)[:, None] * gen_size
        + jnp.arange(params.chunk_size, dtype=jnp.int32)[None, :]
    )  # (C, chunk)
    return jnp.take(wave_p, idx, axis=1).swapaxes(0, 1), pad


def join_chunks(out_chunks, params: MDXParams, n_sample: int):
    """(num_chunks, 2, chunk_size) -> (2, n_sample): trim edges, concat,
    drop padding (reference src/mdx.py:195-197).  Works on numpy or jnp."""
    trim = params.trim
    body = out_chunks[:, :, trim:-trim]  # (C, 2, gen_size)
    joined = body.transpose(1, 0, 2).reshape(2, -1)
    return joined[:, :n_sample]


def make_chunk_runner(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    params: MDXParams,
    batch_size: int = 8,
    shard: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    compute_dtype=None,
):
    """Build a jitted (batch, 2, chunk)->(batch, 2, chunk) stage:
    STFT -> model -> iSTFT fused into one XLA program.

    The runner is cached on `model_fn` itself: repeated separations with the
    same model reuse the jitted programs AND the device-resident weights.
    Without this every call re-traces two jax.jit wrappers (fresh function
    objects -> cold jit cache -> a multi-second executable load even when the
    persistent compile cache hits) and re-uploads the cast weights
    (~60 MB/model over a remote-TPU tunnel) — measured at 2-8 s per stage.

    `shard` optionally places the batch across a device mesh
    (see parallel.mesh.shard_batch).  If model_fn is an OnnxExecutor its
    weights are passed as jit arguments (never baked into the HLO).

    `compute_dtype` (e.g. bf16) applies to the conv net only: the STFT/iSTFT
    pair stays fp32 (XLA FFTs are fp32) and the net's in/out spectrograms are
    cast at the boundary — the reference's fp16 ORT session played the same
    role (src/mdx.py:74-77).
    """
    key = (params, batch_size, str(compute_dtype), id(shard))
    try:
        cache = model_fn.__dict__.setdefault("_aicg_runners", {})
        if key in cache:
            return cache[key][0]
    except AttributeError:  # callables without a __dict__
        cache = None
    runner = _build_chunk_runner(model_fn, params, batch_size, shard, compute_dtype)
    if cache is not None:
        # keep a strong reference to the shard object in the entry: the key
        # uses id(shard), and a recycled address after GC must not resolve a
        # stale runner closed over a different sharding
        cache[key] = (runner, shard)
    return runner


def _build_chunk_runner(model_fn, params, batch_size, shard, compute_dtype):
    window = hann_window(params.n_fft)  # concrete numpy; constant under jit
    weights = getattr(model_fn, "weights", None)
    if weights is not None:
        if compute_dtype is not None:
            # casts the executor's static biases too — one dtype graph-wide
            weights = model_fn.cast(compute_dtype)
        weights = jax.device_put(weights)

    # with reduced-precision compute, audio also crosses the host<->device
    # boundary as f16: halves the bytes through a remote-TPU tunnel, and the
    # ~1e-4 waveform quantization sits far below the separation targets
    transfer_dtype = np.float16 if compute_dtype is not None else np.float32

    def net(call, spec):
        if compute_dtype is None:
            return call(spec)
        return call(spec.astype(compute_dtype)).astype(jnp.float32)

    @jax.jit
    def run_batch_w(w, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.float32)  # f32 on device: XLA FFTs are fp32
        spec = spec_pack(x, params.n_fft, params.hop, window, params.dim_f)
        out = net(lambda s: model_fn.apply(w, s), spec)
        y = spec_unpack(out, params.n_fft, params.hop, window, params.chunk_size)
        return y.astype(transfer_dtype)

    @jax.jit
    def run_batch_plain(x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        spec = spec_pack(x, params.n_fft, params.hop, window, params.dim_f)
        out = net(model_fn, spec)
        y = spec_unpack(out, params.n_fft, params.hop, window, params.chunk_size)
        return y.astype(transfer_dtype)

    # Denoise — 0.5 * (model(x) - model(-x)), reference src/mdx.py:261-263.
    # The STFT and iSTFT are linear, so the +/-x pair shares ONE spectrogram:
    # negate it for the second net pass and combine IN THE SPECTRAL DOMAIN
    # before a single iSTFT — half the FFT work of transforming both
    # waveforms.  The net still sees a (2*rows, ...) batch = the same MXU
    # shapes as the plain program when rows = batch_size // 2.
    def _denoise_body(call, x):
        x = x.astype(jnp.float32)
        spec = spec_pack(x, params.n_fft, params.hop, window, params.dim_f)
        out = net(call, jnp.concatenate([spec, -spec], axis=0))
        rows = x.shape[0]
        o = 0.5 * (out[:rows] - out[rows:])
        y = spec_unpack(o, params.n_fft, params.hop, window, params.chunk_size)
        return y.astype(transfer_dtype)

    @jax.jit
    def run_batch_dn_w(w, x: jnp.ndarray) -> jnp.ndarray:
        return _denoise_body(lambda s: model_fn.apply(w, s), x)

    @jax.jit
    def run_batch_dn_plain(x: jnp.ndarray) -> jnp.ndarray:
        return _denoise_body(model_fn, x)

    def run_batch(x, denoise=False):
        if weights is not None:
            return run_batch_dn_w(weights, x) if denoise else run_batch_w(weights, x)
        return run_batch_dn_plain(x) if denoise else run_batch_plain(x)

    def run(chunks, denoise: bool = False, return_device: bool = False,
            return_inputs: bool = False):
        """chunks: (C, 2, chunk) numpy (host path, f16 over the wire) or jnp
        (device-resident path: no boundary crossing at all).  Returns the
        same kind it was given, unless return_device forces jnp outputs for
        a host input (the streamed-upload path: each batch's f16 upload is
        dispatched asynchronously and rides under the previous batch's net
        compute).  return_inputs additionally returns the uploaded input
        chunks as a device array (for on-device wave reconstruction)."""
        on_device = isinstance(chunks, jnp.ndarray)
        xnp = jnp if on_device else np
        n = chunks.shape[0]
        stream = chunks
        # denoise dispatches `group` chunks whose net batch is 2*group rows —
        # the same row count per executable as the plain path (sharded runs
        # keep group = batch_size so the doubled net batch still divides the
        # data axis evenly)
        if denoise:
            group = batch_size if shard is not None else max(batch_size // 2, 1)
        else:
            group = batch_size
        pad_n = (-n) % group
        if pad_n:
            # NOT zeros_like(stream[:pad_n]) — that caps the filler at n rows
            # and under-pads whenever pad_n > n (short songs), breaking the
            # one-program-shape contract / sharded divisibility
            pad = xnp.zeros((pad_n,) + stream.shape[1:], dtype=stream.dtype)
            stream = xnp.concatenate([stream, pad], axis=0)
        # dispatch every batch first (jax async dispatch overlaps the
        # host<->device transfers and compute across batches), then gather
        pending = []
        pending_in = []
        if not on_device:
            stream = stream.astype(transfer_dtype)
        for i in range(0, stream.shape[0], group):
            xb = jnp.asarray(stream[i : i + group])
            if shard is not None:
                xb = shard(xb)
            if return_inputs:
                pending_in.append(xb)
            pending.append(run_batch(xb, denoise=denoise))
        out = jnp.concatenate(pending, axis=0)[:n]
        if on_device or return_device:
            out = out.astype(jnp.float32)
        else:
            out = np.asarray(out, dtype=np.float32)
        if return_inputs:
            ins = jnp.concatenate(pending_in, axis=0)[:n].astype(jnp.float32)
            return out, ins
        return out

    return run


def separate(
    wave: np.ndarray,
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    params: MDXParams,
    denoise: bool = True,
    batch_size: int = 8,
    shard=None,
    compute_dtype=None,
    device_out: bool = False,
):
    """Full separation of (2, n) float audio.

    Returns (primary_stem, complement_stem) where
    complement = -primary*compensation + input (reference src/mdx.py:280).

    A jnp input keeps the whole computation (chunking, net, join,
    complement) on device and returns jnp stems — chained separations
    never cross the host boundary (the reference round-trips WAV files
    between its three stages).

    A numpy input with device_out=True is the STREAMED-UPLOAD entry (the
    cover pipeline's first stage): the song crosses the boundary as per-batch
    f16 chunk uploads that overlap the previous batch's net compute instead
    of one blocking whole-song transfer (~0.4 s serial on a remote-TPU
    tunnel for a 120 s song), and the wave itself is reconstructed ON DEVICE
    from the uploaded chunk bodies for the complement — the chunk tiling is
    exact, so the reconstruction is bit-identical to the uploaded samples.
    Returns device stems like the jnp path.
    """
    if isinstance(wave, jnp.ndarray):
        wave = wave.astype(jnp.float32)
        peak = jnp.maximum(jnp.max(jnp.abs(wave)), 1e-12)
        chunks, _pad = chunk_wave_device(wave / peak, params)
    else:
        wave = np.asarray(wave, np.float32)
        peak = max(float(wave.max()), abs(float(wave.min()))) or 1.0
        chunks, _pad = chunk_wave(wave / peak, params)
    runner = make_chunk_runner(
        model_fn, params, batch_size=batch_size, shard=shard, compute_dtype=compute_dtype
    )
    if device_out and not isinstance(wave, jnp.ndarray):
        out_chunks, in_chunks = runner(
            chunks, denoise=denoise, return_device=True, return_inputs=True
        )
        primary = join_chunks(out_chunks, params, wave.shape[1]) * peak
        wave_dev = join_chunks(in_chunks, params, wave.shape[1]) * peak
        complement = -primary * params.compensation + wave_dev
        return primary, complement
    out_chunks = runner(chunks, denoise=denoise)
    primary = join_chunks(out_chunks, params, wave.shape[1]) * peak
    complement = -primary * params.compensation + wave
    return primary, complement
