"""Runtime configuration for the TPU cover pipeline.

Replaces the reference's ``Config`` class (reference src/rvc.py:20-95), which
sniffed NVIDIA GPU names and VRAM to pick fp16 and VC segmentation windows
(and self-rewrote its own config files on 16xx GPUs — intentionally not
reproduced).  On TPU we have plentiful HBM, so the default is the largest
("6G"-tier) segmentation config; everything is overridable.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """VC segmentation + precision settings.

    x_pad/x_query/x_center/x_max are in seconds and keep the exact semantics
    of reference src/rvc.py:76-95 / src/vc_infer_pipeline.py:63-80:
      * x_pad    — reflect padding added to both ends of each VC segment
      * x_query  — half-width of the minimum-energy split-point search window
      * x_center — spacing between candidate split points
      * x_max    — audio shorter than this is converted in one piece
    """

    x_pad: int = 3
    x_query: int = 10
    x_center: int = 60
    x_max: int = 65
    # bfloat16 is the TPU-native reduced precision (MXU-friendly); the
    # reference used fp16 on CUDA (src/rvc.py:29-75).
    use_bf16: bool = True
    # Static-shape bucketing granularity (samples at 16 kHz) for jit caches.
    # 8 s granularity: the minimum-energy split search shifts segment
    # lengths by a few seconds between songs, and every distinct bucket is
    # a fresh compile — coarse buckets make songs share programs.
    bucket_samples: int = 128000
    # Devices used for data-parallel chunk batching; None = all.
    num_devices: int | None = None
    # "model"-axis width of the serving mesh (tensor parallelism of the
    # HuBERT / text-encoder matmuls for single-song latency); devices are
    # arranged (data = n/model_parallel, model = model_parallel).
    model_parallel: int = 1

    @property
    def compute_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.use_bf16 else jnp.float32


def len_bucket_s() -> int:
    """Seconds per whole-track length class: effects / mixdown / RMVPE /
    hpf-split / VC-output padding all round the track up to a multiple of
    this, so different songs share every compiled device program.  32 s
    default (a 4-min song = 8 classes max per program family).

    AICG_LEN_BUCKET_S exists for compile-budget-bound hosts: the multichip
    dryrun sets 4 s so XLA:CPU compiles of production-shaped programs fit
    the driver window (the program STRUCTURE is unchanged — only the padded
    lengths shrink)."""
    return max(1, int(os.environ.get("AICG_LEN_BUCKET_S", "32")))


def warmup_classes(raw) -> object:
    """Parse a warmup length-class spec ("240", "240,120", 240.0, or an
    iterable) into what CoverPipeline.warmup accepts: a float for one class,
    a tuple for several, 0.0 for an empty/blank spec (= skip warmup).  One
    shared parser so the webui and the Predictor can't drift."""
    if isinstance(raw, (int, float)):
        return float(raw)
    if isinstance(raw, (list, tuple)):
        vals = tuple(float(v) for v in raw)
    else:
        vals = tuple(float(s) for s in str(raw).split(",") if s.strip())
    if not vals:
        return 0.0
    return vals[0] if len(vals) == 1 else vals


def stem_cache_mode(default: str = "sync") -> str:
    """Stem-cache write policy (AICG_STEM_CACHE): how the WAV cache files
    (original, separation stems, converted vocals) reach disk.

      sync   — (default; serving entry points pass default="behind")
               every cache file is downloaded and written before
               song_cover returns: the reference's file contract
               (reference src/main.py:166-203 writes each stage's WAV before
               the next starts).
      behind — cache files are written by a pipeline-level background writer
               AFTER the cover returns; the user-visible latency excludes
               the ~60-130 MB of device->host cache downloads that dominate
               a remote-tunnel critical path.  Re-covering the same song
               joins that song's pending writes first, so the cache-hit
               contract still holds.  Serving front ends (webui with
               workers, Predictor) default to this.
      off    — cache files are neither downloaded nor written (stateless
               serving hosts); every cover re-separates.
    """
    mode = os.environ.get("AICG_STEM_CACHE", default).lower()
    if mode not in ("sync", "behind", "off"):
        raise ValueError(f"AICG_STEM_CACHE must be sync|behind|off, got {mode!r}")
    return mode


def cache_fetch_chunk_s() -> float:
    """Slice length (seconds) for background cache-stem downloads.  Bulk
    device->host transfers on one tunnel stream head-of-line-block the next
    critical-path fetch behind up to ~21 MB; slicing bounds that wait to one
    slice (~5 MB at the 30 s default) at the cost of one fixed per-transfer
    latency (~0.3 s measured) per extra slice — paid on the background
    writer thread, not the cover's critical path.  0 disables slicing."""
    return float(os.environ.get("AICG_CACHE_FETCH_CHUNK_S", "30"))


def default_config() -> RuntimeConfig:
    """Defaults tuned for TPU HBM; every knob is overridable via env for
    constrained hosts (AICG_X_PAD/X_QUERY/X_CENTER/X_MAX/BUCKET)."""
    env = os.environ.get
    return RuntimeConfig(
        x_pad=int(env("AICG_X_PAD", 3)),
        x_query=int(env("AICG_X_QUERY", 10)),
        x_center=int(env("AICG_X_CENTER", 60)),
        x_max=int(env("AICG_X_MAX", 65)),
        use_bf16=env("AICG_TPU_BF16", "1") != "0",
        bucket_samples=int(env("AICG_BUCKET", 128000)),
        num_devices=int(env("AICG_NUM_DEVICES", 0)) or None,
        model_parallel=max(1, int(env("AICG_MODEL_PARALLEL", 1))),
    )
