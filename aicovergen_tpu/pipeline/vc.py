"""The voice-conversion pipeline: HuBERT -> retrieval blend -> f0 -> synthesizer.

Behavioral port of VC.pipeline / VC.vc (reference src/vc_infer_pipeline.py:
372-653), redesigned for XLA:

  * the data-dependent minimum-energy split-point search stays on host
    (it is O(n) numpy), but segments are padded to static *buckets* so every
    device stage runs under a cached jit — no per-length recompiles;
  * HuBERT, retrieval blending and the synthesizer run back-to-back on
    device; the f0 track is computed once for the whole padded signal
    (rmvpe on device);
  * bucket zero-padding is masked inside HuBERT/enc_p attention and all
    conv leakage lands inside the discarded t_pad trim zone, so outputs
    match the reference's unpadded per-segment computation.

Segment layout contract (vc_infer_pipeline.py:474-653): reflect-pad t_pad
both sides, split at opt_ts (energy minima snapped to the 160-sample frame
grid), convert each [s, t + 2*t_pad + window) span, trim t_pad_tgt samples
from both ends of each converted span, concatenate.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import lru_cache, partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hubert import conv_output_frames, hubert_features
from ..models.rvc import RVCConfig, synthesizer_infer
from ..ops.envelope import mix_rms_envelope
from ..ops.filters import butter_highpass, zero_phase_fft
from ..ops.resample import resample
from ..retrieval.knn import Retriever
from ..utils.config import RuntimeConfig, len_bucket_s
from ..utils.metrics import Metrics, stage_sync
from ..utils.precision import tree_dtype
from .f0 import WINDOW, F0Estimator, get_f0

SR = 16000


def find_split_points(audio: np.ndarray, cfg: RuntimeConfig) -> List[int]:
    """Minimum-|moving-sum| split points every x_center seconds
    (reference vc_infer_pipeline.py:516-528)."""
    t_max = SR * cfg.x_max
    t_center = SR * cfg.x_center
    t_query = SR * cfg.x_query
    if audio.shape[0] + WINDOW <= t_max:
        return []
    pad = np.pad(audio, (WINDOW // 2, WINDOW // 2), mode="reflect")
    csum = np.cumsum(np.concatenate([[0.0], pad]))
    audio_sum = csum[WINDOW:] - csum[:-WINDOW]  # moving sum, len == len(audio)+1
    audio_sum = audio_sum[: audio.shape[0]]
    opt_ts = []
    for t in range(t_center, audio.shape[0], t_center):
        window_abs = np.abs(audio_sum[t - t_query : t + t_query])
        opt_ts.append(t - t_query + int(np.argmin(window_abs)))
    return opt_ts


def _n_split_centers(n_true: int, cfg: RuntimeConfig) -> int:
    """Number of split-point search centers find_split_points would visit."""
    if n_true + WINDOW <= SR * cfg.x_max:
        return 0
    return max(0, (n_true - 1) // (SR * cfg.x_center))


@partial(jax.jit, static_argnames=("n_centers", "t_center", "t_query"))
def _split_windows_pack(hpf_b, f0_dev, n_centers: int, t_center: int, t_query: int):
    """Gather the split-point search windows — samples
    ``hpf[t - t_query - 80 : t + t_query + 80]`` around every center
    ``t = (k+1)*t_center`` — and pack them with the raw device f0 track
    (when given) into ONE flat f32 array, i.e. ONE device->host fetch.

    Replaces the full-track f32 download the host split search used to
    block on (VERDICT r03 item 3): for a 120 s song the fetch shrinks from
    ~7.7 MB to ~1.3 MB per center-minute, and the f0 download stops being
    its own host round trip (~0.3 s fixed latency each on the session
    tunnel).  The host finishes the search exactly
    (`_split_points_from_windows`)."""
    half = WINDOW // 2
    wlen = 2 * t_query + WINDOW
    lo = (jnp.arange(n_centers, dtype=jnp.int32) + 1) * t_center - t_query - half
    idx = jnp.clip(
        lo[:, None] + jnp.arange(wlen, dtype=jnp.int32)[None, :], 0, hpf_b.shape[0] - 1
    )
    flat = jnp.take(hpf_b, idx, axis=0).astype(jnp.float32).ravel()
    if f0_dev is not None:
        flat = jnp.concatenate([flat, f0_dev.astype(jnp.float32)])
    return flat


def _split_points_from_windows(
    windows: np.ndarray, n_true: int, cfg: RuntimeConfig
) -> List[int]:
    """find_split_points (reference vc_infer_pipeline.py:516-528) from the
    gathered windows: same f64 moving sum, same reflect padding at the
    signal tail, same argmin — identical split points without the
    whole-track download (up to f64 rounding: the local cumsum accumulates
    ~1e-16-relative differently than the global one, which can only matter
    on exact argmin ties).  ``windows[k]`` holds hpf samples
    ``[lo_k, lo_k + wlen)`` with ``lo_k = (k+1)*t_center - t_query - 80``;
    entries at global index >= n_true are invalid and replaced by the same
    reflect extension np.pad(audio, 80, "reflect") would produce."""
    t_center = SR * cfg.x_center
    t_query = SR * cfg.x_query
    half = WINDOW // 2
    wlen = 2 * t_query + WINDOW
    opt_ts: List[int] = []
    for k in range(windows.shape[0]):
        t = (k + 1) * t_center
        lo = t - t_query - half
        w = windows[k].astype(np.float64)
        n_local = n_true - lo  # valid entries (the rest were clip-gathered)
        if n_local < wlen:
            w = np.concatenate(
                [w[:n_local], w[n_local - 2 - np.arange(wlen - n_local)]]
            )
        csum = np.cumsum(np.concatenate([[0.0], w]))
        i0 = t - t_query
        i1 = min(t + t_query, n_true)
        ms = csum[WINDOW : WINDOW + (i1 - i0)] - csum[: i1 - i0]
        opt_ts.append(i0 + int(np.argmin(np.abs(ms))))
    return opt_ts


@partial(jax.jit, static_argnames=("nb",))
def _gather_segments(src, starts, valid, nb: int):
    """Slice the (zero-padded) device signal into a (rows, nb) segment batch.

    Replaces the host-side batch assembly + its ~20 MB upload: the padded
    signal is already in HBM, so each row is one dynamic_slice; samples at or
    beyond each row's true length are zeroed, exactly like the host version
    zero-filled its buffer."""

    def one(s):
        return jax.lax.dynamic_slice(src, (s,), (nb,))

    seg = jax.vmap(one)(starts)
    return jnp.where(jnp.arange(nb)[None, :] < valid[:, None], seg, 0.0)


@partial(jax.jit, static_argnames=("out_len", "trim"))
def _assemble_output(audio, keep, starts, out_len: int, trim: int):
    """Synth rows (S, L) -> one (out_len,) track: row i contributes
    audio[i, trim : trim + keep[i]] at output offset starts[i] (zeros
    elsewhere; rows with keep 0 contribute nothing).

    This is the reference's per-segment [t_pad_tgt:-t_pad_tgt] trim +
    concatenation (vc_infer_pipeline.py:584, 638) with traced offsets and a
    bucketed static output length: segment lengths depend on the energy-
    minimum split points, i.e. on song CONTENT, so shape-carrying host-side
    slices would remote-compile fresh programs for every song (~4 s/cover
    measured on the session backend).

    The row loop is a lax.scan, not a Python loop: an unrolled loop of
    row-count dynamic slices compiles fine single-device but sent the SPMD
    partitioner quadratic under a device mesh (463 s to compile the 8-device
    variant of the 6 s dryrun cover vs 1.1 s unsharded; scan compiles the
    body once).  Sharded runs use `_assemble_sharded` instead — scanning a
    row-SHARDED axis forces a collective per step."""
    return _assemble_core(audio, keep, starts, out_len, trim)


def _assemble_core(audio, keep, starts, out_len: int, trim: int, init=None):
    j = jnp.arange(out_len)

    def body(acc, row_keep_start):
        row, k, s = row_keep_start
        rowp = jnp.pad(row, (out_len, out_len))
        shifted = jax.lax.dynamic_slice(rowp, (out_len + trim - s,), (out_len,))
        return acc + jnp.where((j >= s) & (j < s + k), shifted, 0), None

    if init is None:
        init = jnp.zeros((out_len,), audio.dtype)
    out, _ = jax.lax.scan(body, init, (audio, keep, starts))
    return out


@lru_cache(maxsize=32)
def _assemble_sharded(mesh, out_len: int, trim: int):
    """Mesh variant of _assemble_output: every device scan-assembles its OWN
    synth rows into a local (out_len,) partial track (segments don't overlap,
    so row contributions just add), then ONE psum over the "data" axis merges
    them — local elementwise work + a single out_len-float collective on the
    ICI, instead of the per-scan-step reshard the partitioner emits when one
    device scans a row-sharded array."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(audio, keep, starts):
        # the scan carry must be typed as VARYING over "data" (each shard
        # accumulates different rows); a plain zeros init is unvarying and
        # shard_map rejects the carry-type mismatch
        init = jax.lax.pcast(
            jnp.zeros((out_len,), audio.dtype), ("data",), to="varying"
        )
        return jax.lax.psum(
            _assemble_core(audio, keep, starts, out_len, trim, init=init), "data"
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P("data", None), P("data"), P("data")),
            out_specs=P(),
        )
    )


@partial(jax.jit, static_argnames=("version",))
def _features_stage(hubert_params, audio_seg, valid_samples, version: str):
    """(S, L) padded audio batch -> (S, F, C) HuBERT features (padding-masked).
    Audio is cast to the parameters' compute dtype (bf16 when enabled)."""
    dtype = tree_dtype(hubert_params)
    return hubert_features(
        hubert_params, audio_seg.astype(dtype), version=version, valid_samples=valid_samples
    )


@partial(jax.jit, static_argnames=("cfg", "use_f0", "zero_noise"))
def _synth_stage(
    synth_params,
    feats,
    feats0,
    p_len,
    pitch,
    pitchf,
    sid,
    protect,
    cfg: RVCConfig,
    use_f0: bool,
    rng,
    zero_noise: bool = False,
):
    """Protect blend + .infer (reference vc_infer_pipeline.py:433-465).
    All inputs carry a leading segment-batch axis S; returns (S, T_out) fp32.

    Noise is drawn per row from fold_in(rng, row): row i's draw is identical
    no matter how many filler rows pad the batch, so sharded / unsharded /
    re-bucketed runs produce bit-identical segments.

    `zero_noise` (AICG_ZERO_NOISE=1) suppresses the z_p and harmonic-source
    noise draws — the deterministic mode the reference-parity harness uses
    to compare against the torch pipeline with rand/randn patched to zero."""
    dtype = tree_dtype(synth_params)
    feats = jnp.repeat(feats.astype(dtype), 2, axis=1)  # 2x nearest time upsample (:433)
    if use_f0:
        feats0 = jnp.repeat(feats0.astype(dtype), 2, axis=1)
        pitchff = jnp.where(pitchf < 1.0, protect, 1.0)[:, :, None].astype(dtype)
        protected = feats * pitchff + feats0 * (1.0 - pitchff)
        feats = jnp.where(protect < 0.5, protected, feats)

    rows, t2 = feats.shape[0], feats.shape[1]

    def row_noise(i):
        k1, k2 = jax.random.split(jax.random.fold_in(rng, i))
        return (
            jax.random.normal(k1, (cfg.inter_channels, t2), dtype),
            jax.random.normal(k2, (t2 * cfg.upp, 1), jnp.float32),
        )

    if zero_noise:
        zp_noise = jnp.zeros((rows, cfg.inter_channels, t2), dtype)
        sine_noise = jnp.zeros((rows, t2 * cfg.upp, 1), jnp.float32)
    else:
        zp_noise, sine_noise = jax.vmap(row_noise)(jnp.arange(rows))
    audio = synthesizer_infer(
        synth_params,
        cfg,
        feats,
        p_len,
        pitch if use_f0 else None,
        pitchf if use_f0 else None,
        sid,
        zp_noise=zp_noise,
        sine_noise=sine_noise,
        # windowed NSF decoder: the compiled program (and its hundreds-of-MB
        # serialized executable) stays independent of the segment length
        dec_window_frames=256,
    )
    return audio[:, 0].astype(jnp.float32)


@dataclass
class VoiceConverter:
    """One loaded RVC voice: synthesizer + HuBERT + f0 estimator (+ index)."""

    synth_params: dict
    synth_cfg: RVCConfig
    hubert_params: dict
    f0_estimator: F0Estimator
    retriever: Optional[Retriever] = None
    runtime: RuntimeConfig = RuntimeConfig()
    # data-parallel hooks (parallel.mesh.make_chunk_sharder): places the
    # segment batch across the mesh "data" axis; data_parallel is the axis
    # width so the batch pads to a shardable row count
    shard: Optional[object] = None
    data_parallel: int = 1

    def __post_init__(self):
        self._hp_b, self._hp_a = butter_highpass(5, 48, SR)

    @property
    def tgt_sr(self) -> int:
        return self.synth_cfg.sr

    def _bucket_len(self, n: int) -> int:
        b = self.runtime.bucket_samples
        return int(math.ceil(n / b) * b)

    def _max_segment_bucket(self) -> int:
        """Fixed bucket for split songs: consecutive minimum-energy split
        points are at most x_center + 2*x_query apart, plus the 2*x_pad
        reflect pads and the search window — so every multi-segment song
        shares ONE compiled program regardless of where its splits land."""
        rt = self.runtime
        max_span = SR * (rt.x_center + 2 * rt.x_query + 2 * rt.x_pad) + WINDOW
        return self._align_frames(self._bucket_len(max_span))

    @staticmethod
    def _align_frames(nb: int) -> int:
        """Bump the segment bucket until the HuBERT frame count is a
        multiple of 64 — the encoder sequence (2 frames per HuBERT frame)
        is then 128-aligned, unlocking the blocked band path in
        models/attention.py (and tile-aligned attention shapes generally).
        Costs at most ~63 extra frames (~1.3 s) of masked padding."""
        while conv_output_frames(nb) % 64:
            nb += WINDOW * 2  # +320 samples -> +1 conv frame
        return nb

    def _batch_rows(self, n_rows: int) -> int:
        """Pad the segment count to a power of two so the jit cache sees a
        handful of batch shapes instead of one per song length; under data
        parallelism the rows must also divide evenly across the mesh."""
        rows = 1 << max(0, (n_rows - 1).bit_length())
        if self.data_parallel > 1:
            rows = int(np.lcm(rows, self.data_parallel))
        return rows

    def _convert_segments(
        self,
        audio_pad: jnp.ndarray,
        spans: List[Tuple[int, int]],
        pitches: List[Optional[np.ndarray]],
        pitchfs: List[Optional[np.ndarray]],
        sid: int,
        index_rate: float,
        protect: float,
        rng,
        trim: int = 0,
        metrics: Optional[Metrics] = None,
        as_numpy: bool = True,
    ):
        """All padded spans of one song -> converted audio per span
        (full spans, untrimmed).  `audio_pad` is the reflect-padded DEVICE
        signal; spans index into it.

        The reference converts segments one at a time in a host loop
        (vc_infer_pipeline.py:567-637); here they form one (S, bucket)
        batch — gathered in HBM, no host round-trip — so HuBERT + retrieval
        + the synthesizer each run as a single large device program
        (SURVEY §2.2: segments are a leading batch dimension that
        parallel.mesh can shard)."""
        n_true = [b - a for a, b in spans]
        if len(spans) > 1:
            nb = self._max_segment_bucket()
        else:
            nb = self._align_frames(self._bucket_len(n_true[0]))
        rows = self._batch_rows(len(spans))
        # filler rows duplicate row 0 (cheap, NaN-safe); their outputs are
        # discarded and row noise is fold_in-keyed so they change nothing
        starts = np.full((rows,), spans[0][0], np.int64)
        valid = np.full((rows,), n_true[0], np.int64)
        starts[: len(spans)] = [a for a, _ in spans]
        valid[: len(spans)] = n_true

        # true usable frames: the reference's p_len = min(samples//window,
        # 2*hubert_frames) (vc_infer_pipeline.py:439-444) — computed from the
        # unpadded length, not the bucket
        p_len_true = [min(n // WINDOW, conv_output_frames(n) * 2) for n in n_true]
        p_len_pad = conv_output_frames(nb) * 2
        p_len_arr = np.full((rows,), p_len_true[0], np.int64)
        p_len_arr[: len(spans)] = p_len_true
        sid_arr = np.full((rows,), sid, np.int64)
        use_f0 = self.synth_cfg.if_f0

        # output assembly geometry (device path): row i contributes
        # keep[i] = p_len*upp - 2*trim samples at offset out_starts[i]
        upp = self.synth_cfg.upp
        keep = np.zeros((rows,), np.int64)
        keep[: len(spans)] = [max(p * upp - 2 * trim, 0) for p in p_len_true]
        out_starts = np.zeros((rows,), np.int64)
        out_starts[1:] = np.cumsum(keep)[:-1]
        total = int(keep.sum())

        metrics = metrics or Metrics()
        # Small host arrays travel as TWO packed uploads: each separate
        # jnp.asarray costs a serialized ~40 ms round trip on a remote-TPU
        # tunnel, so starts/valid/p_len/sid/protect/keep/out_starts ride one
        # int32 row bundle and pitch/pitchf one (2, rows, P) bundle; pieces
        # are sliced on device.  int32 (not f32): starts/out_starts are
        # sample offsets that cross 2^24 after ~6 min of audio at tgt_sr and
        # would silently round to even in f32, shifting segment joins by
        # 1-2 samples.  `protect` is the one float — it rides bit-cast so
        # the bundle stays exact end to end.
        if int(starts.max()) >= 2**31 or total >= 2**31:
            raise ValueError("audio too long: sample offsets exceed int32")
        protect_bits = np.float32(protect).view(np.int32)
        meta = np.stack([
            starts, valid, p_len_arr, sid_arr,
            np.full((rows,), protect_bits, np.int64),
            keep, out_starts,
        ]).astype(np.int32)
        meta_j = jnp.asarray(meta)
        starts_j = meta_j[0]
        valid_j = meta_j[1]
        p_len_j = meta_j[2]
        sid_j = meta_j[3]
        protect_j = jax.lax.bitcast_convert_type(meta_j[4, 0], jnp.float32)
        keep_j = meta_j[5]
        out_starts_j = meta_j[6]
        if use_f0:
            bundle = np.zeros((2, rows, p_len_pad), np.float32)
            for i, (pl, pc, pf) in enumerate(zip(p_len_true, pitches, pitchfs)):
                m = min(pl, len(pc))
                bundle[0, i, :m] = pc[:m]
                bundle[1, i, :m] = pf[:m]
            bundle_j = jnp.asarray(bundle)
            pitch_j = bundle_j[0].astype(jnp.int32)
            pitchf_j = bundle_j[1]
            if self.shard is not None:
                pitch_j = self.shard(pitch_j)
                pitchf_j = self.shard(pitchf_j)
        else:
            pitch_j = pitchf_j = None

        # zero-pad the source to a bucketed length + nb so every row slice is
        # in bounds and the program is shared across a 32 s length class
        with metrics.stage("vc/gather"):
            src_len = audio_pad.shape[-1]
            src_target = self._bucket_len(src_len) + nb
            src = jnp.pad(audio_pad.astype(jnp.float32), (0, src_target - src_len))
            batch_j = _gather_segments(src, starts_j, valid_j, nb)
            if self.shard is not None:
                batch_j = self.shard(batch_j)
                valid_j = self.shard(valid_j)
            stage_sync(batch_j)
        with metrics.stage("vc/hubert"):
            if os.environ.get("AICG_DEBUG_SHAPES"):
                print(f"[vc] hubert batch {batch_j.shape} {batch_j.dtype} "
                      f"feats_dtype {tree_dtype(self.hubert_params)}", flush=True)
            feats = _features_stage(
                self.hubert_params, batch_j, valid_j, self.synth_cfg.version
            )
            stage_sync(feats[..., 0])
        feats0 = feats
        if self.retriever is not None and index_rate > 0:
            with metrics.stage("vc/retrieval"):
                s_, f_, c_ = feats.shape
                feats = self.retriever.blend(feats.reshape(s_ * f_, c_), index_rate).reshape(
                    s_, f_, c_
                )

        with metrics.stage("vc/synth"):
            audio = _synth_stage(
                self.synth_params,
                feats,
                feats0,
                p_len_j,
                pitch_j,
                pitchf_j,
                sid_j,
                protect_j,
                self.synth_cfg,
                use_f0,
                rng,
                zero_noise=os.environ.get("AICG_ZERO_NOISE", "0") == "1",
            )
            # attribution sync (AICG_STAGE_SYNC only): without it the NSF
            # decode lands in whichever later stage first blocks
            stage_sync(audio)
            if as_numpy:
                audio = np.asarray(audio, np.float32)
        if as_numpy:
            return [audio[i, : p_len_true[i] * upp] for i in range(len(spans))], total
        # device path: trim + concat in one bucketed program (per-song slice
        # shapes would remote-compile fresh per cover); stays padded to the
        # 32 s class until the host boundary
        with metrics.stage("vc/assemble"):
            out_len = int(math.ceil(max(total, 1) / (self.tgt_sr * len_bucket_s()))) * self.tgt_sr * len_bucket_s()
            mesh = getattr(self.shard, "mesh", None) if self.shard is not None else None
            if mesh is not None:
                out = _assemble_sharded(mesh, out_len, trim)(
                    audio, keep_j, out_starts_j
                )
            else:
                out = _assemble_output(audio, keep_j, out_starts_j, out_len, trim)
            stage_sync(out)
        return out, total

    def convert(
        self,
        audio: np.ndarray,
        f0_up_key: float = 0,
        f0_method: str = "rmvpe",
        index_rate: float = 0.5,
        filter_radius: int = 3,
        rms_mix_rate: float = 0.25,
        protect: float = 0.33,
        crepe_hop_length: int = 128,
        resample_sr: int = 0,
        sid: int = 0,
        inp_f0: Optional[np.ndarray] = None,
        seed: int = 0,
        metrics: Optional[Metrics] = None,
        output: str = "int16",
    ) -> Tuple[np.ndarray, int]:
        """16 kHz mono float audio -> (int16 audio, output sr).

        Mirrors VC.pipeline (reference vc_infer_pipeline.py:474-653).

        output="device_int16" keeps the post chain (trim/concat via the
        bucketed assemble program, RMS-envelope mix, resample, int16
        normalize) in HBM and returns (device_int16_padded_to_32s_class,
        sr, true_length) — the cover pipeline feeds it straight into the
        effects/mixdown
        programs and downloads it once, in the background, for the WAV cache.
        """
        metrics = metrics or Metrics()
        rt = self.runtime
        t_pad = SR * rt.x_pad
        t_pad_tgt = self.tgt_sr * rt.x_pad
        t_pad2 = t_pad * 2

        # Device-resident front end: high-pass, f0 (rmvpe) and the segment
        # gather all read the signal in HBM; the ONLY download is the f32
        # track the host-side split-point search needs (non-device f0
        # methods pull their own host copy inside F0Estimator.compute).
        # Whole-signal stages bucket to 32 s classes: one compiled program
        # per length class, not per song length.
        with metrics.stage("vc/hpf_split"):
            audio_dev = (
                audio
                if isinstance(audio, jnp.ndarray)
                else jnp.asarray(np.asarray(audio, np.float32))
            ).astype(jnp.float32)
            n_true = audio_dev.shape[-1]
            hpf_b = zero_phase_fft(
                self._hp_b,
                self._hp_a,
                jnp.pad(audio_dev, (0, (-n_true) % (SR * len_bucket_s()))),
            )
            audio_trim = hpf_b[:n_true]
            audio_pad = jnp.pad(audio_trim, (t_pad, t_pad), mode="reflect")
            p_len = audio_pad.shape[0] // WINDOW

            # Device-resident front end: the raw f0 track (device-side
            # methods) is dispatched BEFORE any download, then the split
            # search pulls only the ±x_query windows around each center —
            # packed with the f0 track into ONE fetch — instead of the whole
            # f32 track.  The host finishes the search bit-identically.
            # Host-side f0 methods (crepe/pm/harvest/dio) need the full
            # signal on host anyway, so they keep the whole-track download.
            raw_f0 = None
            f0_dev = (
                self.f0_estimator.compute_device(audio_pad, f0_method)
                if self.synth_cfg.if_f0
                else None
            )
            windowed_ok = SR * rt.x_center > SR * rt.x_query + WINDOW // 2
            if windowed_ok and (f0_dev is not None or not self.synth_cfg.if_f0):
                n_c = _n_split_centers(n_true, rt)
                if n_c > 0:
                    import time as _time

                    _t0 = _time.perf_counter()
                    flat = np.asarray(
                        _split_windows_pack(
                            hpf_b, f0_dev, n_c, SR * rt.x_center, SR * rt.x_query
                        )
                    )
                    metrics.xfer(
                        "d2h_crit", flat.nbytes, _time.perf_counter() - _t0
                    )
                    wlen = 2 * SR * rt.x_query + WINDOW
                    opt_ts = _split_points_from_windows(
                        flat[: n_c * wlen].reshape(n_c, wlen), n_true, rt
                    )
                    if f0_dev is not None:
                        raw_f0 = flat[n_c * wlen :]
                else:
                    opt_ts = []
                    if f0_dev is not None:
                        raw_f0 = np.asarray(f0_dev)
                        metrics.xfer("d2h_crit", raw_f0.nbytes)
            else:
                # whole-track download, f32 over the wire (the device value
                # IS f32 — an f64 fetch doubles the bytes for zero extra
                # information; the host search upcasts so its cumsum
                # accumulates in f64 as before)
                opt_ts = find_split_points(
                    np.asarray(audio_trim).astype(np.float64), rt
                )

        pitch = pitchf = None
        if self.synth_cfg.if_f0:
            with metrics.stage("vc/f0"):
                coarse, f0bak = get_f0(
                    self.f0_estimator,
                    audio_pad,
                    p_len,
                    f0_up_key,
                    f0_method,
                    filter_radius,
                    crepe_hop_length,
                    inp_f0,
                    x_pad=rt.x_pad,
                    raw_f0=raw_f0,
                )
            pitch = coarse[:p_len]
            pitchf = f0bak[:p_len].astype(np.float32)

        rng = jax.random.PRNGKey(seed)
        spans = []
        s = 0
        for t in opt_ts:
            t = t // WINDOW * WINDOW
            spans.append((s, t + t_pad2 + WINDOW))
            s = t
        spans.append((s, audio_pad.shape[0]))

        seg_pitch = [
            pitch[a // WINDOW : b // WINDOW] if pitch is not None else None for a, b in spans
        ]
        seg_pitchf = [
            pitchf[a // WINDOW : b // WINDOW] if pitchf is not None else None for a, b in spans
        ]
        device_out = output == "device_int16"
        converted, n_out = self._convert_segments(
            audio_pad, spans, seg_pitch, seg_pitchf, sid, index_rate, protect, rng,
            trim=t_pad_tgt, metrics=metrics, as_numpy=not device_out,
        )
        if device_out:
            audio_opt = converted  # (bucket,) device f32, true length n_out
        else:
            audio_opt = np.concatenate([c[t_pad_tgt:-t_pad_tgt] for c in converted])

        with metrics.stage("vc/post"):
            if rms_mix_rate != 1:
                if device_out:
                    out_b = audio_opt  # already padded to the 32 s class
                else:
                    out_b, n_out = _pad_bucket_any(audio_opt, self.tgt_sr * len_bucket_s())
                src_b = _align_rms_source(
                    audio_trim, n_true, out_b.shape[-1], self.tgt_sr
                )
                audio_opt = mix_rms_envelope(
                    src_b, SR, jnp.asarray(out_b), self.tgt_sr, rms_mix_rate
                )
                if not device_out:
                    audio_opt = np.asarray(audio_opt[:n_out])
            out_sr = self.tgt_sr
            if resample_sr >= SR and self.tgt_sr != resample_sr:
                out_sr = resample_sr
                if device_out:
                    out_b = audio_opt
                else:
                    out_b, n_out = _pad_bucket_any(audio_opt, self.tgt_sr * len_bucket_s())
                audio_opt = resample(jnp.asarray(out_b), self.tgt_sr, resample_sr)
                n_out = int(round(n_out * resample_sr / self.tgt_sr))
                if not device_out:
                    audio_opt = np.asarray(audio_opt[:n_out])

            # int16 normalization (vc_infer_pipeline.py:645-649); on the
            # device path the max-compare happens in HBM — no scalar crosses
            # to host, and the track stays padded to its 32 s class (the
            # caller slices to the true length n_out at the host boundary)
            if device_out:
                audio_opt = jnp.asarray(audio_opt, jnp.float32)
                audio_max = jnp.max(jnp.abs(audio_opt)) / 0.99
                scale = jnp.where(audio_max > 1, 32768.0 / audio_max, 32768.0)
                q16 = (audio_opt * scale).astype(jnp.int16)
                stage_sync(q16)  # attribution sync (AICG_STAGE_SYNC only)
                return q16, out_sr, n_out
            audio_max = np.abs(audio_opt).max() / 0.99
            max_int16 = 32768.0
            if audio_max > 1:
                max_int16 /= audio_max
            return (audio_opt * max_int16).astype(np.int16), out_sr


def _align_rms_source(audio_trim, n_true: int, out_b_len: int, tgt_sr: int):
    """Pad-or-slice the 16 kHz source so its padded seconds equal the
    converted track's padded seconds before mix_rms_envelope.

    The envelope mix stretches the source rms track onto the converted grid
    by *proportion of padded length*, so both must span the same seconds.
    The converted track is intrinsically a hair shorter than the source
    (per-segment frame trims), so near a 32 s class boundary the two can
    land in different classes — stretching the source envelope (incl. its
    zero pad) onto the shorter grid would time-compress the gain track and
    near-silence the tail (reference change_rms operates on true lengths,
    vc_infer_pipeline.py:529-541)."""
    src_len = (out_b_len // (tgt_sr * len_bucket_s())) * SR * len_bucket_s()
    if n_true >= src_len:
        return audio_trim[:src_len]
    return jnp.pad(audio_trim, (0, src_len - n_true))


def _pad_bucket_any(x, bucket: int):
    """pad_to_bucket for numpy or device arrays (constant mode)."""
    n = x.shape[-1]
    target = int(math.ceil(n / bucket) * bucket) if n else bucket
    if isinstance(x, jnp.ndarray):
        return jnp.pad(x, (0, target - n)), n
    return np.pad(x, (0, target - n)), n
