"""Benchmark: end-to-end AI-cover pipeline real-time factor on one chip.

Measures the complete product path (BASELINE config-2/4 shape) on a 4-minute
synthetic song: 3-stage MDX separation with conv-TDF U-Nets at the real UVR
checkpoint dimensions (Voc_FT-class: dim_f 3072, dim_t 256, n_fft 7680, via
the ONNX frontend + fused STFT->net->iSTFT chunk batching), RVC voice
conversion (HuBERT-base + RMVPE f0 + v2 synthesizer, batched bucketed
segments, bf16 compute), effects (Freeverb/compressor/high-pass) and the
gain-staged mixdown.  Weights are synthetic (fixture/random) — numerics are
identical to trained weights for throughput purposes.

Baseline: the reference publishes no numbers; its qualitative statement is
"less than a few minutes" for a full ~4-minute cover on a consumer GPU
(reference README.md:152), i.e. roughly 2x realtime end-to-end.  We use
RTF=2.0 as the vs_baseline denominator.  (The BASELINE.md north star is a
4-minute cover < 15 s on a v4-8, i.e. RTF 16 across 8 chips.)

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline", "stages"}.
Env knobs: AICG_BENCH=cover|vc (default cover), AICG_BENCH_REPS,
AICG_BENCH_SECONDS, AICG_TPU_BF16=0 for fp32, AICG_PROFILE=<dir> for traces,
AICG_STAGE_SYNC=1 for honest per-stage breakdowns (serializes the stages'
dispatch/compute overlap, so the headline wall time rises slightly).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
FIXTURES = os.path.join(REPO, "tests", "fixtures")
BENCH_ASSETS = os.path.join(REPO, ".bench_assets")

BASELINE_RTF = 2.0
# Canonical D2H bandwidth for the *_normalized fields: the tunnel's D2H
# swings 14-44 MB/s between windows, so raw walls conflate code progress
# with window luck.  Each run's critical-path D2H bytes (Metrics transfer
# ledger) are re-costed from the probed to this pinned bandwidth:
#   wall_norm = wall - d2h_mb / probed_mbps + d2h_mb / CANON_D2H_MBPS
# 40 MB/s = the BENCH_r04 window, so normalized round-over-round deltas are
# code deltas.  Method note: docs/PERFORMANCE.md "Bandwidth normalization".
CANON_D2H_MBPS = float(os.environ.get("AICG_CANON_D2H_MBPS", 40.0))


def _norm_wall(wall: float, report: dict, probed_mbps: float,
               include_cache: bool) -> tuple[float, float]:
    """(normalized wall, d2h_mb used).

    Critical-path fetches (d2h_crit) are blocking, so their full byte count
    re-costs from probed to canonical bandwidth.  Sync-posture cache
    downloads (include_cache) ride the writer thread and only extend the
    wall by the part compute did NOT hide — measured directly as the
    host_io/flush wait — so only that EXPOSED time re-costs (counting all
    cache bytes as serial would credit the sync number for transfers that
    cost the wall nothing; observed: 74 MB fully hidden, flush=0.0 s)."""
    tr = report.get("transfers", {})
    mb = tr.get("d2h_crit", {}).get("mb", 0.0)
    if probed_mbps <= 0:
        return wall, mb
    w = wall - mb / probed_mbps + mb / CANON_D2H_MBPS
    if include_cache:
        flush_s = report.get("stages", {}).get("host_io/flush", {}).get("seconds", 0.0)
        exposed_mb = flush_s * probed_mbps
        mb += exposed_mb
        w = w - flush_s + exposed_mb / CANON_D2H_MBPS
    return w, mb


def _load_flat(npz_path, drop_prefixes=()):
    data = np.load(npz_path)
    flat = {k[3:]: data[k] for k in data.files if k.startswith("sd:")}
    return {
        k: v
        for k, v in flat.items()
        if not any(k.startswith(p) for p in drop_prefixes)
        and not k.endswith("num_batches_tracked")
    }


def _build_assets() -> str:
    """Assemble a persistent on-disk asset store: conv-TDF replica ONNX nets
    at real UVR dims + fixture-weight voice/HuBERT/RMVPE checkpoints."""
    from aicovergen_tpu.io.assets import AssetStore
    from aicovergen_tpu.models.conv_tdf import ConvTDFSpec, build_conv_tdf_onnx

    store = AssetStore(BENCH_ASSETS)
    tiny = os.environ.get("AICG_BENCH_MDX_SCALE") == "tiny"  # CPU smoke mode
    tiny_vc = os.environ.get("AICG_BENCH_VC_SCALE") == "tiny"
    stamp = os.path.join(
        BENCH_ASSETS,
        ".complete_v3" + ("_tiny" if tiny else "") + ("_tinyvc" if tiny_vc else ""),
    )
    if os.path.exists(stamp):
        return BENCH_ASSETS
    shutil.rmtree(BENCH_ASSETS, ignore_errors=True)
    os.makedirs(store.mdx_models_dir, exist_ok=True)
    os.makedirs(store.rvc_models_dir, exist_ok=True)

    # 3 separation models at their registry dims (model_data.json classes)
    if tiny:
        mdx_specs = {
            name: (
                dict(dim_f=256, dim_t_log2=5, n_fft=1024, compensate=comp, primary_stem=stem),
                ConvTDFSpec(dim_f=256, dim_t=32, g=4, n_scales=3, tfc=1),
            )
            for name, comp, stem in (
                ("UVR-MDX-NET-Voc_FT.onnx", 1.021, "Vocals"),
                ("UVR_MDXNET_KARA_2.onnx", 1.025, "Vocals"),
                ("Reverb_HQ_By_FoxJoy.onnx", 1.0, "Reverb"),
            )
        }
    else:
        mdx_specs = {
            "UVR-MDX-NET-Voc_FT.onnx": (
                dict(dim_f=3072, dim_t_log2=8, n_fft=7680, compensate=1.021, primary_stem="Vocals"),
                ConvTDFSpec(dim_f=3072, dim_t=256, g=32, n_scales=5, tfc=2),
            ),
            "UVR_MDXNET_KARA_2.onnx": (
                dict(dim_f=2048, dim_t_log2=8, n_fft=5120, compensate=1.025, primary_stem="Vocals"),
                ConvTDFSpec(dim_f=2048, dim_t=256, g=32, n_scales=5, tfc=2),
            ),
            "Reverb_HQ_By_FoxJoy.onnx": (
                dict(dim_f=3072, dim_t_log2=9, n_fft=7680, compensate=1.0, primary_stem="Reverb"),
                ConvTDFSpec(dim_f=3072, dim_t=512, g=32, n_scales=5, tfc=2),
            ),
        }
    for i, (name, (meta, spec)) in enumerate(mdx_specs.items()):
        path = store.mdx_model_path(name)
        build_conv_tdf_onnx(path, spec, seed=i)
        with open(os.path.splitext(path)[0] + ".json", "w") as f:
            json.dump(meta, f)

    import torch

    voice_dir = os.path.join(store.rvc_models_dir, "BenchVoice")
    os.makedirs(voice_dir, exist_ok=True)
    if tiny_vc:
        # AICG_BENCH_VC_SCALE=tiny: architecture-faithful but layer/width-
        # reduced voice stack for compile-bound CPU harnesses (the multichip
        # dryrun, length-class tests).  Every CODE PATH is the production one
        # (v2+f0 synthesizer, HuBERT v2 final-tap features, rmvpe mel->unet->
        # gru->decode); only depths/widths shrink.  Perf numbers from this
        # scale are meaningless — bench.py refuses it (see main()).
        from aicovergen_tpu.models.rvc import RVCConfig
        from aicovergen_tpu.models.rvc_train import init_synthesizer_params
        from aicovergen_tpu.train.checkpoint import save_rvc_pth

        tiny_cfg = RVCConfig(
            spec_channels=1025, segment_size=32, inter_channels=64,
            hidden_channels=64, filter_channels=128, n_heads=2, n_layers=2,
            kernel_size=3, p_dropout=0.0, resblock="1",
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
            upsample_rates=(10, 10, 2, 2), upsample_initial_channel=64,
            upsample_kernel_sizes=(16, 16, 4, 4), spk_embed_dim=109,
            gin_channels=64, sr=40000, version="v2", if_f0=True,
        )
        save_rvc_pth(
            os.path.join(voice_dir, "BenchVoice.pth"),
            init_synthesizer_params(tiny_cfg, seed=0), tiny_cfg,
        )
        hubert = {
            k: v
            for k, v in _load_flat(os.path.join(FIXTURES, "hubert_base.npz")).items()
            if not (k.startswith("encoder.layers.")
                    and int(k.split(".")[2]) >= 2)  # keep layers 0-1 of 12
        }
        rmvpe = _load_flat(os.path.join(FIXTURES, "rmvpe_tiny.npz"))
    else:
        synth = _load_flat(os.path.join(FIXTURES, "rvc_synth_v2f0.npz"))
        cpt = {
            "config": [1025, 32, 192, 192, 768, 2, 6, 3, 0, "1",
                       [3, 7, 11], [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
                       [10, 10, 2, 2], 512, [16, 16, 4, 4], 109, 256, 40000],
            "weight": {k: torch.from_numpy(v) for k, v in synth.items()},
            "f0": 1,
            "version": "v2",
        }
        torch.save(cpt, os.path.join(voice_dir, "BenchVoice.pth"))
        hubert = _load_flat(os.path.join(FIXTURES, "hubert_base.npz"))
        rmvpe = _load_flat(os.path.join(FIXTURES, "rmvpe_e2e.npz"))

    torch.save({k: torch.from_numpy(v) for k, v in hubert.items()}, store.hubert_path())
    torch.save({k: torch.from_numpy(v) for k, v in rmvpe.items()}, store.rmvpe_path())
    with open(stamp, "w") as f:
        f.write("ok")
    return BENCH_ASSETS


def _make_song(path: str, seconds: float, seed: int) -> None:
    from aicovergen_tpu.io.audio import write_wav

    sr = 44100
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    melody = 0.3 * np.sin(2 * np.pi * (220 + 30 * np.sin(2 * np.pi * 0.5 * t)) * t)
    chords = sum(0.1 * np.sin(2 * np.pi * f * t) for f in (110.0, 165.0, 220.0))
    noise = 0.01 * rng.standard_normal(t.shape[0])
    wave = np.stack([melody + chords + noise, melody - chords + noise]).astype(np.float32)
    write_wav(path, wave, sr)


_PIPELINE = None


def _get_pipeline():
    """One CoverPipeline per bench process: the cover bench and the
    piggybacked throughput bench share jit caches, loaded voice/MDX trees
    and the device mesh (a second pipeline would re-pay the checkpoint load
    + parameter upload, ~30 s on a remote tunnel)."""
    global _PIPELINE
    if _PIPELINE is None:
        from aicovergen_tpu.io.assets import AssetStore
        from aicovergen_tpu.pipeline.cover import CoverPipeline

        _PIPELINE = CoverPipeline(store=AssetStore(_build_assets()))
    return _PIPELINE


def _tunnel_probe(mb: int = 16) -> dict:
    """Measure the host<->device link's current bandwidth (MB/s each way).
    On the remote-TPU tunnel this 'weather' swings ~5x between sessions
    (measured 5-40 MB/s D2H) and a cover moves 60-190 MB, so every number in
    this bench is only interpretable next to the link speed it ran under."""
    import jax.numpy as jnp

    n = mb * 1024 * 1024 // 4
    x = (jnp.ones((n,), jnp.float32) * 0.5).block_until_ready()
    t0 = time.time()
    np.asarray(x)
    d2h = mb / max(time.time() - t0, 1e-9)
    h = np.full((n,), 0.25, np.float32)
    t0 = time.time()
    jnp.asarray(h).block_until_ready()
    h2d = mb / max(time.time() - t0, 1e-9)
    out = {"d2h_mbps": round(d2h, 1), "h2d_mbps": round(h2d, 1)}
    print(f"[bench] tunnel probe ({mb} MB): D2H {d2h:.1f} MB/s, "
          f"H2D {h2d:.1f} MB/s", file=sys.stderr)
    return out


def bench_cover(reps: int, seconds: float) -> dict:
    from aicovergen_tpu.utils.metrics import Metrics

    base = _build_assets()
    pipeline = _get_pipeline()
    store = pipeline.store

    def run(seed, run_seconds, sync: bool = False, cache_mode: str = None):
        """One cover; returns (wall_s, cache_drain_s, metrics).  cache_mode
        overrides AICG_STEM_CACHE for this run ('behind' = the serving
        posture: the wall excludes deferred cache downloads, which are then
        drained and timed separately)."""
        song = os.path.join(base, f"bench_song_{seed}.wav")
        _make_song(song, run_seconds, seed)
        # no stage-cache short-circuits (incl. leftovers of killed runs)
        shutil.rmtree(os.path.join(store.output_dir), ignore_errors=True)
        metrics = Metrics()
        prev = {
            k: os.environ.get(k) for k in ("AICG_STAGE_SYNC", "AICG_STEM_CACHE")
        }
        if sync:
            os.environ["AICG_STAGE_SYNC"] = "1"
        if cache_mode:
            os.environ["AICG_STEM_CACHE"] = cache_mode
        t0 = time.time()
        try:
            pipeline.song_cover(
                song, "BenchVoice", pitch_change=0, index_rate=0.0,
                output_format="wav", metrics=metrics,
            )
        finally:
            for k, v in prev.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        wall = time.time() - t0
        t1 = time.time()
        pipeline.drain_cache()
        drain = time.time() - t1
        shutil.rmtree(os.path.join(store.output_dir), ignore_errors=True)
        os.remove(song)
        return wall, drain, metrics

    # the first sync of a fresh process can absorb minutes of backend
    # init / stale-lease wait on the remote-TPU tunnel (measured 70-770 s,
    # unrelated to this code) — pay it before the budget clock starts
    import jax.numpy as jnp

    t0 = time.time()
    float(jnp.sum(jnp.ones((8,), jnp.float32)))
    print(f"[bench] device wake: {time.time() - t0:.1f}s", file=sys.stderr)

    # full-length warmup: compiles/loads every program (the remote-TPU
    # backend has a fixed ~1 min per-program executable-load cost per
    # process, so the warmup dominates; reps after it are steady-state).
    # The budget bounds EXTRA reps only: one steady rep (~10 s) always runs
    # after warmup, so the reported number is never the warmup pass unless
    # the warmup itself exceeds the hard cap.
    budget = float(os.environ.get("AICG_BENCH_BUDGET", 1200))
    hard_cap = float(os.environ.get("AICG_BENCH_HARD_CAP", 3000))
    t_start = time.time()
    walls, stage_reports = [], []

    wall, _, metrics = run(0, seconds)
    print(f"[bench] warmup (incl. compile): {wall:.1f}s", file=sys.stderr)
    warmup_report = metrics.report()
    tunnel = _tunnel_probe()

    rep = 0
    while rep < reps and (
        rep == 0  # always take one steady-state rep
        or time.time() - t_start + (walls[-1] if walls else 60) < budget
    ):
        if rep == 0 and time.time() - t_start > hard_cap:
            break
        wall, _, metrics = run(rep + 1, seconds)
        walls.append(wall)
        stage_reports.append(metrics.report())
        print(f"[bench] rep {rep + 1}: {wall:.2f}s  rtf={seconds / wall:.2f}", file=sys.stderr)
        rep += 1

    if walls:
        best = int(np.argmin(walls))
        best_wall, best_report = walls[best], stage_reports[best]
        steady = True
    else:  # hard cap exhausted during warmup — report the warmup pass itself
        best_wall, best_report = wall, warmup_report
        steady = False
    rtf = seconds / best_wall
    stages = {name: entry["seconds"] for name, entry in best_report["stages"].items()}
    result = {
        "metric": f"cover_rtf_{int(seconds)}s",
        "value": round(rtf, 3),
        "unit": "audio_s_per_s",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
        "stages": stages,
        "stages_synced": False,
        "steady_state": steady,
        "reps_wall_s": [round(w, 2) for w in walls],
        "tunnel": tunnel,
    }

    # serving posture (AICG_STEM_CACHE=behind, the webui/Predictor default):
    # user-visible cover latency excludes the deferred cache downloads, which
    # are drained and reported separately
    srv_report = None
    if steady and time.time() - t_start + best_wall * 1.5 < hard_cap:
        wall_srv, drain_srv, m_srv = run(80, seconds, cache_mode="behind")
        srv_report = m_srv.report()
        # one repeat when the window allows: a single rep is hostage to a
        # transient tunnel stall (per-rep spread measured up to 2x)
        if time.time() - t_start + wall_srv * 1.2 < hard_cap:
            w2, d2, m2 = run(81, seconds, cache_mode="behind")
            if w2 < wall_srv:
                wall_srv, drain_srv, srv_report = w2, d2, m2.report()
        print(f"[bench] serving-posture rep (cache write-behind): "
              f"{wall_srv:.2f}s  rtf={seconds / wall_srv:.2f}  "
              f"(+{drain_srv:.2f}s cache drain)", file=sys.stderr)
        result["serving_rtf"] = round(seconds / wall_srv, 3)
        result["serving_wall_s"] = round(wall_srv, 2)
        result["serving_cache_drain_s"] = round(drain_srv, 2)
        # headline = the better of the two REAL product postures: sync (CLI
        # default, cache files exist on return) vs serving (webui/Predictor
        # default, cache deferred off the user-visible path).  Both walls and
        # the drain cost stay in the JSON; "posture" says which won.
        if wall_srv < best_wall:
            result["value"] = round(seconds / wall_srv, 3)
            result["vs_baseline"] = round(result["value"] / BASELINE_RTF, 3)
            result["posture"] = "serving_write_behind"
            result["sync_rtf"] = round(rtf, 3)
        else:
            result["posture"] = "sync_cache"

    # Honest per-stage attribution: one rep with AICG_STAGE_SYNC=1 so each
    # stage's device compute is charged to the stage that dispatched it
    # (unsynced stages record dispatch time only and the compute lands in
    # whichever stage first blocks on a fetch — fine for the headline total,
    # useless for cross-round stage comparisons).  The headline RTF above
    # stays the unsynced best; the synced wall is reported separately.
    # cache_mode="off": with the cache on, the writer's background stem
    # downloads share the tunnel with every stage's sync fetch and inflate
    # the per-stage numbers by seconds of unrelated transfer (measured:
    # vc/hubert read 0.96 s with cache traffic vs ~0.2 s of actual compute)
    # — the synced table is pipeline anatomy, so it runs cache-free.
    if steady and time.time() - t_start + best_wall * 1.5 < hard_cap:
        wall_sync, _, metrics_sync = run(90, seconds, sync=True, cache_mode="off")
        print(f"[bench] synced rep: {wall_sync:.2f}s", file=sys.stderr)
        # transient tunnel stalls (observed: a 21 MB upload taking 10.9 s
        # mid-rep) poison the whole stage table; one retry when the synced
        # wall is wildly above the unsynced best
        if wall_sync > 2.0 * best_wall and time.time() - t_start + wall_sync < hard_cap:
            w2, _, m2 = run(95, seconds, sync=True, cache_mode="off")
            print(f"[bench] synced retry (stall suspected): {w2:.2f}s",
                  file=sys.stderr)
            if w2 < wall_sync:
                wall_sync, metrics_sync = w2, m2
        result["stages"] = {
            name: entry["seconds"]
            for name, entry in metrics_sync.report()["stages"].items()
        }
        result["stages_synced"] = True
        result["stages_cache"] = "off"  # anatomy rep runs cache-free
        result["synced_wall_s"] = round(wall_sync, 2)
        w_n, _mb = _norm_wall(
            wall_sync, metrics_sync.report(), tunnel.get("d2h_mbps", 0.0),
            include_cache=True,
        )
        result["synced_wall_s_normalized"] = round(w_n, 2)

    # The BASELINE north star: a full 4-minute cover (240 s) end to end.
    # The 240 s class shares every chunked/bucketed program with the main
    # bench; only the handful of whole-track per-class programs are new, so
    # its warmup is cheap on a warm process.  Two runs: the first pays those
    # loads, the second is steady state.
    if (
        steady
        and os.environ.get("AICG_BENCH_240", "1") != "0"
        and seconds != 240.0
        and time.time() - t_start + 8 * best_wall < hard_cap
    ):
        try:
            # first run pays the 240 s class's whole-track program loads and
            # reports the reference-faithful sync-cache wall; the steady
            # serving-posture runs carry the north-star number
            w1, _, _ = run(91, 240.0)
            w_sync, _, _ = run(92, 240.0)
            walls_240, drains_240, reports_240 = [], [], []
            for seed in (93, 94):
                w, d, m = run(seed, 240.0, cache_mode="behind")
                walls_240.append(w)
                drains_240.append(d)
                reports_240.append(m.report())
                if time.time() - t_start + w > hard_cap:
                    break
            wall_240 = min(walls_240)
            report_240 = reports_240[int(np.argmin(walls_240))]
            print(
                f"[bench] 240s cover: warm {w1:.2f}s, sync-cache {w_sync:.2f}s, "
                f"serving {'/'.join(f'{w:.2f}' for w in walls_240)}s "
                f"(+{max(drains_240):.2f}s cache drain) — north star < 15s",
                file=sys.stderr,
            )
            result["cover_240s_wall_s"] = round(wall_240, 2)
            result["cover_240s_rtf"] = round(240.0 / wall_240, 3)
            result["cover_240s_sync_wall_s"] = round(w_sync, 2)
            result["cover_240s_cache_drain_s"] = round(max(drains_240), 2)
            w_n, _mb = _norm_wall(
                wall_240, report_240, tunnel.get("d2h_mbps", 0.0),
                include_cache=False,
            )
            result["cover_240s_wall_s_normalized"] = round(w_n, 2)
            result["cover_240s_rtf_normalized"] = round(240.0 / w_n, 3)
        except Exception as e:  # pragma: no cover
            print(f"[bench] 240s add-on failed: {e}", file=sys.stderr)

    # --- bandwidth-normalized scoreboard (VERDICT r04 item 4): re-cost each
    # run's critical-path D2H bytes from the probed to the pinned canonical
    # bandwidth so round-over-round deltas are code deltas, not tunnel
    # weather.  Raw numbers stay the headline; *_normalized sits beside them.
    probed = tunnel.get("d2h_mbps", 0.0)
    norm: dict = {
        "canon_d2h_mbps": CANON_D2H_MBPS,
        "probed_d2h_mbps": probed,
        "method": "wall - d2h_mb/probed + d2h_mb/canon; bytes from the "
                  "Metrics transfer ledger (d2h_crit, + d2h_cache for the "
                  "sync posture whose in-run cache downloads gate return)",
    }
    if walls:
        w_n, mb = _norm_wall(best_wall, best_report, probed, include_cache=True)
        norm["sync_d2h_mb"] = round(mb, 1)
        result["sync_rtf_normalized"] = round(seconds / w_n, 3)
    if srv_report is not None:
        w_n, mb = _norm_wall(wall_srv, srv_report, probed, include_cache=False)
        norm["serving_d2h_mb"] = round(mb, 1)
        result["serving_rtf_normalized"] = round(seconds / w_n, 3)
    candidates = [
        result.get("sync_rtf_normalized"), result.get("serving_rtf_normalized")
    ]
    candidates = [c for c in candidates if c]
    if candidates:
        result["value_normalized"] = max(candidates)
    result["normalization"] = norm
    return result


def bench_throughput(seconds: float, n_jobs: int = 4, workers=(2,),
                     deadline: float | None = None) -> dict:
    """BASELINE config 5 (per-chip slice): N concurrent covers through one
    CoverPipeline from `workers` serving threads — the webui's worker model,
    including its cache write-behind posture (AICG_STEM_CACHE=behind): the
    timed section ends when every cover file exists; the deferred cache
    downloads are then drained and timed separately.

    Fairness: tunnel bandwidth swings ~5x between sessions, so concurrency
    is judged against ONE serial cover timed in the SAME window
    (serial_rtf_in_window) — the invariant to hold is agg >= serial, not
    agg >= some other session's serial number.

    `workers` may be a single count or a sequence (AICG_BENCH_WORKERS=2,4,8):
    each count reruns the same jobs through the same warm pipeline, so one
    session locates the saturation point without recompiling/reloading.
    `deadline` (absolute time.time()) cuts the sweep early in a slow tunnel
    window — at least one point always runs."""
    import threading

    if isinstance(workers, int):
        workers = (workers,)

    base = _build_assets()
    prev_cache = os.environ.get("AICG_STEM_CACHE")
    # stateless serving posture by default: N concurrent DISTINCT covers get
    # no value from the stem cache (it only pays on re-covers of one song),
    # and writing it moves ~75 MB/cover of extra device->host traffic over
    # the same tunnel the covers' critical-path fetches ride — in a 14 MB/s
    # window that alone is ~5 s/cover of throughput floor.  The cache-keeping
    # posture is one env away (AICG_BENCH_CACHE=behind|sync).
    cache_policy = os.environ.get("AICG_BENCH_CACHE", "off")
    os.environ["AICG_STEM_CACHE"] = cache_policy
    pipeline = _get_pipeline()
    store = pipeline.store

    songs = []
    for i in range(n_jobs):
        song = os.path.join(base, f"bench_tp_{i}.wav")
        _make_song(song, seconds, 100 + i)
        songs.append(song)
    shutil.rmtree(store.output_dir, ignore_errors=True)

    # warmup: one cover end-to-end loads/compiles every program
    pipeline.song_cover(songs[0], "BenchVoice", pitch_change=0, index_rate=0.0,
                        output_format="wav")
    pipeline.drain_cache()
    tunnel = _tunnel_probe()

    # the serial yardstick, measured in this window under the same policy
    shutil.rmtree(store.output_dir, ignore_errors=True)
    t0 = time.time()
    pipeline.song_cover(songs[0], "BenchVoice", pitch_change=0, index_rate=0.0,
                        output_format="wav")
    serial_wall = time.time() - t0
    pipeline.drain_cache()
    serial_rtf = seconds / serial_wall
    print(f"[bench] serial cover in-window: {serial_wall:.2f}s  "
          f"rtf={serial_rtf:.2f}", file=sys.stderr)

    def run_point(n_workers: int):
        shutil.rmtree(store.output_dir, ignore_errors=True)
        queue = list(songs)
        lock = threading.Lock()
        errors = []

        def worker():
            while True:
                with lock:
                    if not queue:
                        return
                    song = queue.pop()
                try:
                    pipeline.song_cover(song, "BenchVoice", pitch_change=0,
                                        index_rate=0.0, output_format="wav")
                except Exception as e:  # pragma: no cover
                    errors.append(e)

        t0 = time.time()
        threads = [threading.Thread(target=worker) for _ in range(n_workers)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        t1 = time.time()
        pipeline.drain_cache()
        drain = time.time() - t1
        if errors:
            raise errors[0]
        return wall, drain

    sweep, sweep_drained = {}, {}
    for n_workers in workers:
        if sweep and deadline is not None and time.time() > deadline:
            print(f"[bench] throughput sweep cut at deadline before "
                  f"{n_workers} workers", file=sys.stderr)
            break
        wall, drain = run_point(n_workers)
        # retry ANOMALOUS points when the window allows: a single pass is
        # hostage to a transient tunnel stall (observed: the same 4-worker
        # point reading 29.5x and 19.0x in different passes of one session).
        # Only suspicious reads retry — an unconditional best-of-2 could eat
        # the deadline and cut the 8-worker point entirely.
        agg = n_jobs * seconds / wall
        suspicious = agg < serial_rtf or (
            sweep and agg < 0.85 * max(sweep.values())
        )
        if (
            suspicious
            and os.environ.get("AICG_BENCH_SWEEP_REPS", "2") != "1"
            and (deadline is None or time.time() + wall < deadline)
        ):
            w2, d2 = run_point(n_workers)
            if w2 < wall:
                wall, drain = w2, d2
        sweep[n_workers] = round(n_jobs * seconds / wall, 3)
        sweep_drained[n_workers] = round(n_jobs * seconds / (wall + drain), 3)
        print(f"[bench] throughput {n_jobs}x{seconds:.0f}s @ {n_workers} "
              f"workers: {wall:.2f}s  agg_rtf={sweep[n_workers]:.2f}  "
              f"(+{drain:.2f}s cache drain -> {sweep_drained[n_workers]:.2f})",
              file=sys.stderr)
    shutil.rmtree(store.output_dir, ignore_errors=True)
    if prev_cache is None:
        os.environ.pop("AICG_STEM_CACHE", None)
    else:
        os.environ["AICG_STEM_CACHE"] = prev_cache
    best_workers = max(sweep, key=sweep.get)
    agg_rtf = sweep[best_workers]
    return {
        "metric": f"throughput_{n_jobs}x{int(seconds)}s",
        "value": agg_rtf,
        "unit": "aggregate_audio_s_per_s",
        "vs_baseline": round(agg_rtf / BASELINE_RTF, 3),
        "workers": best_workers,
        "sweep": {str(k): v for k, v in sweep.items()},
        "sweep_drained": {str(k): v for k, v in sweep_drained.items()},
        "serial_rtf_in_window": round(serial_rtf, 3),
        "concurrency_vs_serial": round(agg_rtf / serial_rtf, 3),
        "cache_policy": cache_policy,
        "tunnel": tunnel,
    }


def bench_vc(reps: int, seconds: float) -> dict:
    """VC-only path (BASELINE config 1): comparable to the round-1 metric."""
    from aicovergen_tpu.convert.hubert_convert import transformers_state_to_tree
    from aicovergen_tpu.convert.torch_reader import fold_weight_norm, nest
    from aicovergen_tpu.models.rvc import RVCConfig
    from aicovergen_tpu.pipeline.f0 import F0Estimator
    from aicovergen_tpu.pipeline.vc import VoiceConverter
    from aicovergen_tpu.utils.config import default_config
    from aicovergen_tpu.utils.metrics import Metrics
    from aicovergen_tpu.utils.precision import cast_floats

    runtime = default_config()
    synth_params = nest(fold_weight_norm(_load_flat(
        os.path.join(FIXTURES, "rvc_synth_v2f0.npz"), drop_prefixes=("enc_q.",)
    )))
    hubert_params = transformers_state_to_tree(_load_flat(os.path.join(FIXTURES, "hubert_base.npz")))
    rmvpe_params = nest(_load_flat(os.path.join(FIXTURES, "rmvpe_e2e.npz")))
    if runtime.use_bf16:
        synth_params = cast_floats(synth_params, runtime.compute_dtype)
        hubert_params = cast_floats(hubert_params, runtime.compute_dtype)

    vc = VoiceConverter(
        synth_params=synth_params,
        synth_cfg=RVCConfig(version="v2", if_f0=True),
        hubert_params=hubert_params,
        f0_estimator=F0Estimator(
            rmvpe_params=rmvpe_params,
            compute_dtype=runtime.compute_dtype if runtime.use_bf16 else None,
        ),
        runtime=runtime,
    )
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    audio = (
        0.3 * np.sin(2 * np.pi * (200 + 40 * np.sin(2 * np.pi * 0.4 * t)) * t)
        + 0.02 * rng.standard_normal(t.shape[0])
    ).astype(np.float64)

    t0 = time.time()
    vc.convert(audio, f0_method="rmvpe", index_rate=0.0)
    print(f"[bench] warmup (incl. compile): {time.time() - t0:.1f}s", file=sys.stderr)

    walls, reports = [], []
    for _ in range(reps):
        metrics = Metrics(audio_seconds=seconds)
        t0 = time.time()
        vc.convert(audio, f0_method="rmvpe", index_rate=0.0, metrics=metrics)
        walls.append(time.time() - t0)
        reports.append(metrics.report())
    best = int(np.argmin(walls))
    rtf = seconds / walls[best]
    print(f"[bench] times: {[f'{x:.2f}' for x in walls]}", file=sys.stderr)
    return {
        "metric": f"vc_rtf_{int(seconds)}s",
        "value": round(rtf, 3),
        "unit": "audio_s_per_s",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
        "stages": {k: v["seconds"] for k, v in reports[best]["stages"].items()},
        "reps_wall_s": [round(w, 2) for w in walls],
    }


def bench_vc_full(reps: int, seconds: float) -> dict:
    """BASELINE config 3: mangio-crepe f0 + faiss retrieval blend +
    filter_radius / rms_mix_rate / protect — the full flag surface."""
    from aicovergen_tpu.convert.hubert_convert import transformers_state_to_tree
    from aicovergen_tpu.convert.torch_reader import fold_weight_norm, nest
    from aicovergen_tpu.models.crepe import init_random_params
    from aicovergen_tpu.models.rvc import RVCConfig
    from aicovergen_tpu.pipeline.f0 import F0Estimator
    from aicovergen_tpu.pipeline.vc import VoiceConverter
    from aicovergen_tpu.retrieval.faiss_io import FaissIndex
    from aicovergen_tpu.retrieval.knn import Retriever
    from aicovergen_tpu.utils.config import default_config
    from aicovergen_tpu.utils.metrics import Metrics
    from aicovergen_tpu.utils.precision import cast_floats

    runtime = default_config()
    synth_params = nest(fold_weight_norm(_load_flat(
        os.path.join(FIXTURES, "rvc_synth_v2f0.npz"), drop_prefixes=("enc_q.",)
    )))
    hubert_params = transformers_state_to_tree(_load_flat(os.path.join(FIXTURES, "hubert_base.npz")))
    if runtime.use_bf16:
        synth_params = cast_floats(synth_params, runtime.compute_dtype)
        hubert_params = cast_floats(hubert_params, runtime.compute_dtype)

    rng = np.random.default_rng(0)
    codebook = rng.standard_normal((20000, 768)).astype(np.float32)
    index = FaissIndex(d=768, ntotal=20000, metric_type=1, vectors=codebook)
    vc = VoiceConverter(
        synth_params=synth_params,
        synth_cfg=RVCConfig(version="v2", if_f0=True),
        hubert_params=hubert_params,
        f0_estimator=F0Estimator(
            crepe_params=init_random_params("full", 0),
            compute_dtype=runtime.compute_dtype if runtime.use_bf16 else None,
        ),
        retriever=Retriever(index, exact=True),
        runtime=runtime,
    )
    sr = 16000
    t = np.arange(int(seconds * sr)) / sr
    audio = (
        0.3 * np.sin(2 * np.pi * (200 + 40 * np.sin(2 * np.pi * 0.4 * t)) * t)
        + 0.02 * rng.standard_normal(t.shape[0])
    ).astype(np.float64)
    kwargs = dict(f0_method="mangio-crepe", crepe_hop_length=128, index_rate=0.5,
                  filter_radius=3, rms_mix_rate=0.25, protect=0.33)

    t0 = time.time()
    vc.convert(audio, **kwargs)
    print(f"[bench] warmup (incl. compile): {time.time() - t0:.1f}s", file=sys.stderr)
    walls, reports = [], []
    for _ in range(reps):
        metrics = Metrics(audio_seconds=seconds)
        t0 = time.time()
        vc.convert(audio, metrics=metrics, **kwargs)
        walls.append(time.time() - t0)
        reports.append(metrics.report())
    best = int(np.argmin(walls))
    rtf = seconds / walls[best]
    return {
        "metric": f"vc_full_rtf_{int(seconds)}s",
        "value": round(rtf, 3),
        "unit": "audio_s_per_s",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
        "stages": {k: v["seconds"] for k, v in reports[best]["stages"].items()},
        "reps_wall_s": [round(w, 2) for w in walls],
    }


def main() -> int:
    from aicovergen_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import jax

    # the tunnel-backed TPU backend is occasionally UNAVAILABLE for a few
    # minutes (terminal restart); retry init within a bounded window instead
    # of failing the whole bench run on a transient outage
    deadline = time.time() + float(os.environ.get("AICG_BENCH_INIT_RETRY_S", 900))
    while True:
        try:
            print(f"[bench] devices: {jax.devices()}", file=sys.stderr)
            break
        except RuntimeError as e:
            if "UNAVAILABLE" not in str(e) or time.time() > deadline:
                raise
            print(f"[bench] backend unavailable, retrying in 60 s: {e}",
                  file=sys.stderr)
            time.sleep(60)
            # jax caches backend-init failures; drop them so the retry
            # actually re-attempts the PJRT plugin handshake
            import jax.extend.backend

            jax.extend.backend.clear_backends()

    if os.environ.get("AICG_BENCH_VC_SCALE") == "tiny":
        # tiny-vc assets exist for compile-bound CPU harnesses (dryrun,
        # length-class tests); a perf number from them would be fiction
        print("AICG_BENCH_VC_SCALE=tiny is a test/dryrun scale, not a bench "
              "configuration — unset it to benchmark", file=sys.stderr)
        return 2

    mode = os.environ.get("AICG_BENCH", "cover")
    # 2 steady reps by default: each costs ~8-20 s against a ~300-500 s
    # warmup, and a single rep is hostage to one transient tunnel stall
    reps = int(os.environ.get("AICG_BENCH_REPS", 2))
    if mode == "vc":
        seconds = float(os.environ.get("AICG_BENCH_SECONDS", 30))
        result = bench_vc(reps, seconds)
    elif mode == "throughput":
        # default 120 s: shares every length-class program with the cover
        # bench, so a warm cache needs no fresh compiles
        seconds = float(os.environ.get("AICG_BENCH_SECONDS", 120))
        result = bench_throughput(
            seconds,
            n_jobs=int(os.environ.get("AICG_BENCH_JOBS", 4)),
            workers=tuple(
                int(w)
                for w in os.environ.get("AICG_BENCH_WORKERS", "2").split(",")
                if w.strip()
            ) or (2,),
        )
    elif mode == "vc_full":
        seconds = float(os.environ.get("AICG_BENCH_SECONDS", 30))
        result = bench_vc_full(max(reps, 1), seconds)
    else:
        # 120 s default: long enough to exercise chunked separation + the
        # multi-segment VC batch, short enough that warmup (dominated by the
        # remote backend's per-program executable-load cost) plus one
        # steady-state rep fits a ~10 min bench window.  AICG_BENCH_SECONDS=240
        # for the full 4-minute BASELINE configuration.
        seconds = float(os.environ.get("AICG_BENCH_SECONDS", 120))
        t_cover = time.time()
        result = bench_cover(reps, seconds)
        # piggy-back the BASELINE config-5 throughput shape (8 concurrent
        # covers) on the warm pipeline: same song length -> zero fresh
        # compiles.  The 2/4/8 worker sweep locates the saturation point;
        # the deadline cuts later points in a slow tunnel window.  Skipped
        # entirely when the cover bench already ate the window
        # (AICG_BENCH_THROUGHPUT=0 to disable).
        spent = time.time() - t_cover
        window = float(os.environ.get("AICG_BENCH_HARD_CAP", 3000))
        if (
            os.environ.get("AICG_BENCH_THROUGHPUT", "1") != "0"
            and result.get("steady_state")
            and spent + 14 * seconds / max(result["value"], 0.1) < window
        ):
            try:
                tp = bench_throughput(seconds, n_jobs=8, workers=(2, 4, 8),
                                      deadline=t_cover + window)
                result["throughput"] = {
                    k: tp[k]
                    for k in ("metric", "value", "unit", "vs_baseline",
                              "workers", "sweep",
                              "sweep_drained", "serial_rtf_in_window",
                              "concurrency_vs_serial", "cache_policy", "tunnel")
                }
            except Exception as e:  # pragma: no cover
                print(f"[bench] throughput add-on failed: {e}", file=sys.stderr)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
