"""Command-line interface, flag-for-flag compatible with the reference CLI
(reference src/main.py:319-355; documented flags README.md:184-205)."""

from __future__ import annotations

import argparse
import os
import sys

from ..io.assets import AssetStore, default_base_dir
from ..pipeline.cover import CoverPipeline


def build_parser() -> argparse.ArgumentParser:
    # Flag names, types, and defaults match the reference CLI surface
    # (reference src/main.py:319-355); the help prose is this project's own.
    parser = argparse.ArgumentParser(
        description="Create an AI cover of a song; results land in song_output/<id>/.",
        add_help=True,
    )
    parser.add_argument("-i", "--song-input", type=str, required=True,
                        help="Source song: a YouTube URL or a path to a local audio file (mp3/wav)")
    parser.add_argument("-dir", "--rvc-dirname", type=str, required=True,
                        help="Voice to convert to: a subfolder of rvc_models/ holding one .pth model and, optionally, a faiss .index file")
    parser.add_argument("-p", "--pitch-change", type=int, required=True,
                        help="Octave shift applied to the converted vocals only (1 ~ male voice to female target, -1 the reverse, 0 none)")
    parser.add_argument("-k", "--keep-files", action=argparse.BooleanOptionalAction,
                        help="Keep the intermediate stems (isolated vocals, instrumental, de-reverb, ...) in song_output/<id>/ instead of deleting them after the mix")
    parser.add_argument("-ir", "--index-rate", type=float, default=0.5,
                        help="Retrieval blend weight in [0, 1]: how strongly HuBERT features are pulled toward the voice's training-set index (1 = maximum target timbre, 0 = retrieval off)")
    parser.add_argument("-fr", "--filter-radius", type=int, default=3,
                        help="Median-filter radius (0-7) applied to the estimated pitch track when >= 3; smooths octave flickers and breathy frames")
    parser.add_argument("-rms", "--rms-mix-rate", type=float, default=0.25,
                        help="Loudness-envelope blend in [0, 1]: 0 follows the source vocal's dynamics, 1 uses the synthesizer's flat level")
    parser.add_argument("-palgo", "--pitch-detection-algo", type=str, default="rmvpe",
                        help="Pitch tracker: rmvpe (default, cleanest), mangio-crepe (smoother), or crepe/pm/harvest/dio/hybrid variants. NOTE: harvest and dio here are role-equivalent autocorrelation estimators, not numerically pyworld-identical (see pipeline/f0.py)")
    parser.add_argument("-hop", "--crepe-hop-length", type=int, default=128,
                        help="mangio-crepe analysis hop in samples; larger hops run faster and crack less but track pitch more coarsely (128 is a good middle)")
    parser.add_argument("-pro", "--protect", type=float, default=0.33,
                        help="Consonant/breath protection threshold in [0, 0.5]: unvoiced frames keep their raw features below this value; 0.5 turns protection off entirely; smaller protects more at some cost to index accuracy")
    parser.add_argument("-mv", "--main-vol", type=int, default=0,
                        help="Gain in dB applied to the converted main vocal in the final mix (negative attenuates)")
    parser.add_argument("-bv", "--backup-vol", type=int, default=0,
                        help="Gain in dB applied to the backup-vocal stem in the final mix")
    parser.add_argument("-iv", "--inst-vol", type=int, default=0,
                        help="Gain in dB applied to the instrumental stem in the final mix")
    parser.add_argument("-pall", "--pitch-change-all", type=int, default=0,
                        help="Semitone shift applied to EVERY stem (key change for the whole song); nonzero values cost a little fidelity on the instrumental")
    parser.add_argument("-rsize", "--reverb-size", type=float, default=0.15,
                        help="Simulated room size for the vocal reverb, 0-1")
    parser.add_argument("-rwet", "--reverb-wetness", type=float, default=0.2,
                        help="Reverb wet-signal level, 0-1")
    parser.add_argument("-rdry", "--reverb-dryness", type=float, default=0.8,
                        help="Reverb dry-signal level, 0-1")
    parser.add_argument("-rdamp", "--reverb-damping", type=float, default=0.7,
                        help="High-frequency damping of the reverb tail, 0-1")
    parser.add_argument("-oformat", "--output-format", type=str, default="mp3",
                        help="Container for the final mix: mp3 (compact) or wav (lossless)")
    parser.add_argument("--base-dir", type=str, default=None,
                        help="Directory holding rvc_models/, mdxnet_models/, song_output/ (default: $AICG_BASE_DIR or cwd)")
    parser.add_argument("--server", type=str, default=os.environ.get("AICG_SERVER") or None,
                        metavar="URL",
                        help="Submit the cover to a running `aicovergen-webui` daemon "
                        "(e.g. http://127.0.0.1:7860) instead of loading models in "
                        "this process. A warm daemon runs covers at steady state; a "
                        "fresh CLI process pays checkpoint + compiled-program loads "
                        "on every invocation (~10-20x the steady-state wall time on "
                        "a remote-TPU host — see docs/PERFORMANCE.md). If the "
                        "daemon's output file is not visible on this filesystem, "
                        "the cover is downloaded next to it into ./")
    return parser


def run_via_server(args) -> int:
    """Client mode: POST /api/generate on a running webui daemon, poll the
    job, and surface progress/result — the cover executes in the daemon's
    warm process (loaded checkpoints, loaded device programs), so repeated
    CLI covers skip the per-process cold start entirely."""
    import json
    import time
    import urllib.parse
    import urllib.request

    base = args.server.rstrip("/")
    song_input = args.song_input
    if os.path.exists(song_input):
        song_input = os.path.abspath(song_input)
    params = {
        "song_input": song_input,
        "voice_model": args.rvc_dirname,
        "pitch_change": args.pitch_change,
        "keep_files": bool(args.keep_files),
        "main_gain": args.main_vol,
        "backup_gain": args.backup_vol,
        "inst_gain": args.inst_vol,
        "index_rate": args.index_rate,
        "filter_radius": args.filter_radius,
        "rms_mix_rate": args.rms_mix_rate,
        "f0_method": args.pitch_detection_algo,
        "crepe_hop_length": args.crepe_hop_length,
        "protect": args.protect,
        "pitch_change_all": args.pitch_change_all,
        "reverb_rm_size": args.reverb_size,
        "reverb_wet": args.reverb_wetness,
        "reverb_dry": args.reverb_dryness,
        "reverb_damping": args.reverb_damping,
        "output_format": args.output_format,
    }
    req = urllib.request.Request(
        base + "/api/generate", data=json.dumps(params).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        job_id = json.loads(resp.read())["job_id"]
    last_msg = None
    while True:
        with urllib.request.urlopen(f"{base}/api/job/{job_id}") as resp:
            job = json.loads(resp.read())
        msg = f"[{job['status']}] {job.get('message', '')} ({job.get('progress', 0) * 100:.0f}%)"
        if msg != last_msg:
            print(msg, flush=True)
            last_msg = msg
        if job["status"] == "done" and "result" in job:
            break
        if job["status"] == "error":
            raise SystemExit(f"server job failed: {job.get('message')}")
        time.sleep(1.0)
    for warning in job.get("warnings") or []:
        print(f"[!] {warning}")
    result = job["result"]
    if not os.path.exists(result):  # remote daemon: fetch the artifact
        local = os.path.basename(result)
        url = base + "/api/audio?path=" + urllib.parse.quote(result)
        with urllib.request.urlopen(url) as resp, open(local, "wb") as f:
            f.write(resp.read())
        result = os.path.abspath(local)
    print(f"[+] Cover generated at {result}")
    return 0


def main(argv=None) -> int:
    from ..utils.platform import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    if args.server:
        return run_via_server(args)
    store = AssetStore(args.base_dir or default_base_dir())

    if not os.path.exists(os.path.join(store.rvc_models_dir, args.rvc_dirname)):
        raise SystemExit(
            f"The folder {os.path.join(store.rvc_models_dir, args.rvc_dirname)} does not exist."
        )

    from ..parallel.mesh import serving_mesh
    from ..utils.config import default_config

    runtime = default_config()
    pipeline = CoverPipeline(store, runtime=runtime, mesh=serving_mesh(runtime.num_devices, runtime.model_parallel))
    cover_path = pipeline.song_cover(
        args.song_input,
        args.rvc_dirname,
        args.pitch_change,
        bool(args.keep_files),
        main_gain=args.main_vol,
        backup_gain=args.backup_vol,
        inst_gain=args.inst_vol,
        index_rate=args.index_rate,
        filter_radius=args.filter_radius,
        rms_mix_rate=args.rms_mix_rate,
        f0_method=args.pitch_detection_algo,
        crepe_hop_length=args.crepe_hop_length,
        protect=args.protect,
        pitch_change_all=args.pitch_change_all,
        reverb_rm_size=args.reverb_size,
        reverb_wet=args.reverb_wetness,
        reverb_dry=args.reverb_dryness,
        reverb_damping=args.reverb_damping,
        output_format=args.output_format,
    )
    print(f"[+] Cover generated at {cover_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
