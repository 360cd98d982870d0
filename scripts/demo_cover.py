"""Self-contained end-to-end demo: build synthetic model assets (conv-TDF
replica separation nets + fixture-weight RVC voice) and generate one cover
from a synthesized song — no network, no real checkpoints.

Usage:  python scripts/demo_cover.py [--seconds 20] [--out DIR]

This is the quickest way to see the whole pipeline run (and the per-stage
AICG_METRICS line) on any backend; bench.py uses the same asset builder at
full benchmark scale.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--out", default=os.path.join(REPO, ".demo_assets"))
    ap.add_argument("--tiny", action="store_true",
                    help="tiny separation nets (fast on CPU)")
    args = ap.parse_args()

    from aicovergen_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    os.environ.setdefault("AICG_BENCH_MDX_SCALE", "tiny" if args.tiny else "full")
    import bench  # reuse the synthetic asset builder

    bench.BENCH_ASSETS = args.out
    base = bench._build_assets()
    song = os.path.join(base, "demo_song.wav")
    bench._make_song(song, args.seconds, seed=42)

    from aicovergen_tpu.io.assets import AssetStore
    from aicovergen_tpu.pipeline.cover import CoverPipeline

    pipeline = CoverPipeline(store=AssetStore(base))
    cover = pipeline.song_cover(
        song, "BenchVoice", pitch_change=0, index_rate=0.0, output_format="wav"
    )
    print(f"[demo] cover written to {cover}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
