"""Command-line interface, flag-for-flag compatible with the reference CLI
(reference src/main.py:319-355; documented flags README.md:184-205)."""

from __future__ import annotations

import argparse
import os
import sys

from ..io.assets import AssetStore, default_base_dir
from ..pipeline.cover import CoverPipeline


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Generate a AI cover song in the song_output/id directory.",
        add_help=True,
    )
    parser.add_argument("-i", "--song-input", type=str, required=True,
                        help="Link to a YouTube video or the filepath to a local mp3/wav file to create an AI cover of")
    parser.add_argument("-dir", "--rvc-dirname", type=str, required=True,
                        help="Name of the folder in the rvc_models directory containing the RVC model file and optional index file to use")
    parser.add_argument("-p", "--pitch-change", type=int, required=True,
                        help="Change the pitch of AI Vocals only. Generally, use 1 for male to female and -1 for vice-versa. (Octaves)")
    parser.add_argument("-k", "--keep-files", action=argparse.BooleanOptionalAction,
                        help="Whether to keep all intermediate audio files generated in the song_output/id directory, e.g. Isolated Vocals/Instrumentals")
    parser.add_argument("-ir", "--index-rate", type=float, default=0.5,
                        help="A decimal number e.g. 0.5, used to reduce/resolve the timbre leakage problem. If set to 1, more biased towards the timbre quality of the training dataset")
    parser.add_argument("-fr", "--filter-radius", type=int, default=3,
                        help="A number between 0 and 7. If >=3: apply median filtering to the harvested pitch results. The value represents the filter radius and can reduce breathiness.")
    parser.add_argument("-rms", "--rms-mix-rate", type=float, default=0.25,
                        help="A decimal number e.g. 0.25. Control how much to use the original vocal's loudness (0) or a fixed loudness (1).")
    parser.add_argument("-palgo", "--pitch-detection-algo", type=str, default="rmvpe",
                        help="Best option is rmvpe (clarity in vocals), then mangio-crepe (smoother vocals).")
    parser.add_argument("-hop", "--crepe-hop-length", type=int, default=128,
                        help="If pitch detection algo is mangio-crepe, controls how often it checks for pitch changes in milliseconds. The higher the value, the faster the conversion and less risk of voice cracks, but there is less pitch accuracy. Recommended: 128.")
    parser.add_argument("-pro", "--protect", type=float, default=0.33,
                        help="A decimal number e.g. 0.33. Protect voiceless consonants and breath sounds to prevent artifacts such as tearing in electronic music. Set to 0.5 to disable. Decrease the value to increase protection, but it may reduce indexing accuracy.")
    parser.add_argument("-mv", "--main-vol", type=int, default=0,
                        help="Volume change for AI main vocals in decibels. Use -3 to decrease by 3 decibels and 3 to increase by 3 decibels")
    parser.add_argument("-bv", "--backup-vol", type=int, default=0,
                        help="Volume change for backup vocals in decibels")
    parser.add_argument("-iv", "--inst-vol", type=int, default=0,
                        help="Volume change for instrumentals in decibels")
    parser.add_argument("-pall", "--pitch-change-all", type=int, default=0,
                        help="Change the pitch/key of vocals and instrumentals. Changing this slightly reduces sound quality")
    parser.add_argument("-rsize", "--reverb-size", type=float, default=0.15,
                        help="Reverb room size between 0 and 1")
    parser.add_argument("-rwet", "--reverb-wetness", type=float, default=0.2,
                        help="Reverb wet level between 0 and 1")
    parser.add_argument("-rdry", "--reverb-dryness", type=float, default=0.8,
                        help="Reverb dry level between 0 and 1")
    parser.add_argument("-rdamp", "--reverb-damping", type=float, default=0.7,
                        help="Reverb damping between 0 and 1")
    parser.add_argument("-oformat", "--output-format", type=str, default="mp3",
                        help="Output format of audio file. mp3 for smaller file size, wav for best quality")
    parser.add_argument("--base-dir", type=str, default=None,
                        help="Directory holding rvc_models/, mdxnet_models/, song_output/ (default: $AICG_BASE_DIR or cwd)")
    return parser


def main(argv=None) -> int:
    from ..utils.platform import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    store = AssetStore(args.base_dir or default_base_dir())

    if not os.path.exists(os.path.join(store.rvc_models_dir, args.rvc_dirname)):
        raise SystemExit(
            f"The folder {os.path.join(store.rvc_models_dir, args.rvc_dirname)} does not exist."
        )

    from ..parallel.mesh import serving_mesh
    from ..utils.config import default_config

    runtime = default_config()
    pipeline = CoverPipeline(store, runtime=runtime, mesh=serving_mesh(runtime.num_devices))
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
