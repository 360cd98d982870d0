"""Hosted-API surface (the reference's Replicate/Cog predictor equivalent,
reference predict.py:53-276): a typed, validated, single-call interface that
wraps the cover pipeline, including the pitch enum (no-change /
male-to-female / female-to-male -> 0 / +1 / -1 octaves, predict.py:216-222)
and on-demand voice-model download.

Works standalone (`Predictor().predict(...)`) and as a cog.BasePredictor
drop-in when cog is installed.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

from ..io.assets import AssetStore, default_base_dir
from ..utils.config import default_config

PITCH_CHOICES = {"no-change": 0, "male-to-female": 1, "female-to-male": -1}
F0_METHODS = ("rmvpe", "mangio-crepe", "crepe", "crepe-tiny", "pm", "dio", "harvest")
OUTPUT_FORMATS = ("mp3", "wav")


def _serving_mesh():
    from ..parallel.mesh import serving_mesh_from_config

    return serving_mesh_from_config()


@dataclass
class Predictor:
    base_dir: Optional[str] = None

    def setup(self, warmup_seconds: Optional[float] = None) -> None:
        """Build the pipeline and (when the base assets are present) warm it:
        one synthetic cover through a fabricated voice pays every compile /
        remote-executable-load cost at boot, so the first user predict runs
        at steady state (the reference pays CUDA init per run; a remote-TPU
        tunnel pays far more, VERDICT r03 item 4).

        Warmup length: `warmup_seconds` arg, else env AICG_WARMUP_SECONDS
        (default 240 — the 4-minute BASELINE class); AICG_PREDICT_WARMUP=0
        disables.  Skipped silently when hubert/MDX assets are absent (unit
        tests, fresh dirs)."""
        self.store = AssetStore(self.base_dir or default_base_dir())
        from ..pipeline.cover import CoverPipeline

        # serving posture: cache files land behind the response (see
        # utils/config.py stem_cache_mode); per-pipeline knob, explicit
        # AICG_STEM_CACHE env still wins
        from ..utils.config import stem_cache_mode

        self.pipeline = CoverPipeline(
            self.store, runtime=default_config(), mesh=_serving_mesh(),
            stem_cache=stem_cache_mode(default="behind"),
        )

        if warmup_seconds is None:
            if os.environ.get("AICG_PREDICT_WARMUP", "1") == "0":
                warmup_seconds = 0.0
            else:
                # comma list supported ("240,120"): pre-loads each class's
                # whole-track executables at boot (docs/PERFORMANCE.md
                # "The executable set, audited")
                from ..utils.config import warmup_classes

                warmup_seconds = warmup_classes(
                    os.environ.get("AICG_WARMUP_SECONDS", "240")
                )
        if warmup_seconds and (
            isinstance(warmup_seconds, (list, tuple)) or warmup_seconds > 0
        ):
            have_assets = os.path.exists(self.store.hubert_path()) and any(
                n.endswith(".onnx")
                for n in (
                    os.listdir(self.store.mdx_models_dir)
                    if os.path.isdir(self.store.mdx_models_dir)
                    else ()
                )
            )
            if have_assets:
                print(f"[predict] warming up ({warmup_seconds!r}s class)...", flush=True)
                try:
                    spent = self.pipeline.warmup(seconds=warmup_seconds)
                    print(f"[predict] warmup done in {spent:.1f}s", flush=True)
                except Exception as e:  # serving continues cold
                    print(f"[predict] warmup failed (continuing cold): {e}", flush=True)

    def predict(
        self,
        song_input: str,
        rvc_model: str,
        pitch_change: str = "no-change",
        index_rate: float = 0.5,
        filter_radius: int = 3,
        rms_mix_rate: float = 0.25,
        pitch_detection_algorithm: str = "rmvpe",
        crepe_hop_length: int = 128,
        protect: float = 0.33,
        main_vocals_volume_change: float = 0.0,
        backup_vocals_volume_change: float = 0.0,
        instrumental_volume_change: float = 0.0,
        pitch_change_all: float = 0.0,
        reverb_size: float = 0.15,
        reverb_wetness: float = 0.2,
        reverb_dryness: float = 0.8,
        reverb_damping: float = 0.7,
        output_format: str = "mp3",
        custom_rvc_model_download_url: Optional[str] = None,
    ) -> str:
        if not hasattr(self, "pipeline"):
            # lazy path: the caller is about to run a real cover, which warms
            # exactly the programs it needs — a pre-warmup would double work
            self.setup(warmup_seconds=0)
        if pitch_change not in PITCH_CHOICES:
            raise ValueError(f"pitch_change must be one of {sorted(PITCH_CHOICES)}")
        if pitch_detection_algorithm not in F0_METHODS and "hybrid" not in pitch_detection_algorithm:
            raise ValueError(f"unknown pitch detection algorithm {pitch_detection_algorithm}")
        if output_format not in OUTPUT_FORMATS:
            raise ValueError(f"output_format must be one of {OUTPUT_FORMATS}")
        if not 0 <= index_rate <= 1:
            raise ValueError("index_rate must be in [0, 1]")
        if not 0 <= filter_radius <= 7:
            raise ValueError("filter_radius must be in [0, 7]")
        if not 0 <= protect <= 0.5:
            raise ValueError("protect must be in [0, 0.5]")

        if custom_rvc_model_download_url:
            from .webui import download_online_model

            name = os.path.splitext(
                os.path.basename(custom_rvc_model_download_url.split("?")[0])
            )[0]
            if not os.path.exists(os.path.join(self.store.rvc_models_dir, name)):
                download_online_model(self.store, custom_rvc_model_download_url, name)
            rvc_model = name

        # cog returns a Path, so non-parity f0 choices are surfaced in the
        # per-call log (visible in the job's output on Replicate), not only
        # the one-time process log
        from ..pipeline.f0 import f0_divergence_warnings

        for w in f0_divergence_warnings(pitch_detection_algorithm):
            print(f"[predict] warning: {w}")

        return self.pipeline.song_cover(
            song_input,
            rvc_model,
            pitch_change=PITCH_CHOICES[pitch_change],
            keep_files=False,
            main_gain=main_vocals_volume_change,
            backup_gain=backup_vocals_volume_change,
            inst_gain=instrumental_volume_change,
            index_rate=index_rate,
            filter_radius=filter_radius,
            rms_mix_rate=rms_mix_rate,
            f0_method=pitch_detection_algorithm,
            crepe_hop_length=crepe_hop_length,
            protect=protect,
            pitch_change_all=pitch_change_all,
            reverb_rm_size=reverb_size,
            reverb_wet=reverb_wetness,
            reverb_dry=reverb_dryness,
            reverb_damping=reverb_damping,
            output_format=output_format,
        )
