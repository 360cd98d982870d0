"""Benchmark: voice-conversion real-time factor on one chip.

Runs the flagship path — HuBERT-base features + rmvpe f0 + RVC v2 (40k)
synthesis — on 30 s of 16 kHz audio with real architectures (random/fixture
weights; numerics are identical to trained weights for throughput purposes)
and reports audio-seconds processed per wall-second after a warmup pass.

Baseline: the reference publishes no numbers; its qualitative statement is
"less than a few minutes" for a full ~4-minute cover on a consumer GPU
(reference README.md:152), i.e. roughly 2x realtime for the whole pipeline.
We use RTF=2.0 as the vs_baseline denominator.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
FIXTURES = os.path.join(REPO, "tests", "fixtures")

AUDIO_SECONDS = 30
BASELINE_RTF = 2.0


def _load_tree(npz_path, drop_prefixes=()):
    from aicovergen_tpu.convert.torch_reader import fold_weight_norm, nest

    data = np.load(npz_path)
    flat = {k[3:]: data[k] for k in data.files if k.startswith("sd:")}
    flat = {
        k: v
        for k, v in flat.items()
        if not any(k.startswith(p) for p in drop_prefixes)
        and not k.endswith("num_batches_tracked")
    }
    return nest(fold_weight_norm(flat))


def main() -> int:
    from aicovergen_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import jax

    from aicovergen_tpu.convert.hubert_convert import transformers_state_to_tree
    from aicovergen_tpu.convert.torch_reader import nest
    from aicovergen_tpu.models.rvc import RVCConfig
    from aicovergen_tpu.pipeline.f0 import F0Estimator
    from aicovergen_tpu.pipeline.vc import VoiceConverter
    from aicovergen_tpu.utils.config import RuntimeConfig

    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)

    synth_params = _load_tree(
        os.path.join(FIXTURES, "rvc_synth_v2f0.npz"), drop_prefixes=("enc_q.",)
    )
    hdata = np.load(os.path.join(FIXTURES, "hubert_base.npz"))
    hubert_params = transformers_state_to_tree(
        {k[3:]: hdata[k] for k in hdata.files if k.startswith("sd:")}
    )
    rdata = np.load(os.path.join(FIXTURES, "rmvpe_e2e.npz"))
    rmvpe_params = nest(
        {
            k[3:]: rdata[k]
            for k in rdata.files
            if k.startswith("sd:") and not k.endswith("num_batches_tracked")
        }
    )

    vc = VoiceConverter(
        synth_params=synth_params,
        synth_cfg=RVCConfig(version="v2", if_f0=True),
        hubert_params=hubert_params,
        f0_estimator=F0Estimator(rmvpe_params=rmvpe_params),
        runtime=RuntimeConfig(
            x_pad=int(os.environ.get("AICG_X_PAD", 3)),
            x_query=10,
            x_center=60,
            x_max=65,
            bucket_samples=int(os.environ.get("AICG_BUCKET", 16000)),
        ),
    )

    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(AUDIO_SECONDS * sr) / sr
    audio = (
        0.3 * np.sin(2 * np.pi * (200 + 40 * np.sin(2 * np.pi * 0.4 * t)) * t)
        + 0.02 * rng.standard_normal(AUDIO_SECONDS * sr)
    ).astype(np.float64)

    # warmup (compile)
    t0 = time.time()
    vc.convert(audio, f0_method="rmvpe", index_rate=0.0)
    warmup = time.time() - t0
    print(f"[bench] warmup (incl. compile): {warmup:.1f}s", file=sys.stderr)

    times = []
    for _ in range(int(os.environ.get("AICG_BENCH_REPS", 3))):
        t0 = time.time()
        vc.convert(audio, f0_method="rmvpe", index_rate=0.0)
        times.append(time.time() - t0)
    best = min(times)
    rtf = AUDIO_SECONDS / best
    print(f"[bench] times: {[f'{x:.2f}' for x in times]}  best={best:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "vc_rtf_30s",
                "value": round(rtf, 3),
                "unit": "audio_s_per_s",
                "vs_baseline": round(rtf / BASELINE_RTF, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
