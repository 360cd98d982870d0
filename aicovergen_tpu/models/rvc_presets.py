"""Train-from-scratch RVC architecture presets.

Hyperparameter data transcribed from the reference's per-sample-rate training
configs (reference src/configs/{32k,40k,48k}[_v2].json) — at inference the
architecture always comes from the checkpoint's own cpt["config"]
(convert/rvc_convert.py), these presets exist to *initialize* a new voice
with parallel.train / train.dataset.

segment_size is stored in FRAMES (samples / hop), matching RVCConfig and the
slicing in models/rvc_train.rand_slice_segments; the reference configs store
samples (train.segment_size, e.g. 12800 at hop 400 -> 32 frames).
"""

from __future__ import annotations

from .rvc import RVCConfig

# per-SR data parameters: (hop, filter_length, segment_samples)
_SR_DATA = {
    32000: (320, 1024, 12800),
    40000: (400, 2048, 12800),
    48000: (480, 2048, 11520),
}

# upsampler stacks per (sr, version)
_UPSAMPLE = {
    (32000, "v1"): ((10, 4, 2, 2, 2), (16, 16, 4, 4, 4)),
    (32000, "v2"): ((10, 8, 2, 2), (20, 16, 4, 4)),
    (40000, "v1"): ((10, 10, 2, 2), (16, 16, 4, 4)),
    (40000, "v2"): ((10, 10, 2, 2), (16, 16, 4, 4)),
    (48000, "v1"): ((10, 6, 2, 2, 2), (16, 16, 4, 4, 4)),
    (48000, "v2"): ((12, 10, 2, 2), (24, 20, 4, 4)),
}

# 48k v2 uses a larger training segment (17280 samples = 36 frames)
_SEGMENT_OVERRIDE = {(48000, "v2"): 17280}


def rvc_preset(sr: str | int = "40k", version: str = "v2", if_f0: bool = True) -> RVCConfig:
    """Named architecture preset: rvc_preset("48k", "v2") etc."""
    if isinstance(sr, str):
        sr = {"32k": 32000, "40k": 40000, "48k": 48000}.get(sr.lower(), sr)
    if sr not in _SR_DATA:
        raise ValueError(f"unsupported sample rate {sr} (32k/40k/48k)")
    if version not in ("v1", "v2"):
        raise ValueError(f"unknown version {version!r}")
    hop, filter_length, segment_samples = _SR_DATA[sr]
    segment_samples = _SEGMENT_OVERRIDE.get((sr, version), segment_samples)
    rates, kernels = _UPSAMPLE[(sr, version)]
    return RVCConfig(
        spec_channels=filter_length // 2 + 1,
        segment_size=segment_samples // hop,
        inter_channels=192,
        hidden_channels=192,
        filter_channels=768,
        n_heads=2,
        n_layers=6,
        kernel_size=3,
        p_dropout=0.0,
        resblock="1",
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        upsample_rates=rates,
        upsample_initial_channel=512,
        upsample_kernel_sizes=kernels,
        spk_embed_dim=109,
        gin_channels=256,
        sr=sr,
        version=version,
        if_f0=if_f0,
    )
