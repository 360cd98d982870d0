"""HuBERT-base content encoder in functional JAX.

Replaces the fairseq dependency of the reference (src/rvc.py:98-109;
feature extraction at src/vc_infer_pipeline.py:398-406).  The architecture
is HuBERT-base (wav2vec2-style): a 7-layer strided conv waveform frontend
(320x downsampling to 50 Hz frames), a grouped positional conv embedding,
and 12 post-LN transformer layers (768 hidden, 12 heads, 3072 FFN, erf-GELU).

Layer-tap contract (reference vc_infer_pipeline.py:398-406):
  * v1 models: features = final_proj(layer-9 output)   (output_layer=9, 256-d)
  * v2 models: features = layer-12 output              (output_layer=12, 768-d)

Canonical parameter naming follows transformers' HubertModel; the fairseq
``hubert_base.pt`` checkpoint is renamed into this scheme by
convert/hubert_convert.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .layers import conv1d, group_norm, layer_norm, linear

# (out_channels, kernel, stride) per conv frontend layer — hubert-base config
CONV_LAYERS = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 2, 2), (512, 2, 2))
N_LAYERS = 12
N_HEADS = 12
HIDDEN = 768


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def feature_extractor(p, audio: jnp.ndarray, valid_samples=None) -> jnp.ndarray:
    """(B, samples) -> (B, 512, frames); group-norm on the first layer only
    (feat_extract_norm='group').

    valid_samples (B,) makes zero-padded bucket inputs produce the same
    values as an unpadded run on the valid prefix: GN statistics are masked
    to valid frames and each layer's invalid tail is re-zeroed.
    """
    x = audio[:, None, :]
    valid = valid_samples
    for i, (_ch, k, s) in enumerate(CONV_LAYERS):
        li = p["conv_layers"][str(i)]
        x = conv1d(li["conv"], x, stride=s)
        if valid is not None:
            valid = (valid - k) // s + 1
        if i == 0:
            x = group_norm(li["layer_norm"], x, num_groups=512, valid_len=valid)
        x = _gelu(x)
        if valid is not None:
            mask = jnp.arange(x.shape[-1])[None, None, :] < valid[:, None, None]
            x = jnp.where(mask, x, 0.0)
    return x


def _attention(p, x: jnp.ndarray, key_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Standard MHA on (B, T, D); key_mask (B, T) True=valid (fairseq
    padding_mask semantics: padded keys excluded from softmax)."""
    b, t, d = x.shape
    hd = d // N_HEADS
    q = linear(p["q_proj"], x).reshape(b, t, N_HEADS, hd).swapaxes(1, 2)
    k = linear(p["k_proj"], x).reshape(b, t, N_HEADS, hd).swapaxes(1, 2)
    v = linear(p["v_proj"], x).reshape(b, t, N_HEADS, hd).swapaxes(1, 2)
    scores = jnp.einsum(
        "bhtd,bhsd->bhts",
        q / jnp.sqrt(jnp.asarray(hd, x.dtype)),
        k,
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
    )
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v).swapaxes(1, 2).reshape(b, t, d)
    return linear(p["out_proj"], out)


def _encoder_layer(p, x: jnp.ndarray, key_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Post-LN transformer layer (do_stable_layer_norm=False)."""
    x = layer_norm(p["layer_norm"], x + _attention(p["attention"], x, key_mask))
    h = _gelu(linear(p["feed_forward"]["intermediate_dense"], x))
    h = linear(p["feed_forward"]["output_dense"], h)
    return layer_norm(p["final_layer_norm"], x + h)


def conv_output_frames(samples: int) -> int:
    """Frame count of the conv frontend for a given sample count."""
    t = samples
    for _ch, k, s in CONV_LAYERS:
        t = (t - k) // s + 1
    return t


def pos_conv_embed(p, x: jnp.ndarray) -> jnp.ndarray:
    """Grouped conv positional embedding: k=128, pad=64, groups=16, then
    SamePad trim of the extra sample (even kernel) and GELU."""
    h = jnp.swapaxes(x, 1, 2)
    h = conv1d(p["conv"], h, padding=64, groups=16)
    h = h[:, :, :-1]
    return _gelu(jnp.swapaxes(h, 1, 2))


def hubert_extract(
    params,
    audio: jnp.ndarray,
    output_layer: int = 12,
    apply_final_proj: bool = False,
    valid_samples: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, samples) float audio at 16 kHz -> (B, frames, 768|256) features.

    output_layer counts applied transformer layers (fairseq convention:
    v1 taps 9, v2 taps 12).  valid_samples (B,) gives the true (unpadded)
    sample counts when the batch is zero-padded to a static bucket shape;
    GN statistics and attention keys are restricted to the valid prefix so
    valid-frame features match an unpadded run (fairseq padding_mask
    semantics).
    """
    feats = feature_extractor(params["feature_extractor"], audio, valid_samples=valid_samples)
    x = jnp.swapaxes(feats, 1, 2)  # (B, T, 512)
    key_mask = None
    if valid_samples is not None:
        v = valid_samples
        for _ch, k, s in CONV_LAYERS:
            v = (v - k) // s + 1
        key_mask = jnp.arange(x.shape[1])[None, :] < v[:, None]
    x = layer_norm(params["feature_projection"]["layer_norm"], x)
    x = linear(params["feature_projection"]["projection"], x)

    enc = params["encoder"]
    x = x + pos_conv_embed(enc["pos_conv_embed"], x)
    x = layer_norm(enc["layer_norm"], x)
    # clamp to the checkpoint's actual depth: the released hubert_base has 12
    # layers, but layer-pruned checkpoints (dryrun/test tiny assets) run the
    # same code at their own depth.
    # The layers run as ONE lax.scan over stacked per-layer params, not an
    # unrolled loop: identical numerics (same op order per layer), but the
    # HLO contains the layer body once — the compiled TPU executable shrank
    # from ~28 MB to a few MB, which matters twice on a remote backend
    # (compile time AND the ~1 min/100 MB per-process executable load that
    # dominates cold start).  The stack itself is a device-side copy of the
    # weights per call (~0.4 ms of HBM traffic at batch scale — noise).
    n_layers = min(output_layer, len(enc["layers"]))
    layer_list = [enc["layers"][str(i)] for i in range(n_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_list)

    def body(h, lp):
        return _encoder_layer(lp, h, key_mask), None

    x, _ = jax.lax.scan(body, x, stacked)

    if apply_final_proj:
        x = linear(params["final_proj"], x)
    return x


def hubert_features(
    params, audio: jnp.ndarray, version: str = "v2", valid_samples=None
) -> jnp.ndarray:
    """The exact feature contract of the reference VC pipeline
    (vc_infer_pipeline.py:398-406)."""
    if version == "v1":
        return hubert_extract(
            params, audio, output_layer=9, apply_final_proj=True, valid_samples=valid_samples
        )
    return hubert_extract(
        params, audio, output_layer=12, apply_final_proj=False, valid_samples=valid_samples
    )
