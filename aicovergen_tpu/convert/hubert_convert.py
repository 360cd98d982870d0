"""HuBERT checkpoint converters -> canonical (transformers-style) pytree.

Two source formats:
  * fairseq ``hubert_base.pt`` — the asset the reference downloads
    (reference src/download_models.py:26-28, loaded via fairseq at
    src/rvc.py:98-109).  Contains {'model': state_dict, ...} with fairseq
    naming, including the v1 ``final_proj`` (768 -> 256).
  * a transformers HubertModel state_dict (already canonical naming).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .torch_reader import fold_weight_norm, load_torch_state, nest, state_dict_to_tree

# fairseq -> canonical key fragments
_FAIRSEQ_RENAMES = [
    ("post_extract_proj", "feature_projection.projection"),
    ("encoder.pos_conv.0", "encoder.pos_conv_embed.conv"),
    ("self_attn.k_proj", "attention.k_proj"),
    ("self_attn.q_proj", "attention.q_proj"),
    ("self_attn.v_proj", "attention.v_proj"),
    ("self_attn.out_proj", "attention.out_proj"),
    ("self_attn_layer_norm", "layer_norm"),
    ("fc1", "feed_forward.intermediate_dense"),
    ("fc2", "feed_forward.output_dense"),
]

_FAIRSEQ_DROP_PREFIXES = ("label_embs_concat", "mask_emb")


def _rename_fairseq_key(key: str) -> str | None:
    if any(key.startswith(p) for p in _FAIRSEQ_DROP_PREFIXES):
        return None
    # conv frontend: feature_extractor.conv_layers.N.0.* -> .N.conv.*
    #                feature_extractor.conv_layers.0.2.* -> .0.layer_norm.*
    if key.startswith("feature_extractor.conv_layers."):
        parts = key.split(".")
        idx, sub = parts[2], parts[3]
        tail = ".".join(parts[4:])
        if sub == "0":
            return f"feature_extractor.conv_layers.{idx}.conv.{tail}"
        return f"feature_extractor.conv_layers.{idx}.layer_norm.{tail}"
    # the post-extractor layer norm lives at top-level "layer_norm" in fairseq
    if key.startswith("layer_norm."):
        return "feature_projection." + key
    for old, new in _FAIRSEQ_RENAMES:
        if old in key:
            key = key.replace(old, new)
            break
    return key


def fairseq_state_to_tree(state: Dict[str, np.ndarray]) -> dict:
    flat = {}
    for key, value in state.items():
        new = _rename_fairseq_key(key)
        if new is not None:
            flat[new] = np.asarray(value, dtype=np.float32)
    return nest(fold_weight_norm(flat))


def load_hubert_checkpoint(path: str) -> dict:
    """Load either a fairseq hubert_base.pt or a transformers state dict."""
    ckpt = load_torch_state(path)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        state = {k: v.float().numpy() for k, v in ckpt["model"].items()}
        return fairseq_state_to_tree(state)
    state = ckpt.state_dict() if hasattr(ckpt, "state_dict") else ckpt
    return state_dict_to_tree(state)


def transformers_state_to_tree(state) -> dict:
    """Convert a transformers HubertModel state_dict (torch tensors or numpy)."""
    flat = {}
    for key, value in state.items():
        if key.endswith("num_batches_tracked") or key.endswith("masked_spec_embed"):
            continue
        flat[key] = np.asarray(
            value.detach().cpu().float().numpy() if hasattr(value, "detach") else value
        )
    return nest(fold_weight_norm(flat))
