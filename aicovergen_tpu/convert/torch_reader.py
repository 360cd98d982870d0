"""torch checkpoint -> numpy pytree conversion.

State dicts become nested dicts split on '.', with weight-norm
reparameterizations (weight_g / weight_v) folded into plain weights — the
reference removes weight norm only at ONNX-export time and pays the
reparameterization cost every forward; we fold once at conversion.

torch is used only here (host-side, one-time); nothing at runtime imports it.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_torch_state(path: str):
    """torch.load a checkpoint on CPU and return it as plain python/numpy."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _to_numpy(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().float().numpy()
    return np.asarray(t)


def fold_weight_norm(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Replace {x.weight_g, x.weight_v} pairs with x.weight = g * v/||v||,
    matching torch._weight_norm(v, g, dim=0)."""
    out = dict(flat)
    for key in list(flat.keys()):
        if key.endswith(".weight_g"):
            base = key[: -len(".weight_g")]
            vkey = base + ".weight_v"
            if vkey in flat:
                g = flat[key]
                v = flat[vkey]
                axes = tuple(range(1, v.ndim))
                norm = np.sqrt(np.sum(np.square(v), axis=axes, keepdims=True))
                out[base + ".weight"] = (g * v / np.maximum(norm, 1e-12)).astype(v.dtype)
                del out[key], out[vkey]
    return out


def nest(flat: Dict[str, np.ndarray]) -> dict:
    """'a.b.0.weight' keys -> nested dict tree {'a': {'b': {'0': {'weight': ...}}}}."""
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def state_dict_to_tree(state_dict, drop_prefixes=(), fold_wn: bool = True) -> dict:
    """Full pipeline: torch state_dict -> numpy -> weight-norm fold -> nest."""
    flat = {}
    for key, value in state_dict.items():
        if any(key.startswith(prefix) for prefix in drop_prefixes):
            continue
        if key.endswith("num_batches_tracked"):
            continue
        flat[key] = _to_numpy(value)
    if fold_wn:
        flat = fold_weight_norm(flat)
    return nest(flat)
