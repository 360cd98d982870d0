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
    matching torch._weight_norm.  The norm dim is inferred from g's shape
    (dim=0 for conv/linear, dim=2 for HuBERT's positional conv).  Also
    handles torch>=2.1 parametrizations naming (original0/original1)."""
    flat = dict(flat)
    # normalize parametrizations naming -> weight_g / weight_v
    for key in list(flat.keys()):
        if ".parametrizations.weight.original0" in key:
            base = key.replace(".parametrizations.weight.original0", "")
            flat[base + ".weight_g"] = flat.pop(key)
        elif ".parametrizations.weight.original1" in key:
            base = key.replace(".parametrizations.weight.original1", "")
            flat[base + ".weight_v"] = flat.pop(key)

    out = dict(flat)
    for key in list(flat.keys()):
        if key.endswith(".weight_g"):
            base = key[: -len(".weight_g")]
            vkey = base + ".weight_v"
            if vkey in flat:
                g = flat[key]
                v = flat[vkey]
                # infer dim: the axis where g is not singleton (g is all-1s
                # except the kept dim); fall back to 0
                dims = [i for i, s in enumerate(np.shape(g)) if s != 1]
                dim = dims[0] if len(dims) == 1 else 0
                axes = tuple(i for i in range(v.ndim) if i != dim)
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
