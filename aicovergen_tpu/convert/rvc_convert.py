"""RVC .pth checkpoint -> (params pytree, RVCConfig).

Replicates the loader dispatch of the reference (src/rvc.py:112-143):
cpt["config"] carries the architecture, cpt["f0"]/cpt["version"] select one
of the four synthesizer variants, enc_q (training-only posterior encoder) is
dropped, and weights live in cpt["weight"].

Converted trees can be cached as .npz for torch-free startup.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from ..models.rvc import RVCConfig
from .torch_reader import load_torch_state, state_dict_to_tree


def load_rvc_checkpoint(path: str) -> Tuple[dict, RVCConfig]:
    cpt = load_torch_state(path)
    if_f0 = cpt.get("f0", 1) == 1
    version = cpt.get("version", "v1")
    # the phone-embedding width is derivable from the checkpoint itself
    emb_w = cpt["weight"]["enc_p.emb_phone.weight"]
    version = "v2" if emb_w.shape[1] == 768 else "v1"
    cfg = RVCConfig.from_cpt_config(cpt["config"], version=version, if_f0=if_f0)
    params = state_dict_to_tree(cpt["weight"], drop_prefixes=("enc_q.",))
    return params, cfg


def save_params_npz(path: str, params: dict, cfg: RVCConfig) -> None:
    """Flatten a converted tree into an .npz cache with a config header."""
    flat = {}

    def walk(node, prefix):
        for key, value in node.items():
            name = f"{prefix}.{key}" if prefix else key
            if isinstance(value, dict):
                walk(value, name)
            else:
                flat[name] = value

    walk(params, "")
    import json

    meta = {k: (list(v) if isinstance(v, tuple) else v) for k, v in cfg.__dict__.items()}
    flat["__config__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    # atomic: concurrent serving lanes load the same voice; a reader must
    # never see a partial npz (pipeline/loader.py had exactly this race)
    from ..pipeline.loader import _atomic_savez

    _atomic_savez(path, **flat)


def load_params_npz(path: str) -> Tuple[dict, RVCConfig]:
    import json

    from .torch_reader import nest

    data = np.load(path)
    meta = json.loads(bytes(data["__config__"]).decode())
    meta["resblock_kernel_sizes"] = tuple(meta["resblock_kernel_sizes"])
    meta["resblock_dilation_sizes"] = tuple(tuple(d) for d in meta["resblock_dilation_sizes"])
    meta["upsample_rates"] = tuple(meta["upsample_rates"])
    meta["upsample_kernel_sizes"] = tuple(meta["upsample_kernel_sizes"])
    cfg = RVCConfig(**meta)
    flat = {k: data[k] for k in data.files if k != "__config__"}
    return nest(flat), cfg
