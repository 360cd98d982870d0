"""Training checkpoints.

Two formats:

  * ``save_rvc_pth`` — exports generator params as an RVC-compatible ``.pth``
    dict {config, weight, f0, version, sr} (the layout of reference
    src/rvc.py:113-131), so a voice trained here loads straight through
    pipeline.loader.load_rvc_params / the reference ecosystem's tooling.
  * ``save_train_state``/``load_train_state`` — full TrainState (generator +
    discriminator + both optimizer states + step) as an .npz for exact
    resume; no torch dependency.
"""

from __future__ import annotations

import json
from typing import Tuple

import numpy as np

from ..models.rvc import RVCConfig


def _flatten(tree, prefix="", out=None):
    out = {} if out is None else out
    for key, value in tree.items():
        name = f"{prefix}.{key}" if prefix else key
        if isinstance(value, dict):
            _flatten(value, name, out)
        else:
            out[name] = np.asarray(value)
    return out


def _cfg_list(cfg: RVCConfig) -> list:
    """RVCConfig -> the cpt["config"] positional list (reference
    src/rvc.py:117-131 ordering)."""
    return [
        cfg.spec_channels, cfg.segment_size, cfg.inter_channels,
        cfg.hidden_channels, cfg.filter_channels, cfg.n_heads, cfg.n_layers,
        cfg.kernel_size, cfg.p_dropout, cfg.resblock,
        list(cfg.resblock_kernel_sizes),
        [list(d) for d in cfg.resblock_dilation_sizes],
        list(cfg.upsample_rates), cfg.upsample_initial_channel,
        list(cfg.upsample_kernel_sizes), cfg.spk_embed_dim, cfg.gin_channels,
        cfg.sr,
    ]


def save_rvc_pth(path: str, gen_params: dict, cfg: RVCConfig, epoch: int = 0) -> None:
    """Generator tree -> inference-loadable .pth (weights fp32, enc_q and
    optimizer state excluded — matching what RVC's release export ships)."""
    import torch

    flat = {
        k: torch.from_numpy(np.array(v, np.float32, copy=True))
        for k, v in _flatten(gen_params).items()
        if not k.startswith("enc_q.")
    }
    cpt = {
        "config": _cfg_list(cfg),
        "weight": flat,
        "f0": 1 if cfg.if_f0 else 0,
        "version": cfg.version,
        "sr": cfg.sr,
        "info": f"{epoch}epoch",
    }
    torch.save(cpt, path)


# ------------------------------------------------------------- full resume


def save_train_state(path: str, state, cfg: RVCConfig) -> None:
    import jax

    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    meta = {
        "treedef": str(treedef),
        "n_leaves": len(leaves),
        "config": json.dumps(
            {k: (list(v) if isinstance(v, tuple) else v) for k, v in cfg.__dict__.items()}
        ),
    }
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_train_state(path: str, template) -> Tuple[object, dict]:
    """Restore a TrainState saved by save_train_state.  `template` is a
    freshly-initialized TrainState with the same architecture; its treedef
    defines the structure the stored leaves rebuild into."""
    import jax

    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode())
    _, treedef = jax.tree.flatten(template)
    leaves = [data[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    if str(treedef) != meta["treedef"]:
        raise ValueError(
            "TrainState structure mismatch: checkpoint was saved with a "
            "different architecture/optimizer configuration"
        )
    state = jax.tree.unflatten(treedef, leaves)
    return state, json.loads(meta["config"])
