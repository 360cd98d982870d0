"""Model loading & conversion caching: assemble a VoiceConverter from an
asset directory.

Replaces the reference's load/dispatch trio (src/rvc.py: Config/load_hubert/
get_vc).  First load converts torch checkpoints to numpy pytrees and caches
them as .npz next to the source file; subsequent loads are torch-free.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional

import numpy as np

from ..io.assets import AssetStore
from ..retrieval.faiss_io import read_faiss_index
from ..retrieval.knn import Retriever
from ..utils.config import RuntimeConfig, default_config
from .f0 import F0Estimator
from .vc import VoiceConverter


def _npz_cache_path(src: str) -> str:
    return src + ".aicg.npz"


def load_rvc_params(pth_path: str):
    from ..convert.rvc_convert import load_params_npz, load_rvc_checkpoint, save_params_npz

    cache = _npz_cache_path(pth_path)
    if os.path.exists(cache) and os.path.getmtime(cache) >= os.path.getmtime(pth_path):
        try:
            return load_params_npz(cache)
        except Exception:
            pass  # partial/corrupt cache — rebuild from the checkpoint
    params, cfg = load_rvc_checkpoint(pth_path)
    try:
        save_params_npz(cache, params, cfg)
    except OSError:
        pass
    return params, cfg


def _flatten(tree, prefix=""):
    flat = {}
    for key, value in tree.items():
        name = f"{prefix}.{key}" if prefix else key
        if isinstance(value, dict):
            flat.update(_flatten(value, name))
        else:
            flat[name] = value
    return flat


def _load_tree_cached(src: str, convert_fn):
    from ..convert.torch_reader import nest

    cache = _npz_cache_path(src)
    if os.path.exists(cache) and os.path.getmtime(cache) >= os.path.getmtime(src):
        try:
            data = np.load(cache)
            return nest({k: data[k] for k in data.files})
        except Exception:
            # a concurrent writer's partial file, or stale corruption —
            # fall through to the real checkpoint (two serving lanes loading
            # the same voice raced exactly here before the atomic write)
            pass
    tree = convert_fn(src)
    try:
        _atomic_savez(cache, **_flatten(tree))
    except OSError:
        pass
    return tree


def _atomic_savez(cache: str, **arrays) -> None:
    """np.savez via unique temp + rename: concurrent lanes/processes must
    never observe a partially written npz (BadZipFile on read)."""
    import tempfile

    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(cache) or ".",
        prefix=os.path.basename(cache) + ".", suffix=".tmp~",
    )
    try:
        # keep the umask-derived mode a plain open() would give (mkstemp
        # creates 0600; shared model caches may be read by other uids)
        um = os.umask(0)
        os.umask(um)
        os.fchmod(fd, 0o666 & ~um)
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, cache)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


@lru_cache(maxsize=4)
def load_hubert_params(path: str):
    from ..convert.hubert_convert import load_hubert_checkpoint

    return _load_tree_cached(path, load_hubert_checkpoint)


@lru_cache(maxsize=4)
def load_rmvpe_params(path: str):
    from ..convert.torch_reader import load_torch_state, state_dict_to_tree

    def convert(p):
        return state_dict_to_tree(load_torch_state(p))

    return _load_tree_cached(path, convert)


def build_voice_converter(
    store: AssetStore,
    voice_model: str,
    runtime: Optional[RuntimeConfig] = None,
    exact_search: bool = True,
    shard=None,
    data_parallel: int = 1,
) -> VoiceConverter:
    pth_path, index_path = store.rvc_model_paths(voice_model)
    synth_params, synth_cfg = load_rvc_params(pth_path)

    hubert_path = store.hubert_path()
    if not os.path.exists(hubert_path):
        raise FileNotFoundError(
            f"{hubert_path} missing — run `aicovergen-download` or place hubert_base.pt there"
        )
    hubert_params = load_hubert_params(hubert_path)

    rmvpe_params = None
    if os.path.exists(store.rmvpe_path()):
        rmvpe_params = load_rmvpe_params(store.rmvpe_path())

    retriever = None
    if index_path and os.path.exists(index_path):
        retriever = Retriever(read_faiss_index(index_path), exact=exact_search)

    runtime = runtime or default_config()
    if runtime.use_bf16:
        # bf16 on the MXU, like the reference's fp16-on-CUDA default
        # (src/rvc.py:29-75); norm stats / softmax / f0 phase stay fp32
        # inside the ops (models/layers.py), and the rmvpe BiGRU + decode
        # keep fp32 for pitch accuracy.
        from ..utils.precision import cast_floats

        dtype = runtime.compute_dtype
        synth_params = cast_floats(synth_params, dtype)
        hubert_params = cast_floats(hubert_params, dtype)

    # tensor parallelism on the serving path: when the mesh carries a
    # "model" axis (> 1), place HuBERT / text-encoder weights with
    # Megatron-style shardings so GSPMD runs the wide matmuls across chips
    # even at segment-batch 1 (single-song latency, SURVEY §2.2)
    mesh = getattr(shard, "mesh", None) if shard is not None else None
    from ..parallel.tp import hubert_tp_spec, mesh_model_parallel, synth_tp_spec, tp_place

    if mesh_model_parallel(mesh) > 1:
        hubert_params = tp_place(hubert_params, mesh, hubert_tp_spec)
        synth_params = tp_place(synth_params, mesh, synth_tp_spec)

    return VoiceConverter(
        synth_params=synth_params,
        synth_cfg=synth_cfg,
        hubert_params=hubert_params,
        f0_estimator=F0Estimator(
            rmvpe_params=rmvpe_params,
            compute_dtype=runtime.compute_dtype if runtime.use_bf16 else None,
        ),
        retriever=retriever,
        runtime=runtime,
        shard=shard,
        data_parallel=data_parallel,
    )
