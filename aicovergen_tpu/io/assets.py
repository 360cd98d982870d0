"""Model asset management: directory layout, registries, download.

Directory layout mirrors the reference so existing model collections drop in
(reference src/main.py:24-28, src/download_models.py):

  <base>/rvc_models/<voice_name>/{*.pth, *.index}   per-voice checkpoints
  <base>/rvc_models/{hubert_base.pt, rmvpe.pt}      shared encoders
  <base>/mdxnet_models/*.onnx                       separation checkpoints
  <base>/song_output/<song_id>/                     stage cache

Downloads are gated on network availability (zero-egress environments get a
clear error instead of a hang).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional, Tuple

from ..utils.hashing import file_hash_md5_tail
from .mdx_registry import MDX_REGISTRY

MDX_RELEASE_URL = "https://github.com/TRvlvr/model_repo/releases/download/all_public_uvr_models/"
RVC_ASSETS_URL = "https://huggingface.co/lj1995/VoiceConversionWebUI/resolve/main/"

MDX_MODEL_FILES = (
    "UVR-MDX-NET-Voc_FT.onnx",
    "UVR_MDXNET_KARA_2.onnx",
    "Reverb_HQ_By_FoxJoy.onnx",
)
RVC_ASSET_FILES = ("hubert_base.pt", "rmvpe.pt")


def default_base_dir() -> str:
    return os.environ.get("AICG_BASE_DIR", os.getcwd())


@dataclass
class AssetStore:
    base_dir: str

    @property
    def rvc_models_dir(self) -> str:
        return os.path.join(self.base_dir, "rvc_models")

    @property
    def mdx_models_dir(self) -> str:
        return os.path.join(self.base_dir, "mdxnet_models")

    @property
    def output_dir(self) -> str:
        return os.path.join(self.base_dir, "song_output")

    def rvc_model_paths(self, voice_model: str) -> Tuple[str, str]:
        """(pth_path, index_path_or_empty) — reference main.py:88-102."""
        model_dir = os.path.join(self.rvc_models_dir, voice_model)
        if not os.path.isdir(model_dir):
            raise FileNotFoundError(f"voice model directory does not exist: {model_dir}")
        pth, index = None, None
        for name in sorted(os.listdir(model_dir)):
            ext = os.path.splitext(name)[1]
            if ext == ".pth":
                pth = os.path.join(model_dir, name)
            elif ext == ".index":
                index = os.path.join(model_dir, name)
        if pth is None:
            raise FileNotFoundError(f"no .pth model file exists in {model_dir}")
        return pth, index or ""

    def list_voice_models(self):
        if not os.path.isdir(self.rvc_models_dir):
            return []
        out = []
        for name in sorted(os.listdir(self.rvc_models_dir)):
            # dot-dirs are internal (e.g. ".warmup" synthetic voice) and stay
            # out of user-facing listings; rvc_model_paths still resolves them
            if name.startswith("."):
                continue
            if os.path.isdir(os.path.join(self.rvc_models_dir, name)):
                out.append(name)
        return out

    def mdx_model_path(self, filename: str) -> str:
        return os.path.join(self.mdx_models_dir, filename)

    def hubert_path(self) -> str:
        return os.path.join(self.rvc_models_dir, "hubert_base.pt")

    def rmvpe_path(self) -> str:
        return os.path.join(self.rvc_models_dir, "rmvpe.pt")


def mdx_params_for(model_path: str):
    """Registry lookup by tail-md5 (reference src/mdx.py:245-254) ->
    pipeline.separate.MDXParams.  Unknown checkpoints can supply a sidecar
    ``<model>.json`` with the same fields (custom-model escape hatch the
    reference lacks)."""
    from ..pipeline.separate import MDXParams

    h = file_hash_md5_tail(model_path)
    entry = MDX_REGISTRY.get(h)
    if entry is None:
        sidecar = os.path.splitext(model_path)[0] + ".json"
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                entry = json.load(f)
        else:
            raise KeyError(
                f"unknown MDX model hash {h} for {model_path} "
                f"(provide hyperparameters in {sidecar})"
            )
    if "config_yaml" in entry:
        raise ValueError(
            f"{model_path} is an MDX23C-style checkpoint ({entry['config_yaml']}); "
            "not supported by this pipeline (nor by the reference)"
        )
    return MDXParams(
        dim_f=entry["dim_f"],
        dim_t=2 ** entry["dim_t_log2"],
        n_fft=entry["n_fft"],
        stem_name=entry["primary_stem"],
        compensation=entry["compensate"],
    )


def have_network() -> bool:
    import socket

    try:
        socket.create_connection(("huggingface.co", 443), timeout=3).close()
        return True
    except OSError:
        return False


def download_file(url: str, dest: str) -> None:
    import urllib.request

    os.makedirs(os.path.dirname(dest), exist_ok=True)
    print(f"[~] downloading {url} -> {dest}")
    urllib.request.urlretrieve(url, dest)


def download_models(base_dir: Optional[str] = None) -> None:
    """download_models.py equivalent: 3 MDX ONNX + hubert_base.pt + rmvpe.pt."""
    store = AssetStore(base_dir or default_base_dir())
    if not have_network():
        raise RuntimeError(
            "no network connectivity — place the model files manually under "
            f"{store.mdx_models_dir} and {store.rvc_models_dir}"
        )
    for name in MDX_MODEL_FILES:
        dest = store.mdx_model_path(name)
        if not os.path.exists(dest):
            download_file(MDX_RELEASE_URL + name, dest)
    for name in RVC_ASSET_FILES:
        dest = os.path.join(store.rvc_models_dir, name)
        if not os.path.exists(dest):
            download_file(RVC_ASSETS_URL + name, dest)
    print("[+] all model assets present")


def download_main() -> None:
    download_models()


def load_public_models_index(base_dir: Optional[str] = None) -> dict:
    """The public voice-model catalog (reference rvc_models/public_models.json
    drives the WebUI download tab, webui.py:30-38).  A user copy in
    rvc_models/ overrides the 56-entry catalog shipped as package data."""
    store = AssetStore(base_dir or default_base_dir())
    path = os.path.join(store.rvc_models_dir, "public_models.json")
    if not os.path.exists(path):
        path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", "public_models.json")
    if not os.path.exists(path):
        return {"voice_models": [], "tags": {}}
    with open(path, encoding="utf-8") as f:
        return json.load(f)
