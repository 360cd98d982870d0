"""Model-free warmup: a hidden synthetic v2-40k voice lets serving hosts
(webui --warmup auto, Predictor.setup) pay compile/executable-load costs
before any user model exists (VERDICT r03 item 4; the reference has no
equivalent — it pays CUDA init per run)."""

import os

import pytest

from aicovergen_tpu.io.assets import AssetStore
from aicovergen_tpu.pipeline.cover import CoverPipeline
from aicovergen_tpu.pipeline.loader import load_rvc_params


def test_ensure_warmup_voice_creates_hidden_v2_40k(tmp_path):
    store = AssetStore(str(tmp_path))
    os.makedirs(store.rvc_models_dir, exist_ok=True)
    pipe = CoverPipeline(store=store)
    name = pipe._ensure_warmup_voice()
    assert name == ".warmup"

    # resolvable by the store, invisible in user-facing listings
    pth, index = store.rvc_model_paths(name)
    assert os.path.exists(pth) and index == ""
    assert store.list_voice_models() == []

    # loadable as a production v2 + f0 40k checkpoint
    params, cfg = load_rvc_params(pth)
    assert (cfg.version, cfg.if_f0, cfg.sr) == ("v2", True, 40000)
    assert "enc_q" not in params

    # idempotent: second call reuses the file
    mtime = os.path.getmtime(pth)
    assert pipe._ensure_warmup_voice() == name
    assert os.path.getmtime(pth) == mtime


def test_predictor_setup_skips_warmup_without_assets(tmp_path, capsys):
    from aicovergen_tpu.api.predict import Predictor

    p = Predictor(base_dir=str(tmp_path))
    p.setup()  # empty dir: no hubert/MDX assets -> instant, no warmup lines
    out = capsys.readouterr().out
    assert "warming up" not in out


def test_predictor_setup_warmup_disable_env(tmp_path, monkeypatch):
    from aicovergen_tpu.api.predict import Predictor

    monkeypatch.setenv("AICG_PREDICT_WARMUP", "0")
    p = Predictor(base_dir=str(tmp_path))
    p.setup()
    assert hasattr(p, "pipeline")
