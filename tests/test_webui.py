"""Web UI server tests: endpoints, job queue plumbing, upload handling."""

import io
import json
import os
import threading
import urllib.request
import zipfile

import numpy as np
import pytest

from aicovergen_tpu.api import webui
from aicovergen_tpu.io.assets import AssetStore



pytestmark = pytest.mark.slow

@pytest.fixture()
def server(tmp_path):
    base = str(tmp_path)
    store = AssetStore(base)
    os.makedirs(os.path.join(store.rvc_models_dir, "VoiceA"))
    os.makedirs(store.output_dir, exist_ok=True)
    with open(os.path.join(store.output_dir, "x.wav"), "wb") as f:
        f.write(b"RIFF")
    srv = webui.serve(base, host="127.0.0.1", port=0, start_worker=False)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, store, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.read()


def test_index_and_models(server):
    _srv, _store, base = server
    page = _get(base + "/").decode()
    assert "AICoverGen" in page and "Generate" in page
    models = json.loads(_get(base + "/api/models"))
    assert models == ["VoiceA"]
    pub = json.loads(_get(base + "/api/public_models"))
    assert "voice_models" in pub


def test_generate_enqueues_job(server):
    _srv, _store, base = server
    req = urllib.request.Request(
        base + "/api/generate",
        data=json.dumps({"song_input": "x", "voice_model": "VoiceA"}).encode(),
        method="POST",
    )
    job = json.loads(_get_resp(req))
    status = json.loads(_get(base + "/api/job/" + job["job_id"]))
    assert status["status"] == "queued"
    missing = urllib.request.Request(base + "/api/job/nope")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(missing)
    assert exc.value.code == 404


def _get_resp(req):
    with urllib.request.urlopen(req) as r:
        return r.read()


def test_audio_path_traversal_blocked(server):
    _srv, store, base = server
    # inside song_output: OK
    ok = base + "/api/audio?path=" + urllib.parse.quote(
        os.path.join(store.output_dir, "x.wav")
    )
    assert _get(ok) == b"RIFF"
    # outside: blocked
    bad = base + "/api/audio?path=" + urllib.parse.quote("/etc/passwd")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(bad)
    assert exc.value.code == 404


import urllib.parse  # noqa: E402
import urllib.error  # noqa: E402


def test_upload_pth(server):
    _srv, store, base = server
    boundary = "XBOUNDARY"
    payload = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="name"\r\n\r\nNewVoice\r\n'
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; filename="model.pth"\r\n'
        "Content-Type: application/octet-stream\r\n\r\n"
    ).encode() + b"FAKEWEIGHTS" + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        base + "/api/upload_model",
        data=payload,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        method="POST",
    )
    resp = _get_resp(req).decode()
    assert "successfully uploaded" in resp
    assert os.path.exists(os.path.join(store.rvc_models_dir, "NewVoice", "model.pth"))


def test_extract_model_zip_heuristics(tmp_path):
    """.pth > 40MB kept as model, .index > 100KB kept, nested dirs cleaned
    (reference webui.py:41-67)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("nested/model.pth", b"\0" * (41 * 1024 * 1024))
        zf.writestr("nested/added.index", b"\0" * (200 * 1024))
        zf.writestr("nested/readme.txt", b"hi")
    dest = str(tmp_path / "MyVoice")
    webui.extract_model_zip(buf.getvalue(), dest)
    assert sorted(os.listdir(dest)) == ["added.index", "model.pth"]


def test_extract_model_zip_rejects_no_model(tmp_path):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("small.pth", b"\0" * 100)
    with pytest.raises(ValueError, match="No .pth model file"):
        webui.extract_model_zip(buf.getvalue(), str(tmp_path / "Bad"))
    assert not os.path.exists(str(tmp_path / "Bad"))


def test_safe_model_name_rejects_traversal():
    from aicovergen_tpu.api.webui import _safe_model_name

    assert _safe_model_name("My Voice (v2)") == "My Voice (v2)"
    for bad in ("../x", "a/b", "a\\b", "..", ". ", "", "x/../../y"):
        with pytest.raises(ValueError):
            _safe_model_name(bad)


def test_multi_worker_queue_drains_concurrently(tmp_path):
    """Two workers pull jobs from the shared queue in parallel (multi-song
    throughput serving; the reference's Gradio queue was serial)."""
    import time as _time

    from aicovergen_tpu.api import webui

    starts, barrier = [], threading.Barrier(2, timeout=10)

    class FakePipeline:
        def song_cover(self, progress=None, **params):
            starts.append(_time.monotonic())
            barrier.wait()  # both jobs must be in-flight at once
            return f"/tmp/out_{params['song_input']}.wav"

    board = webui.JobBoard()
    pipeline = FakePipeline()
    for _ in range(2):
        threading.Thread(
            target=webui._worker, args=(pipeline, board), daemon=True
        ).start()

    ids = [
        board.submit({"song_input": str(i), "voice_model": "v"}) for i in range(2)
    ]

    deadline = _time.monotonic() + 15
    while _time.monotonic() < deadline:
        if all(board.jobs[j]["status"] == "done" for j in ids):
            break
        _time.sleep(0.05)
    assert all(board.jobs[j]["status"] == "done" for j in ids), [
        board.jobs[j] for j in ids
    ]
    assert len(starts) == 2


def test_cli_server_mode(tmp_path):
    """`aicovergen-cli --server URL` submits the cover to a running daemon,
    polls the job, and reports the daemon's output path (the warm-process
    steady-state path for CLI covers; see api/cli.py::run_via_server)."""
    from aicovergen_tpu.api import cli, webui

    base_dir = str(tmp_path)
    store = AssetStore(base_dir)
    os.makedirs(store.output_dir, exist_ok=True)
    result_path = os.path.join(store.output_dir, "cover (VoiceA Ver).wav")
    with open(result_path, "wb") as f:
        f.write(b"RIFF")

    seen = {}

    class FakePipeline:
        def song_cover(self, progress=None, **params):
            seen.update(params)
            if progress:
                progress(0.5, "[~] halfway")
            return result_path

    srv = webui.serve(base_dir, host="127.0.0.1", port=0, start_worker=False)
    threading.Thread(
        target=webui._worker, args=(FakePipeline(), srv.job_board), daemon=True
    ).start()
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        rc = cli.main([
            "-i", "song.wav", "-dir", "VoiceA", "-p", "1",
            "-palgo", "mangio-crepe", "--server", url,
        ])
        assert rc == 0
        assert seen["voice_model"] == "VoiceA"
        assert seen["pitch_change"] == 1
        assert seen["f0_method"] == "mangio-crepe"
    finally:
        srv.shutdown()
