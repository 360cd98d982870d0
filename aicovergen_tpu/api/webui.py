"""Web UI: a dependency-free HTTP server replacing the reference's Gradio app
(reference src/webui.py): generate covers with full parameter control and
live progress, browse/download public voice models, upload local models.

Endpoints:
  GET  /                      single-page app
  GET  /api/models            installed voice models
  GET  /api/public_models     public catalog (rvc_models/public_models.json)
  POST /api/generate          start a cover job -> {job_id}
  GET  /api/job/<id>          job progress/status/result
  GET  /api/audio?path=...    stream a generated file (song_output only)
  POST /api/download_model    {url, name} -> fetch + extract a voice model
  POST /api/upload_model      multipart zip / .pth(+.index) upload

Jobs run on a single worker thread (the Gradio queue semantics,
reference webui.py:317-322).
"""

from __future__ import annotations

import io
import json
import os
import queue
import re
import shutil
import threading
import traceback
import urllib.parse
import urllib.request
import uuid
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

from ..io.assets import AssetStore, default_base_dir, load_public_models_index
from ..utils.config import default_config

class JobBoard:
    """Per-server job registry + queue.  One instance per serve() call, so
    concurrently running servers (e.g. in tests) never steal each other's
    jobs — the previous module-global queue let a worker thread from one
    server consume another server's submissions."""

    def __init__(self) -> None:
        self.jobs: Dict[str, dict] = {}
        self.queue: "queue.Queue[tuple]" = queue.Queue()
        # set by workers when the queue empties; the dedicated drain thread
        # (_drain_worker) waits on it so cache joins never block serving
        self.idle_event = threading.Event()

    def submit(self, params: dict) -> str:
        job_id = uuid.uuid4().hex[:12]
        self.jobs[job_id] = {"status": "queued", "progress": 0.0, "message": ""}
        self.queue.put((job_id, params))
        return job_id


def _worker(pipeline, board: JobBoard, device=None):
    """Serving worker.  `device` pins the worker's un-annotated jax ops to
    its lane's device (job-per-submesh posture, parallel/serving.py); None
    keeps the process default (whole-mesh posture)."""
    import contextlib

    def _pin():
        if device is None:
            return contextlib.nullcontext()
        import jax

        return jax.default_device(device)

    while True:
        job_id, params = board.queue.get()
        job = board.jobs[job_id]

        def progress(percent, message, job=job):
            job["progress"] = percent
            job["message"] = message

        try:
            job["status"] = "running"
            with _pin():
                path = pipeline.song_cover(progress=progress, **params)
            from ..pipeline.f0 import f0_divergence_warnings

            # result/warnings land BEFORE status: a client that observes
            # status=="done" must be able to read the full payload (the CLI's
            # run_via_server polls without holding any lock)
            job["warnings"] = f0_divergence_warnings(params.get("f0_method"))
            job["result"] = path
            job["progress"] = 1.0
            job["status"] = "done"
        except Exception as e:  # surface like gr.Error (reference main.py:81-85)
            job["status"] = "error"
            job["message"] = str(e)
            traceback.print_exc()
        # idle-time drain: with the write-behind stem cache the queue being
        # empty is the cheap moment to join deferred writes.  The join itself
        # runs on a DEDICATED low-priority thread (_drain_worker), never on a
        # serving worker: an unbounded join of a slow tunnel's full cache
        # backlog here would block this worker — and a job arriving just
        # after the queue.empty() check would wait behind it even though the
        # device is idle.
        if board.queue.empty():
            board.idle_event.set()


def _drain_worker(pipelines, board: JobBoard):
    """Join deferred stem-cache writes whenever the serving queue goes idle
    (and surface any writer failure in the server log instead of a later
    job).  Runs beside the serving workers so a drain of a slow tunnel's
    backlog never delays a newly arrived job.  `pipelines` is one pipeline
    or a list (one per submesh lane)."""
    if not isinstance(pipelines, (list, tuple)):
        pipelines = [pipelines]
    drains = [
        d for d in (getattr(p, "drain_cache", None) for p in pipelines) if d
    ]
    if not drains:
        return
    while True:
        board.idle_event.wait()
        board.idle_event.clear()
        for drain in drains:
            try:
                drain()
            except Exception:
                traceback.print_exc()


def extract_model_zip(zip_bytes: bytes, extraction_folder: str) -> None:
    """Zip extraction with the reference's file heuristics: .pth > 40 MB is
    the model, .index > 100 KB is the index (reference webui.py:41-67)."""
    if os.path.exists(extraction_folder):
        raise ValueError(f"Voice model directory {extraction_folder} already exists!")
    os.makedirs(extraction_folder)
    with zipfile.ZipFile(io.BytesIO(zip_bytes)) as zf:
        zf.extractall(extraction_folder)

    index_filepath, model_filepath = None, None
    for root, _dirs, files in os.walk(extraction_folder):
        for name in files:
            full = os.path.join(root, name)
            if name.endswith(".index") and os.stat(full).st_size > 1024 * 100:
                index_filepath = full
            if name.endswith(".pth") and os.stat(full).st_size > 1024 * 1024 * 40:
                model_filepath = full
    if model_filepath is None:
        shutil.rmtree(extraction_folder)
        raise ValueError("No .pth model file was found in the extracted zip.")
    for path in filter(None, (model_filepath, index_filepath)):
        os.rename(path, os.path.join(extraction_folder, os.path.basename(path)))
    # clean up unnecessary nested folders (reference webui.py:61-66)
    for name in os.listdir(extraction_folder):
        full = os.path.join(extraction_folder, name)
        if os.path.isdir(full):
            shutil.rmtree(full)


def _safe_model_name(name: str) -> str:
    """Reject path separators / traversal in user-supplied model names —
    they are joined into rvc_models_dir (and failures rmtree the computed
    folder), so '../x' must never pass."""
    if not name or not re.fullmatch(r"[\w .\-()\[\]]+", name) or name.strip(". ") == "":
        raise ValueError(f"invalid model name: {name!r}")
    return name


def download_online_model(store: AssetStore, url: str, dir_name: str) -> str:
    """URL download + extraction, with the pixeldrain rewrite
    (reference webui.py:70-88)."""
    extraction_folder = os.path.join(store.rvc_models_dir, _safe_model_name(dir_name))
    if os.path.exists(extraction_folder):
        raise ValueError(f"Voice model directory {dir_name} already exists!")
    zip_name = url.split("/")[-1]
    if "pixeldrain.com" in url:
        url = f"https://pixeldrain.com/api/file/{zip_name}"
    with urllib.request.urlopen(url) as resp:
        data = resp.read()
    extract_model_zip(data, extraction_folder)
    return f"[+] {dir_name} Model successfully downloaded!"


_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>AICoverGen TPU</title>
<style>
body{font-family:system-ui,sans-serif;max-width:920px;margin:2em auto;padding:0 1em;background:#111;color:#eee}
h1{font-size:1.4em} fieldset{border:1px solid #444;margin:1em 0;border-radius:8px}
label{display:inline-block;min-width:180px;margin:.25em 0} input,select{background:#222;color:#eee;border:1px solid #555;border-radius:4px;padding:.3em}
button{background:#3a6;border:0;color:#fff;padding:.5em 1.2em;border-radius:6px;cursor:pointer;margin:.5em 0}
#bar{height:10px;background:#333;border-radius:5px;overflow:hidden}#fill{height:100%;width:0;background:#3a6}
.tab{display:inline-block;margin-right:1em;cursor:pointer;color:#8cf}.pane{display:none}.pane.active{display:block}
table{border-collapse:collapse;width:100%}td,th{border:1px solid #444;padding:.3em;font-size:.85em}
</style></head><body>
<h1>AICoverGen <small>TPU-native</small></h1>
<div><span class="tab" onclick="show('gen')">Generate</span>
<span class="tab" onclick="show('dl')">Download model</span>
<span class="tab" onclick="show('up')">Upload model</span></div>

<div id="gen" class="pane active">
<fieldset><legend>Main</legend>
<label>Song input (YouTube URL / local path)</label><input id="song" size="50"><br>
<label>Voice model</label><select id="model"></select>
<button onclick="refreshModels()">Refresh</button><br>
<label>Pitch change (octaves)</label><input id="pitch" type="number" value="0" step="1"><br>
<label>Keep intermediate files</label><input id="keep" type="checkbox">
</fieldset>
<fieldset><legend>Voice conversion</legend>
<label>Index rate</label><input id="index_rate" type="number" value="0.5" step="0.05"><br>
<label>Filter radius</label><input id="filter_radius" type="number" value="3" step="1"><br>
<label>RMS mix rate</label><input id="rms" type="number" value="0.25" step="0.05"><br>
<label>Protect</label><input id="protect" type="number" value="0.33" step="0.01"><br>
<label>Pitch detection</label><select id="palgo"><option>rmvpe</option><option>mangio-crepe</option><option>crepe</option><option>pm</option><option>dio</option><option>harvest</option></select><br>
<label>Crepe hop length</label><input id="hop" type="number" value="128" step="1">
</fieldset>
<fieldset><legend>Mix & effects</legend>
<label>Main gain (dB)</label><input id="mv" type="number" value="0"><br>
<label>Backup gain (dB)</label><input id="bv" type="number" value="0"><br>
<label>Instrumental gain (dB)</label><input id="iv" type="number" value="0"><br>
<label>Overall pitch change (semitones)</label><input id="pall" type="number" value="0"><br>
<label>Reverb room size</label><input id="rsize" type="number" value="0.15" step="0.05"><br>
<label>Reverb wet</label><input id="rwet" type="number" value="0.2" step="0.05"><br>
<label>Reverb dry</label><input id="rdry" type="number" value="0.8" step="0.05"><br>
<label>Reverb damping</label><input id="rdamp" type="number" value="0.7" step="0.05"><br>
<label>Output format</label><select id="fmt"><option>mp3</option><option>wav</option></select>
</fieldset>
<button onclick="generate()">Generate</button>
<div id="bar"><div id="fill"></div></div><div id="msg"></div>
<audio id="player" controls style="width:100%;display:none"></audio>
</div>

<div id="dl" class="pane">
<label>Model zip URL</label><input id="dl_url" size="50"><br>
<label>Model name</label><input id="dl_name"><br>
<button onclick="dlModel()">Download</button><div id="dl_msg"></div>
<h3>Public models</h3><input id="pub_filter" placeholder="search..." oninput="renderPub()">
<table id="pub"></table>
</div>

<div id="up" class="pane">
<label>Model zip / .pth</label><input id="up_file" type="file"><br>
<label>Model name</label><input id="up_name"><br>
<button onclick="upModel()">Upload</button><div id="up_msg"></div>
</div>

<script>
let PUB=[];
function show(id){document.querySelectorAll('.pane').forEach(p=>p.classList.remove('active'));
document.getElementById(id).classList.add('active');}
async function refreshModels(){const r=await fetch('/api/models');const m=await r.json();
const sel=document.getElementById('model');sel.innerHTML='';m.forEach(x=>{const o=document.createElement('option');o.textContent=x;sel.appendChild(o);});}
async function generate(){
const body={song_input:v('song'),voice_model:v('model'),pitch_change:+v('pitch'),
keep_files:document.getElementById('keep').checked,index_rate:+v('index_rate'),
filter_radius:+v('filter_radius'),rms_mix_rate:+v('rms'),protect:+v('protect'),
f0_method:v('palgo'),crepe_hop_length:+v('hop'),main_gain:+v('mv'),backup_gain:+v('bv'),
inst_gain:+v('iv'),pitch_change_all:+v('pall'),reverb_rm_size:+v('rsize'),
reverb_wet:+v('rwet'),reverb_dry:+v('rdry'),reverb_damping:+v('rdamp'),output_format:v('fmt')};
const r=await fetch('/api/generate',{method:'POST',body:JSON.stringify(body)});
const {job_id}=await r.json();poll(job_id);}
function v(id){return document.getElementById(id).value;}
async function poll(id){const r=await fetch('/api/job/'+id);const j=await r.json();
document.getElementById('fill').style.width=(j.progress*100)+'%';
document.getElementById('msg').textContent=j.message||j.status;
if(j.status==='done'){const p=document.getElementById('player');
p.src='/api/audio?path='+encodeURIComponent(j.result);p.style.display='block';
if(j.warnings&&j.warnings.length){document.getElementById('msg').textContent=j.warnings.join(' ');}}
else if(j.status!=='error'){setTimeout(()=>poll(id),1000);}}
async function dlModel(){const r=await fetch('/api/download_model',{method:'POST',
body:JSON.stringify({url:v('dl_url'),name:v('dl_name')})});
document.getElementById('dl_msg').textContent=await r.text();}
async function upModel(){const f=document.getElementById('up_file').files[0];
const fd=new FormData();fd.append('file',f);fd.append('name',v('up_name'));
const r=await fetch('/api/upload_model',{method:'POST',body:fd});
document.getElementById('up_msg').textContent=await r.text();}
async function loadPub(){const r=await fetch('/api/public_models');PUB=(await r.json()).voice_models||[];renderPub();}
function renderPub(){const q=v('pub_filter').toLowerCase();const t=document.getElementById('pub');
t.innerHTML='<tr><th>Name</th><th>Description</th><th>Credit</th><th>Tags</th><th></th></tr>';
PUB.filter(m=>!q||JSON.stringify(m).toLowerCase().includes(q)).forEach(m=>{
const tr=document.createElement('tr');
tr.innerHTML=`<td>${m.name}</td><td>${m.description||''}</td><td>${m.credit||''}</td><td>${(m.tags||[]).join(', ')}</td>
<td><button onclick="autofill('${m.url}','${m.name}')">use</button></td>`;t.appendChild(tr);});}
function autofill(u,n){document.getElementById('dl_url').value=u;document.getElementById('dl_name').value=n;}
refreshModels();loadPub();
</script></body></html>"""


def _parse_multipart(body: bytes, content_type: str):
    """Minimal multipart/form-data parser (stdlib-only)."""
    m = re.search(r"boundary=([^;]+)", content_type)
    if not m:
        raise ValueError("missing multipart boundary")
    boundary = m.group(1).strip('"').encode()
    fields = {}
    for part in body.split(b"--" + boundary):
        part = part.strip(b"\r\n")
        if not part or part == b"--":
            continue
        header_blob, _, value = part.partition(b"\r\n\r\n")
        headers = header_blob.decode(errors="replace")
        name_m = re.search(r'name="([^"]+)"', headers)
        if not name_m:
            continue
        fname_m = re.search(r'filename="([^"]*)"', headers)
        fields[name_m.group(1)] = {
            "filename": fname_m.group(1) if fname_m else None,
            "data": value,
        }
    return fields


def make_handler(store: AssetStore, board: JobBoard):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _json(self, obj, code=200):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _text(self, text, code=200):
            data = text.encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/plain; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/":
                data = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            elif parsed.path == "/api/models":
                self._json(store.list_voice_models())
            elif parsed.path == "/api/public_models":
                self._json(load_public_models_index(store.base_dir))
            elif parsed.path.startswith("/api/job/"):
                job = board.jobs.get(parsed.path.rsplit("/", 1)[-1])
                if job is None:
                    self._json({"error": "no such job"}, 404)
                else:
                    self._json(job)
            elif parsed.path == "/api/audio":
                qs = urllib.parse.parse_qs(parsed.query)
                path = os.path.abspath(qs.get("path", [""])[0])
                root = os.path.abspath(store.output_dir)
                if not path.startswith(root + os.sep) or not os.path.exists(path):
                    self._text("not found", 404)
                    return
                with open(path, "rb") as f:
                    data = f.read()
                ctype = "audio/mpeg" if path.endswith(".mp3") else "audio/wav"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            else:
                self._text("not found", 404)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            try:
                if self.path == "/api/generate":
                    self._json({"job_id": board.submit(json.loads(body))})
                elif self.path == "/api/download_model":
                    req = json.loads(body)
                    msg = download_online_model(store, req["url"], req["name"])
                    self._text(msg)
                elif self.path == "/api/upload_model":
                    fields = _parse_multipart(body, self.headers.get("Content-Type", ""))
                    name = _safe_model_name(fields["name"]["data"].decode().strip())
                    blob = fields["file"]["data"]
                    fname = fields["file"]["filename"] or ""
                    dest_dir = os.path.join(store.rvc_models_dir, name)
                    if fname.endswith(".zip"):
                        extract_model_zip(blob, dest_dir)
                    elif fname.endswith(".pth"):
                        os.makedirs(dest_dir, exist_ok=True)
                        with open(os.path.join(dest_dir, os.path.basename(fname)), "wb") as f:
                            f.write(blob)
                    else:
                        raise ValueError("upload a .zip or .pth file")
                    self._text(f"[+] {name} Model successfully uploaded!")
                else:
                    self._text("not found", 404)
            except Exception as e:
                self._text(f"error: {e}", 500)

    return Handler


def serve(
    base_dir: Optional[str] = None,
    host: str = "127.0.0.1",
    port: int = 7860,
    start_worker: bool = True,
    workers: int = 1,
    warmup_voice: Optional[str] = None,
    warmup_seconds: float = 240.0,
    posture: Optional[str] = None,
    submesh_devices: Optional[int] = None,
) -> ThreadingHTTPServer:
    store = AssetStore(base_dir or default_base_dir())
    os.makedirs(store.output_dir, exist_ok=True)
    os.makedirs(store.rvc_models_dir, exist_ok=True)
    board = JobBoard()
    if start_worker:
        # multi-song throughput: serving lanes come from the posture knob
        # (parallel/serving.py):
        #   whole_mesh — N workers share one full-mesh pipeline (jit caches,
        #     model trees shared; the device admission gate serializes their
        #     device sections);
        #   submesh    — the devices partition into independent lanes, one
        #     worker each (jobs go to the next free lane).
        # The reference's Gradio queue was strictly serial
        # (reference webui.py:317-322).
        from ..parallel.serving import ServingScheduler

        # serving posture for the stem cache: files are written BEHIND the
        # response (a cover's ~60-130 MB of cache downloads never sit between
        # the user and their file; re-covers of a song join pending writes
        # first); per-pipeline knob, explicit AICG_STEM_CACHE env still wins
        from ..utils.config import stem_cache_mode

        cfg = default_config()
        sched = ServingScheduler(
            store,
            posture=posture or os.environ.get("AICG_SERVING_POSTURE", "whole_mesh"),
            n_devices=cfg.num_devices,
            submesh_devices=submesh_devices
            or int(os.environ.get("AICG_SUBMESH_DEVICES", "1")),
            model_parallel=cfg.model_parallel,
            workers=workers,
            runtime=cfg,
            stem_cache=stem_cache_mode(default="behind"),
        )
        for lane in sched.lanes:
            threading.Thread(
                target=_worker,
                args=(lane.pipeline, board,
                      None if sched.posture == "whole_mesh" else lane.device),
                daemon=True,
            ).start()
        threading.Thread(
            target=_drain_worker, args=(sched.pipelines, board), daemon=True
        ).start()
        if warmup_voice and warmup_seconds:
            # pay checkpoint loads + compiles + per-process executable loads
            # while the server is already accepting requests; the first real
            # cover then runs at steady state (3-10x faster on a remote-TPU
            # tunnel, VERDICT r02 item 8)
            def _warm():
                try:
                    import time as _time

                    import jax

                    # "auto" warms through the fabricated .warmup voice, so
                    # no user model needs to exist yet
                    voice = None if warmup_voice == "auto" else warmup_voice
                    t0 = _time.perf_counter()
                    # every distinct lane pipeline warms ON ITS device, in
                    # PARALLEL: lanes are independent devices, so k lanes
                    # reach steady state in ~1x one lane's warmup wall
                    # instead of kx sequentially
                    seen, warm_threads, errs = set(), [], []
                    for lane in sched.lanes:
                        if id(lane.pipeline) in seen:
                            continue
                        seen.add(id(lane.pipeline))

                        def _one(lane=lane):
                            try:
                                with jax.default_device(lane.device):
                                    lane.pipeline.warmup(voice, warmup_seconds)
                            except Exception as e:  # noqa: BLE001
                                errs.append(e)

                        t = threading.Thread(target=_one, daemon=True)
                        t.start()
                        warm_threads.append(t)
                    for t in warm_threads:
                        t.join()
                    if errs:
                        raise errs[0]
                    print(f"[+] warmup({warmup_voice!r}, {warmup_seconds!r}s "
                          f"class, {len(warm_threads)} lane(s)) done in "
                          f"{_time.perf_counter() - t0:.1f}s — serving at "
                          "steady state")
                except Exception as e:
                    print(f"[!] warmup failed (serving continues cold): {e}")

            threading.Thread(target=_warm, daemon=True).start()
    server = ThreadingHTTPServer((host, port), make_handler(store, board))
    server.job_board = board  # handed to external workers (tests, embedders)
    return server


def main(argv=None) -> int:
    import argparse

    from ..utils.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description="AICoverGen TPU web UI")
    ap.add_argument("--listen-host", default="127.0.0.1")
    ap.add_argument("--listen-port", type=int, default=7860)
    ap.add_argument("--listen", action="store_true", help="bind 0.0.0.0")
    ap.add_argument(
        "--share",
        action="store_true",
        help="expose a public URL via an external tunnel command "
        "(AICG_TUNNEL_CMD, default: `cloudflared tunnel --url http://HOST:PORT`) "
        "— the role of the reference's gradio --share flag (webui.py:158-163)",
    )
    ap.add_argument("--workers", type=int, default=int(os.environ.get("AICG_WORKERS", 1)),
                    help="concurrent cover jobs (multi-song throughput serving)")
    ap.add_argument("--posture", choices=("whole_mesh", "submesh"),
                    default=os.environ.get("AICG_SERVING_POSTURE", "whole_mesh"),
                    help="multi-device serving posture: whole_mesh = every "
                    "cover shards over all devices behind the admission gate "
                    "(latency-optimal); submesh = devices partition into "
                    "independent lanes, one cover each (throughput-optimal)")
    ap.add_argument("--submesh-devices", type=int,
                    default=int(os.environ.get("AICG_SUBMESH_DEVICES", 1)),
                    help="devices per lane for --posture submesh")
    ap.add_argument("--base-dir", default=None)
    ap.add_argument("--warmup", default=os.environ.get("AICG_WARMUP") or None,
                    metavar="VOICE",
                    help="run one synthetic cover with this voice at startup "
                    "(background) so the first user job is steady-state fast; "
                    "'auto' warms through a fabricated voice (no user model "
                    "needed)")
    ap.add_argument("--warmup-seconds",
                    default=os.environ.get("AICG_WARMUP_SECONDS", "240"),
                    help="length class(es) to warm, comma-separated "
                    "(default 240; e.g. '240,120' also pre-loads the 120 s "
                    "class's whole-track executables)")
    args = ap.parse_args(argv)
    host = "0.0.0.0" if args.listen or args.share else args.listen_host
    from ..utils.config import warmup_classes

    server = serve(args.base_dir, host, args.listen_port, workers=args.workers,
                   warmup_voice=args.warmup,
                   warmup_seconds=warmup_classes(args.warmup_seconds),
                   posture=args.posture, submesh_devices=args.submesh_devices)
    print(f"[+] web UI at http://{host}:{args.listen_port}")
    if args.share:
        import shlex
        import subprocess

        cmd = os.environ.get(
            "AICG_TUNNEL_CMD", f"cloudflared tunnel --url http://127.0.0.1:{args.listen_port}"
        )
        try:
            tunnel = subprocess.Popen(shlex.split(cmd))
            print(f"[+] tunnel started: {cmd!r} (pid {tunnel.pid})")
        except FileNotFoundError:
            print(
                f"[!] --share: tunnel command {cmd.split()[0]!r} not found; install "
                "cloudflared/ngrok or set AICG_TUNNEL_CMD"
            )
    server.serve_forever()
    return 0


if __name__ == "__main__":
    main()
