"""Two-stage web demo (gradio_app equivalent).

The reference ships a gradio page whose two buttons shell out to
``main.py`` / ``main2.py`` and display the produced GLB
(/root/reference/gradio_app.py:13-36). This is the dependency-free
equivalent: a single page with an input picker and two buttons; each
stage runs in a worker thread inside this process (no subprocess — the
jit cache stays warm), logs stream to the page, and the finished asset
is shown as an orbit GIF with a download link for the mesh.

  python -m dreamgaussian_tpu.cli.webapp --port 8090 \\
      [--data_dir data] [--outdir logs] [--fake_guidance]
"""

from __future__ import annotations

import argparse
import glob
import io
import json
import os
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_PAGE = """<!DOCTYPE html>
<html><head><title>dreamgaussian_tpu</title><style>
body {{ background:#111; color:#ddd; font-family:monospace; margin:2em }}
select,button,input {{ background:#222; color:#ddd; border:1px solid #555;
  padding:4px }}
#log {{ white-space:pre-wrap; background:#000; padding:8px; height:16em;
  overflow-y:scroll; border:1px solid #333 }}
img {{ max-width:512px }}
a {{ color:#8cf }}
</style></head><body>
<h2>dreamgaussian_tpu</h2>
input <select id="input">{options}</select>
<button onclick="run(1)">Generate 3D (stage 1)</button>
<button onclick="run(2)">Refine texture (stage 2)</button>
<div id="log"></div>
<div id="result"></div>
<script>
let timer=null;
function run(stage){{
  fetch(`/run?stage=${{stage}}&input=${{encodeURIComponent(
    document.getElementById('input').value)}}`).then(r=>r.json()).then(j=>{{
      if(j.error) log(j.error); else poll();
  }});
}}
function log(s){{ const el=document.getElementById('log');
  el.textContent=s; el.scrollTop=el.scrollHeight; }}
function poll(){{
  if(timer) clearTimeout(timer);
  fetch('/status').then(r=>r.json()).then(j=>{{
    log(j.log);
    if(j.running) timer=setTimeout(poll, 2000);
    else if(j.artifact) document.getElementById('result').innerHTML=
      `<p><img src="/artifact?path=${{encodeURIComponent(j.artifact)}}"/></p>`+
      (j.mesh?`<p><a href="/artifact?path=${{encodeURIComponent(j.mesh)}}"
        download>download mesh</a></p>`:'');
  }});
}}
poll();
</script></body></html>"""


class AppState:
    def __init__(self, data_dir: str, outdir: str, extra: list[str]):
        self.data_dir = data_dir
        self.outdir = outdir
        self.extra = extra
        self.lock = threading.Lock()
        self.running = False
        self.log: list[str] = []
        self.artifact = None
        self.mesh = None

    def emit(self, msg: str) -> None:
        with self.lock:
            self.log.append(msg)

    def launch(self, stage: int, input_path: str) -> str | None:
        with self.lock:
            if self.running:
                return "a job is already running"
            self.running = True
            self.log = [f"[webapp] stage {stage} on {input_path}"]
            self.artifact = None

        def work():
            try:
                from ..utils.config import load_with_cli

                name = os.path.basename(input_path).replace("_rgba.png", "")
                over = [
                    f"input={input_path}", f"save_path={name}",
                    f"outdir={self.outdir}", *self.extra,
                ]
                opt = load_with_cli("configs/image.yaml", over)
                import contextlib

                class Tee(io.StringIO):
                    def write(s, t):
                        if t.strip():
                            self.emit(t.rstrip())
                        return len(t)

                with contextlib.redirect_stdout(Tee()):
                    if stage == 1:
                        from . import main as cli1

                        stats = cli1.run(opt)
                        mesh = stats.get("mesh_path")
                    else:
                        from . import main2 as cli2

                        stats = cli2.run(opt)
                        mesh = stats.get("mesh_path")
                    # orbit gif of the result
                    from . import render as cli_render

                    gif = os.path.join(self.outdir, f"{name}_s{stage}.gif")
                    target = stats.get("ply_path", mesh) if stage == 1 else mesh
                    cli_render.main(
                        [target, "--out", gif, "--num_frames", "12",
                         "--size", "256"]
                    )
                with self.lock:
                    self.artifact = gif
                    self.mesh = mesh
                self.emit("[webapp] done")
            except Exception:
                self.emit(traceback.format_exc())
            finally:
                with self.lock:
                    self.running = False

        threading.Thread(target=work, daemon=True).start()
        return None


def make_handler(state: AppState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                inputs = sorted(
                    glob.glob(os.path.join(state.data_dir, "*_rgba.png"))
                )
                options = "".join(
                    f'<option value="{p}">{os.path.basename(p)}</option>'
                    for p in inputs
                )
                body = _PAGE.format(options=options).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/run":
                q = parse_qs(url.query)
                err = state.launch(
                    int(q.get("stage", ["1"])[0]), q.get("input", [""])[0]
                )
                self._json({"error": err})
            elif url.path == "/status":
                with state.lock:
                    self._json({
                        "running": state.running,
                        "log": "\n".join(state.log[-200:]),
                        "artifact": state.artifact,
                        "mesh": state.mesh,
                    })
            elif url.path == "/artifact":
                q = parse_qs(url.query)
                path = q.get("path", [""])[0]
                # only serve files under outdir
                real = os.path.realpath(path)
                if not real.startswith(os.path.realpath(state.outdir)):
                    self.send_response(403)
                    self.end_headers()
                    return
                with open(real, "rb") as f:
                    body = f.read()
                ctype = ("image/gif" if real.endswith(".gif")
                         else "application/octet-stream")
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8090)
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--outdir", default="logs")
    ap.add_argument("--fake_guidance", action="store_true")
    ap.add_argument("--extra", nargs="*", default=[])
    args = ap.parse_args(argv)

    extra = list(args.extra)
    if args.fake_guidance:
        extra.append("fake_guidance=True")
    os.makedirs(args.outdir, exist_ok=True)
    state = AppState(args.data_dir, args.outdir, extra)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(state))
    print(f"[INFO] webapp at http://localhost:{args.port}/")
    server.serve_forever()


if __name__ == "__main__":
    main()
