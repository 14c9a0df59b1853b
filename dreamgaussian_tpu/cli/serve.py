"""Interactive orbit viewer over HTTP (dearpygui-GUI replacement).

The reference embeds a dearpygui viewer in its trainers
(/root/reference/main.py:546-877): orbit/zoom camera, display mode
(image / depth / alpha), and a live "start training" toggle
(:879-886). dearpygui needs a local display; a TPU VM has none, so the
equivalent here is a tiny zero-dependency web viewer: it loads a
gaussian PLY (or textured mesh), renders on demand, and serves a single
HTML page with drag-to-orbit, wheel-to-zoom, and a mode selector.

  python -m dreamgaussian_tpu.cli.serve logs/name_model.ply --port 8000

Live-training mode (the reference's in-GUI training loop): pass a
config instead of an artifact and the viewer runs stage-1 optimization
in a background thread while serving the CURRENT state; the page gains
a train on/off toggle and a step/loss readout.

  python -m dreamgaussian_tpu.cli.serve --train --config configs/image.yaml \
      input=data/anya_rgba.png save_path=anya
"""

from __future__ import annotations

import argparse
import io
import json
import math
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>dreamgaussian_tpu viewer</title><style>
body { background:#111; color:#ddd; font-family:monospace; margin:0 }
#bar { padding:8px } img { display:block; margin:0 auto; cursor:grab }
select,button { background:#222; color:#ddd; border:1px solid #555 }
</style></head><body>
<div id="bar">
 mode <select id="mode"><option>image</option><option>depth</option>
 <option>alpha</option></select>
 <label id="trainbox" style="display:none"><input type="checkbox" id="train"/> train</label>
 <span id="stat"></span> <span id="tstat"></span>
</div>
<img id="view" width="512" height="512"/>
<script>
let elev=0, azim=0, radius=2.0, tx=0, ty=0, tz=0;
let drag=null, pan=null, inflight=false, dirty=true;
const img=document.getElementById('view');
const mode=document.getElementById('mode');
function refresh(){
  if(inflight){dirty=true;return}
  inflight=true; dirty=false;
  const t0=performance.now();
  const u=`/render?elev=${elev.toFixed(1)}&azim=${azim.toFixed(1)}`+
          `&radius=${radius.toFixed(2)}&mode=${mode.value}`+
          `&tx=${tx.toFixed(4)}&ty=${ty.toFixed(4)}&tz=${tz.toFixed(4)}`;
  fetch(u).then(r=>r.blob()).then(b=>{
    img.src=URL.createObjectURL(b);
    document.getElementById('stat').textContent=
      ` elev ${elev.toFixed(0)} azim ${azim.toFixed(0)} r ${radius.toFixed(2)}`+
      ` (${(performance.now()-t0).toFixed(0)} ms)`;
    inflight=false; if(dirty) refresh();
  });
}
img.onmousedown=e=>{
  if(e.button===2||e.shiftKey) pan=[e.clientX,e.clientY];
  else drag=[e.clientX,e.clientY];
  e.preventDefault()};
img.oncontextmenu=e=>e.preventDefault();
window.onmouseup=()=>{drag=null;pan=null};
window.onmousemove=e=>{
  if(pan){
    // pan the orbit target in the camera plane (right-drag/shift-drag,
    // the dearpygui middle-drag analogue)
    const az=azim*Math.PI/180, el=elev*Math.PI/180;
    const sx=[Math.cos(az),0,-Math.sin(az)];             // camera right
    const sy=[Math.sin(el)*Math.sin(az),Math.cos(el),
              Math.sin(el)*Math.cos(az)];                // camera up
    const s=0.0015*radius, dx=e.clientX-pan[0], dy=e.clientY-pan[1];
    tx+=s*(-dx*sx[0]+dy*sy[0]); ty+=s*(-dx*sx[1]+dy*sy[1]);
    tz+=s*(-dx*sx[2]+dy*sy[2]);
    pan=[e.clientX,e.clientY]; refresh(); return;
  }
  if(!drag) return;
  azim-= (e.clientX-drag[0])*0.5; elev+=(e.clientY-drag[1])*0.5;
  elev=Math.max(-89,Math.min(89,elev));
  drag=[e.clientX,e.clientY]; refresh();
};
img.onwheel=e=>{e.preventDefault();radius*=Math.pow(1.1,e.deltaY>0?1:-1);
  radius=Math.max(0.5,Math.min(10,radius)); refresh();};
mode.onchange=refresh;
const trainCb=document.getElementById('train');
fetch('/status').then(r=>r.json()).then(st=>{
  if(st.live){document.getElementById('trainbox').style.display='inline';
    trainCb.checked=st.training;
    setInterval(()=>{fetch('/status').then(r=>r.json()).then(st=>{
      document.getElementById('tstat').textContent=
        `step ${st.step} loss ${st.loss===null?'-':st.loss.toFixed(3)}`;
      if(st.training) refresh();
    })}, 1000);}
});
trainCb&&(trainCb.onchange=()=>fetch('/train?on='+(trainCb.checked?1:0)));
refresh();
</script></body></html>"""


class ViewerState:
    def __init__(self, path: str | None, size: int = 512,
                 fovy_deg: float = 49.1, trainer=None):
        import jax.numpy as jnp

        self.size = size
        self.fovy = math.radians(fovy_deg)
        self.lock = threading.Lock()
        self.trainer = trainer
        self.training = False
        self.last_loss = None
        if trainer is not None:
            self.kind = "live"
            self._train_thread = threading.Thread(
                target=self._train_loop, daemon=True
            )
            self._train_thread.start()
            return
        ext = os.path.splitext(path)[1].lower()
        if ext == ".ply":
            from ..scene import load_ply

            self.params, self.aux, self.sh_degree = load_ply(path)
            self.kind = "gaussians"
        else:
            from ..meshing.mesh import Mesh
            from ..render.mesh_renderer import MeshRendererState

            mesh = Mesh.load(path, resize=False)
            if mesh.vt is None:
                mesh.auto_uv()
                mesh.auto_normal()
            if mesh.albedo is None:
                mesh.albedo = np.full((512, 512, 3), 0.7, np.float32)
            self.mstate = MeshRendererState.from_mesh(mesh)
            self.kind = "mesh"

    def _train_loop(self):
        """Background stage-1 optimization (the reference GUI's
        train_step-per-frame loop, /root/reference/main.py:879-886).
        The shared lock serializes device work against render calls."""
        import time as _time

        total = self.trainer.opt.get("iters", 500)
        while True:
            if not self.training or self.trainer.step >= total:
                _time.sleep(0.1)
                continue
            with self.lock:
                loss = self.trainer.train_step()
            self.last_loss = float(loss)

    def render(self, elev: float, azim: float, radius: float, mode: str,
               target=None):
        import jax.numpy as jnp

        from ..utils.camera import Camera, orbit_camera

        cam = Camera.from_pose(
            orbit_camera(elev, azim, radius, target=target),
            self.size, self.size, self.fovy, self.fovy,
        )
        arr = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
        with self.lock:
            if self.kind == "live":
                out = self.trainer.render_view(cam)
                image, depth, alpha = out.image, out.depth, out.alpha
            elif self.kind == "gaussians":
                from ..train.stage1 import get_cached_render

                fn = get_cached_render(
                    self.size, self.size, self.sh_degree,
                    self.params["xyz"].shape[0],
                )
                out = fn(self.params, arr, jnp.ones(3), self.aux.alive)
                image, depth, alpha = out.image, out.depth, out.alpha
            else:
                from ..render.mesh_renderer import render_mesh

                w2c = np.asarray(cam.view[:3, :3]).copy()
                w2c[1:3] *= -1
                out = render_mesh(
                    self.mstate, arr, jnp.asarray(w2c.T), self.size, self.size
                )
                image = out["image"]
                depth = out["depth"][..., 0]
                alpha = out["alpha"][..., 0]
        if mode == "depth":
            d = np.asarray(depth)
            lo, hi = d.min(), d.max()
            d = (d - lo) / (hi - lo + 1e-8)
            img = np.repeat(d[..., None], 3, axis=-1)
        elif mode == "alpha":
            img = np.repeat(np.asarray(alpha)[..., None], 3, axis=-1)
        else:
            img = np.asarray(image)
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def make_handler(state: ViewerState):
    import imageio

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/status":
                body = json.dumps({
                    "live": state.kind == "live",
                    "training": state.training,
                    "step": getattr(state.trainer, "step", 0)
                    if state.trainer else 0,
                    "loss": state.last_loss,
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/train":
                q = parse_qs(url.query)
                state.training = q.get("on", ["0"])[0] == "1"
                self.send_response(200)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"ok")
            elif url.path == "/render":
                q = parse_qs(url.query)
                img = state.render(
                    float(q.get("elev", ["0"])[0]),
                    float(q.get("azim", ["0"])[0]),
                    float(q.get("radius", ["2"])[0]),
                    q.get("mode", ["image"])[0],
                    target=np.array([
                        float(q.get("tx", ["0"])[0]),
                        float(q.get("ty", ["0"])[0]),
                        float(q.get("tz", ["0"])[0]),
                    ], dtype=np.float32),
                )
                buf = io.BytesIO()
                imageio.imwrite(buf, img, format="png")
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def make_live_state(config: str, extras: list, size: int) -> "ViewerState":
    """Build a Stage1Trainer from a config for the live-training mode."""
    from ..utils.config import load_with_cli
    from .main import build_guidances
    from .process import load_rgba

    opt = load_with_cli(config, extras)
    ref_rgb = ref_mask = None
    if opt.get("input", None):
        rgba = load_rgba(opt.input, size=opt.get("ref_size", 256))
        ref_mask = rgba[..., 3]
        ref_rgb = rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])
    from ..train import Stage1Trainer

    trainer = Stage1Trainer(
        opt, ref_rgb=ref_rgb, ref_mask=ref_mask,
        guidance_fns=build_guidances(opt, ref_rgb),
        capacity=opt.get("capacity", 16384), seed=opt.get("seed", 0),
    )
    return ViewerState(None, size=size, trainer=trainer)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", help=".ply gaussians or mesh")
    ap.add_argument("--train", action="store_true",
                    help="live-training mode (needs --config)")
    ap.add_argument("--config", default=None)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--size", type=int, default=512)
    args, extras = ap.parse_known_args(argv)

    if args.train:
        if not args.config:
            raise SystemExit("--train needs --config <yaml> [key=val ...]")
        state = make_live_state(args.config, extras, args.size)
    else:
        if not args.path:
            raise SystemExit("pass an artifact path, or --train --config")
        state = ViewerState(args.path, size=args.size)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(state))
    print(f"[INFO] viewer at http://localhost:{args.port}/ ({state.kind})")
    server.serve_forever()


if __name__ == "__main__":
    main()
