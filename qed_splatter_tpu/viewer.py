"""Minimal live web viewer (SURVEY D13; reference ``vis="viewer"`` at
config.py:83).

A dependency-free HTTP server that renders the *current* gaussian state on
demand: an orbit-controls HTML page polls ``/render`` with camera
parameters; frames are rendered through the normal eval path and returned
as PNG. Runs in a daemon thread beside training (the trainer swaps in the
latest params each step) or standalone over a checkpoint
(``qed view --load-dir ...``).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>qed-splatter-tpu viewer</title><style>
body { margin:0; background:#111; color:#eee; font-family:sans-serif; }
#hud { position:fixed; top:8px; left:8px; background:#0008; padding:8px;
       border-radius:6px; font-size:13px; }
img { display:block; margin:auto; margin-top:20px; max-width:95vw; }
</style></head><body>
<div id="hud">drag: orbit &middot; wheel: zoom &middot; <span id="s"></span></div>
<img id="v" width="640"/>
<script>
let az=0.0, el=0.2, r=3.0, busy=false, dirty=true;
const img=document.getElementById('v'), hud=document.getElementById('s');
function tick(){
  if(dirty && !busy){
    busy=true; dirty=false;
    const t0=performance.now();
    const u=`/render?az=${az.toFixed(3)}&el=${el.toFixed(3)}&r=${r.toFixed(2)}&w=640&h=480&_=${Date.now()}`;
    fetch(u).then(r=>r.blob()).then(b=>{
      img.src=URL.createObjectURL(b);
      hud.textContent=`az ${az.toFixed(2)} el ${el.toFixed(2)} r ${r.toFixed(1)} (${(performance.now()-t0).toFixed(0)} ms)`;
      busy=false;
    }).catch(()=>{busy=false;});
  }
  requestAnimationFrame(tick);
}
let drag=false,lx=0,ly=0;
img.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY;};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{ if(!drag) return;
  az+=(e.clientX-lx)*0.01; el+=(e.clientY-ly)*0.01;
  el=Math.max(-1.5,Math.min(1.5,el)); lx=e.clientX; ly=e.clientY; dirty=true;};
window.onwheel=e=>{ r*=(1+Math.sign(e.deltaY)*0.1); r=Math.max(0.2,r); dirty=true;};
setInterval(()=>{dirty=true;}, 2000);  // refresh during training
tick();
</script></body></html>"""


def _encode_png(rgb01: np.ndarray) -> bytes:
    from PIL import Image

    arr = np.clip(np.asarray(rgb01) * 255.0, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class ViewerState:
    """Thread-shared state: current params + render closure."""

    def __init__(self, cfg, target=(0.0, 0.0, 0.0)):
        self.cfg = cfg
        self.target = target
        self.lock = threading.Lock()
        self.params = None
        self.step = 0

    def update(self, params, step: int) -> None:
        import jax

        # snapshot to host: the training step donates its state, so holding
        # device buffers would dangle after the next step
        host = jax.tree.map(np.asarray, params)
        with self.lock:
            self.params = host
            self.step = int(step)

    def render_frame(self, az, el, radius, width, height) -> np.ndarray:
        import jax.numpy as jnp

        from qed_splatter_tpu.models.splatfacto import render
        from qed_splatter_tpu.testing import orbit_c2w_opengl

        with self.lock:
            params = self.params
            step = self.step
        if params is None:
            return np.zeros((height, width, 3), np.float32)
        c2w = jnp.asarray(
            orbit_c2w_opengl(radius, az, el, target=self.target)
        )
        f = 0.8 * max(width, height)
        K = jnp.asarray(
            np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                     np.float32)
        )
        out = render(
            params, c2w, K, width, height, self.cfg,
            step=jnp.asarray(step), train=False,
        )
        return np.asarray(out.rgb)


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silent
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
            elif url.path == "/render":
                q = parse_qs(url.query)

                def fget(k, d):
                    return float(q.get(k, [d])[0])

                try:
                    rgb = state.render_frame(
                        fget("az", 0.0), fget("el", 0.2), fget("r", 3.0),
                        int(fget("w", 640)), int(fget("h", 480)),
                    )
                    body = _encode_png(rgb)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                except Exception as e:  # keep the viewer alive
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_response(500)
                    self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/status":
                body = json.dumps(
                    {"step": state.step, "ready": state.params is not None}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


class Viewer:
    """Daemon-thread HTTP viewer."""

    def __init__(self, cfg, port: int = 7007, target=(0.0, 0.0, 0.0)):
        self.state = ViewerState(cfg, target=target)
        self.server = ThreadingHTTPServer(
            ("0.0.0.0", port), make_handler(self.state)
        )
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )

    def start(self) -> None:
        self.thread.start()
        print(f"Viewer running at http://localhost:{self.port}")

    def update(self, params, step) -> None:
        self.state.update(params, step)

    def stop(self) -> None:
        self.server.shutdown()
