"""Live web viewer (SURVEY D13; reference ``vis="viewer"`` at config.py:83).

A dependency-free HTTP server that renders the *current* gaussian state on
demand — the stand-in for nerfstudio's viser viewer. An orbit-controls HTML
page polls ``/render`` with camera parameters; frames render through the
normal eval path and return as PNG. Runs in a daemon thread beside training
(the trainer swaps in the latest params + metrics each dispatch) or
standalone over a checkpoint (``qed view --load-dir ...``).

Viewer features mirroring the reference stack's controls:
- orbit / zoom navigation, resolution picker, depth view toggle
- **crop box** (reference model.py:217-239): enable + center/size inputs,
  applied through the same ``CropBox`` path as ``qed render --crop-*``
- live training HUD: step, loss, PSNR, gaussian count (``/status``)
- **training pause/resume** (viser's trainer controls): ``/control`` flips
  a flag the Trainer polls between dispatches
- **camera-path authoring** (viser's camera-path editor): keyframe the
  current orbit pose, then ``/campath`` interpolates and returns the
  nerfstudio camera-path JSON that ``qed render --camera-path`` (and
  ns-render) consume
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>qed-splatter-tpu viewer</title><style>
body { margin:0; background:#111; color:#eee; font-family:sans-serif; }
#hud { position:fixed; top:8px; left:8px; background:#0009; padding:10px;
       border-radius:6px; font-size:13px; max-width:330px; }
#train { color:#8fd; margin-top:4px; }
label { display:inline-block; margin-right:6px; }
input[type=number] { width:52px; background:#222; color:#eee;
                     border:1px solid #444; }
select { background:#222; color:#eee; border:1px solid #444; }
img { display:block; margin:auto; margin-top:20px; max-width:95vw; }
.row { margin-top:4px; }
</style></head><body>
<div id="hud">
  <div>drag: orbit &middot; wheel: zoom &middot;
       <a href="/webgl" style="color:#9cf">webgl view</a> &middot;
       <span id="s"></span></div>
  <div id="train"></div>
  <div class="row">
    <label>res <select id="res">
      <option>480</option><option selected>640</option>
      <option>960</option><option>1280</option></select></label>
    <label><input type="checkbox" id="depth"/> depth</label>
  </div>
  <div class="row"><label><input type="checkbox" id="crop"/> crop box</label>
    <button id="pause">pause</button>
  </div>
  <div class="row">
    <button id="addkf">+ keyframe</button>
    <button id="clearkf">clear</button>
    <span id="kfn">0 kf</span>
    <label>s <input type="number" id="secs" value="5" step="1"/></label>
    <label>fps <input type="number" id="fps" value="24" step="1"/></label>
    <a id="savepath" href="#" style="color:#9cf">save path</a>
  </div>
  <div class="row">c
    <input type="number" id="ccx" value="0" step="0.1"/>
    <input type="number" id="ccy" value="0" step="0.1"/>
    <input type="number" id="ccz" value="0" step="0.1"/></div>
  <div class="row">sz
    <input type="number" id="csx" value="2" step="0.1"/>
    <input type="number" id="csy" value="2" step="0.1"/>
    <input type="number" id="csz" value="2" step="0.1"/></div>
</div>
<img id="v" width="640"/>
<script>
let az=0.0, el=0.2, r=3.0, busy=false, dirty=true;
const img=document.getElementById('v'), hud=document.getElementById('s');
const $=id=>document.getElementById(id);
for (const id of ['res','depth','crop','ccx','ccy','ccz','csx','csy','csz'])
  $(id).addEventListener('change', ()=>{dirty=true;});
function tick(){
  if(dirty && !busy){
    busy=true; dirty=false;
    const t0=performance.now();
    const w=parseInt($('res').value), h=Math.round(w*0.75);
    img.width=w;
    let u=`/render?az=${az.toFixed(3)}&el=${el.toFixed(3)}&r=${r.toFixed(2)}`
         +`&w=${w}&h=${h}&depth=${$('depth').checked?1:0}`;
    if($('crop').checked){
      u+=`&crop=1&ccx=${$('ccx').value}&ccy=${$('ccy').value}`
        +`&ccz=${$('ccz').value}&csx=${$('csx').value}`
        +`&csy=${$('csy').value}&csz=${$('csz').value}`;
    }
    fetch(u+`&_=${Date.now()}`).then(r=>r.blob()).then(b=>{
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
function poll(){
  fetch('/status').then(r=>r.json()).then(st=>{
    let t=`step ${st.step}`;
    if(st.metrics){
      if(st.metrics.loss!==undefined) t+=` · loss ${st.metrics.loss.toFixed(4)}`;
      if(st.metrics.psnr!==undefined) t+=` · psnr ${st.metrics.psnr.toFixed(2)}`;
    }
    if(st.gaussian_count) t+=` · ${st.gaussian_count.toLocaleString()} gaussians`;
    if(st.training) { t+=' · training'; dirty=true; }
    document.getElementById('train').textContent=t;
  }).catch(()=>{});
}
setInterval(poll, 2000); poll();
let paused=false;
$('pause').onclick=()=>{
  fetch(`/control?cmd=${paused?'resume':'pause'}`).then(r=>r.json()).then(st=>{
    paused=st.paused; $('pause').textContent=paused?'resume':'pause';
  });
};
$('addkf').onclick=()=>{
  fetch(`/keyframe?az=${az.toFixed(4)}&el=${el.toFixed(4)}&r=${r.toFixed(3)}`)
    .then(r=>r.json()).then(st=>{$('kfn').textContent=`${st.count} kf`;});
};
$('clearkf').onclick=()=>{
  fetch('/keyframe?clear=1').then(r=>r.json())
    .then(st=>{$('kfn').textContent=`${st.count} kf`;});
};
$('savepath').onclick=(e)=>{
  e.preventDefault();
  const u=`/campath?seconds=${$('secs').value}&fps=${$('fps').value}`;
  const a=document.createElement('a');
  a.href=u; a.download='camera_path.json'; a.click();
};
tick();
</script></body></html>"""


def _encode_png(rgb01: np.ndarray) -> bytes:
    from PIL import Image

    arr = np.clip(np.asarray(rgb01) * 255.0, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class ViewerState:
    """Thread-shared state: current params + metrics + render closure."""

    def __init__(self, cfg, target=(0.0, 0.0, 0.0), crop=None):
        self.cfg = cfg
        self.target = target
        self.default_crop = crop
        self.lock = threading.Lock()
        self.params = None
        self.step = 0
        self.metrics: Dict[str, float] = {}
        self.training = False
        # trainer control (viser pause/resume analog): the Trainer polls
        # this between dispatches
        self.paused = False
        # camera-path authoring keyframes: (az, el, radius) orbit poses
        self.keyframes: list = []

    def camera_path_json(self, seconds: float, fps: float,
                         width: int, height: int, fov: float) -> dict:
        """Interpolate the authored keyframes into the nerfstudio
        camera-path JSON format (data.camera_path.load_camera_path and
        ns-render both consume it)."""
        from qed_splatter_tpu.testing import orbit_c2w_opengl

        with self.lock:
            kfs = list(self.keyframes)
        if len(kfs) < 2:
            raise ValueError("need at least 2 keyframes")
        n = max(int(round(seconds * fps)), 2)
        kf = np.asarray(kfs, np.float64)              # [K, 3] az, el, r
        # piecewise-linear in orbit space with uniform time per segment;
        # azimuth interpolates along the shorter wrap direction
        daz = np.diff(kf[:, 0])
        daz = (daz + np.pi) % (2 * np.pi) - np.pi
        kf[1:, 0] = kf[0, 0] + np.cumsum(daz)
        t = np.linspace(0.0, len(kfs) - 1.0, n)
        seg = np.clip(t.astype(int), 0, len(kfs) - 2)
        frac = t - seg
        interp = kf[seg] * (1 - frac)[:, None] + kf[seg + 1] * frac[:, None]
        frames = []
        for az, el, r in interp:
            c2w = np.eye(4, dtype=np.float64)
            c2w[:3, :4] = orbit_c2w_opengl(
                float(r), float(az), float(el), target=self.target
            )[:3, :4]
            frames.append({
                "camera_to_world": c2w.reshape(-1).tolist(),
                "fov": fov,
                "aspect": width / height,
            })
        return {
            "camera_type": "perspective",
            "render_width": width,
            "render_height": height,
            "fps": fps,
            "seconds": seconds,
            "camera_path": frames,
        }

    def update(self, params, step: int,
               metrics: Optional[Dict[str, float]] = None) -> None:
        import jax

        # snapshot to host: the training step donates its state, so holding
        # device buffers would dangle after the next step
        host = jax.tree.map(np.asarray, params)
        with self.lock:
            self.params = host
            self.step = int(step)
            if metrics is not None:
                self.training = True
                self.metrics = {
                    k: float(v) for k, v in metrics.items()
                    if isinstance(v, (int, float, np.floating))
                }

    def render_frame(self, az, el, radius, width, height,
                     crop=None, depth=False) -> np.ndarray:
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
            crop_box=crop if crop is not None else self.default_crop,
        )
        if depth and out.depth is not None:
            d = np.asarray(out.depth[..., 0])
            dn = (d - d.min()) / max(float(d.max() - d.min()), 1e-9)
            return np.stack([dn, dn, dn], axis=-1)
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
                    crop = None
                    if q.get("crop", ["0"])[0] == "1":
                        from qed_splatter_tpu.models.crop import CropBox

                        crop = CropBox(
                            center=(fget("ccx", 0), fget("ccy", 0),
                                    fget("ccz", 0)),
                            size=(fget("csx", 2), fget("csy", 2),
                                  fget("csz", 2)),
                        )
                    rgb = state.render_frame(
                        fget("az", 0.0), fget("el", 0.2), fget("r", 3.0),
                        int(fget("w", 640)), int(fget("h", 480)),
                        crop=crop,
                        depth=q.get("depth", ["0"])[0] == "1",
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
            elif url.path == "/webgl":
                from qed_splatter_tpu.viewer_webgl import WEBGL_PAGE

                body = WEBGL_PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/splats":
                from qed_splatter_tpu.engine.checkpoint import (
                    pack_splat_buffer,
                )

                with state.lock:
                    params = state.params
                    step = state.step
                if params is None:
                    body = b""
                else:
                    body = pack_splat_buffer(params)
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("X-Step", str(step if params is not None
                                               else 0))
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/meta":
                body = json.dumps(
                    {"target": list(map(float, state.target))}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/control":
                q = parse_qs(url.query)
                cmd = q.get("cmd", [""])[0]
                with state.lock:
                    if cmd == "pause":
                        state.paused = True
                    elif cmd == "resume":
                        state.paused = False
                    body = json.dumps({"paused": state.paused}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/keyframe":
                q = parse_qs(url.query)
                with state.lock:
                    if q.get("clear", ["0"])[0] == "1":
                        state.keyframes.clear()
                    else:
                        state.keyframes.append((
                            float(q.get("az", ["0"])[0]),
                            float(q.get("el", ["0.2"])[0]),
                            float(q.get("r", ["3.0"])[0]),
                        ))
                    body = json.dumps(
                        {"count": len(state.keyframes)}
                    ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/campath":
                q = parse_qs(url.query)
                try:
                    doc = state.camera_path_json(
                        seconds=float(q.get("seconds", ["5"])[0]),
                        fps=float(q.get("fps", ["24"])[0]),
                        width=int(q.get("w", ["1920"])[0]),
                        height=int(q.get("h", ["1080"])[0]),
                        fov=float(q.get("fov", ["50"])[0]),
                    )
                    body = json.dumps(doc, indent=2).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header(
                        "Content-Disposition",
                        'attachment; filename="camera_path.json"',
                    )
                except Exception as e:
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_response(400)
                    self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/status":
                with state.lock:
                    n = None
                    if state.params is not None:
                        n = int(np.sum(np.asarray(state.params.alive)))
                    body = json.dumps({
                        "step": state.step,
                        "ready": state.params is not None,
                        "training": state.training,
                        "paused": state.paused,
                        "metrics": state.metrics,
                        "gaussian_count": n,
                    }).encode()
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

    def __init__(self, cfg, port: int = 7007, target=(0.0, 0.0, 0.0),
                 crop=None):
        self.state = ViewerState(cfg, target=target, crop=crop)
        self.server = ThreadingHTTPServer(
            ("0.0.0.0", port), make_handler(self.state)
        )
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )

    def start(self) -> None:
        self.thread.start()
        print(f"Viewer running at http://localhost:{self.port} "
              f"(interactive WebGL: http://localhost:{self.port}/webgl)")

    def update(self, params, step,
               metrics: Optional[Dict[str, float]] = None) -> None:
        self.state.update(params, step, metrics)

    def stop(self) -> None:
        self.server.shutdown()
