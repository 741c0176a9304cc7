"""Interactive HTTP viewer — the network_gui analogue.

The reference wires a custom socket protocol to the SIBR viewer
(gaussian_splatting/gaussian_renderer/network_gui.py:26-85); here a tiny
dependency-free HTTP server renders the current model on demand:

  GET /                         orbit viewer page (vanilla JS, drag to orbit)
  GET /render?az=..&el=..&r=..  PNG render from the orbit camera
  GET /state                    JSON scene stats

Use from a trainer by passing a `get_model()` callable returning the
current activated gaussian arrays; rendering runs on whatever backend the
config selects. Start with `serve(...)` (blocking) or `start(...)` (thread).
"""

from __future__ import annotations

import io
import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html><html><body style="margin:0;background:#111">
<img id=v width=100% style="image-rendering:pixelated">
<script>
let az=0, el=0.3, r=3.5, drag=false, lx=0, ly=0, busy=false;
const img=document.getElementById('v');
function refresh(){ if(busy) return; busy=true;
  const i=new Image();
  i.onload=()=>{ img.src=i.src; busy=false; };
  i.src=`/render?az=${az.toFixed(3)}&el=${el.toFixed(3)}&r=${r.toFixed(2)}&t=${Date.now()}`; }
img.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{ if(!drag) return;
  az+=(e.clientX-lx)*0.01; el=Math.max(-1.4,Math.min(1.4,el+(e.clientY-ly)*0.01));
  lx=e.clientX; ly=e.clientY; refresh(); };
window.onwheel=e=>{ r=Math.max(0.5,r*(1+e.deltaY*0.001)); refresh(); };
refresh(); setInterval(refresh, 2000);
</script></body></html>"""


def _orbit_camera(az, el, radius, target=(0.0, 0.0, 0.0), fov_deg=50.0):
    from frosting_tpu.cameras import look_at_camera

    eye = [
        target[0] + radius * math.cos(el) * math.cos(az),
        target[1] + radius * math.cos(el) * math.sin(az),
        target[2] + radius * math.sin(el),
    ]
    return look_at_camera(
        eye=eye, target=list(target), up=(0, 0, 1),
        fov_x=math.radians(fov_deg),
    )


def make_handler(get_model, rcfg, target=(0.0, 0.0, 0.0)):
    import jax
    import jax.numpy as jnp

    from frosting_tpu.raster import render

    @jax.jit
    def render_cam(model, cam):
        means, scales, quats, opac, sh = model
        return jnp.clip(
            render(means, scales, quats, opac, sh, cam, rcfg).image, 0, 1
        )

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence request spam
            pass

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self._send(200, "text/html", _PAGE.encode())
            elif url.path == "/render":
                q = parse_qs(url.query)
                az = float(q.get("az", ["0"])[0])
                el = float(q.get("el", ["0.3"])[0])
                r = float(q.get("r", ["3.5"])[0])
                cam = _orbit_camera(az, el, r, target)
                img = np.asarray(render_cam(get_model(), cam))
                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray(
                    (img.transpose(1, 2, 0) * 255).astype(np.uint8)
                ).save(buf, "PNG")
                self._send(200, "image/png", buf.getvalue())
            elif url.path == "/state":
                model = get_model()
                self._send(
                    200,
                    "application/json",
                    json.dumps(
                        {"n_gaussians": int(model[0].shape[0])}
                    ).encode(),
                )
            else:
                self._send(404, "text/plain", b"not found")

    return Handler


def start(get_model, rcfg, port=8008, target=(0.0, 0.0, 0.0)):
    """Run the viewer in a daemon thread; returns the server object."""
    server = ThreadingHTTPServer(
        ("0.0.0.0", port), make_handler(get_model, rcfg, target)
    )
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    return server


def serve(get_model, rcfg, port=8008, target=(0.0, 0.0, 0.0)):
    start(get_model, rcfg, port, target).serve_forever()
