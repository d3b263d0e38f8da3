"""Interactive progressive viewer — the `online` frontend analogue.

The reference's online binary (online/main.zig:73-435) is a GLFW window with
per-frame 1-spp accumulation, fly-camera keys, a metrics panel, and live
scene edits. A TPU host is headless, so the same capability ships as:

  * `Viewer` — progressive accumulate + fly camera (WASD forward/strafe,
    R/F up/down, Q/E yaw — online/main.zig:442-483 key map; any camera move
    restarts accumulation like the reference's sensor reset)
  * `Viewer.run_web()` — a zero-dependency stdlib HTTP viewer: browser shows
    the live tonemapped frame, forwards keystrokes, displays sample count +
    frame time (the ImGui metrics-panel analogue)
  * `Viewer.screenshot()` — tonemapped PNG

Scene edits go through the wrapped Engine exactly like the reference's GUI
(material/transform edits + pipeline rebuild).
"""

from __future__ import annotations

import io
import json
import threading
import time

import numpy as np

from ..engine import Engine
from ..scene.types import Lens


def tonemap(linear: np.ndarray, exposure: float = 1.0) -> np.ndarray:
    """Linear HDR -> sRGB u8 (the reference blits to an sRGB swapchain)."""
    c = np.clip(linear[..., :3] * exposure, 0.0, 1.0)
    srgb = np.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1 / 2.4) - 0.055)
    return (srgb * 255.0 + 0.5).astype(np.uint8)


class Viewer:
    MOVE_SPEED = 0.25
    TURN_SPEED = 0.1
    # background render loop pauses when no client has polled for this long
    # (a forgotten browser tab must not peg the chip forever)
    IDLE_TIMEOUT = 10.0

    def __init__(self, engine: Engine, lens: Lens, width=512, height=512):
        self.engine = engine
        self.width = width
        self.height = height
        self.lens = lens
        self.sensor = engine.create_sensor(width, height)
        self.lens_handle = engine.create_lens(lens)
        self.exposure = 1.0
        # default accumulation cap (GUI max-samples control); 0 = unbounded.
        # A converged frame stops burning the chip; any camera move or
        # reset() restarts accumulation from zero.
        self.max_samples = 4096
        self._last_poll = time.time()
        self._stop = threading.Event()

    # --- camera fly controls (online/main.zig:442-483) ---

    def _basis(self):
        f = self.lens.forward / np.linalg.norm(self.lens.forward)
        up = self.lens.up / np.linalg.norm(self.lens.up)
        right = np.cross(f, up)
        right /= np.linalg.norm(right)
        return f, up, right

    def handle_key(self, key: str):
        f, up, right = self._basis()
        moved = True
        o = np.asarray(self.lens.origin, np.float32)
        if key == "w":
            o = o + f * self.MOVE_SPEED
        elif key == "s":
            o = o - f * self.MOVE_SPEED
        elif key == "a":
            o = o - right * self.MOVE_SPEED
        elif key == "d":
            o = o + right * self.MOVE_SPEED
        elif key == "r":
            o = o + up * self.MOVE_SPEED
        elif key == "f":
            o = o - up * self.MOVE_SPEED
        elif key in ("q", "e"):
            ang = self.TURN_SPEED if key == "q" else -self.TURN_SPEED
            c, s = np.cos(ang), np.sin(ang)
            new_f = f * c + np.cross(up, f) * s + up * np.dot(up, f) * (1 - c)
            self.lens = Lens(
                origin=o, forward=new_f.astype(np.float32), up=self.lens.up,
                vfov=self.lens.vfov, aperture=self.lens.aperture,
                focus_distance=self.lens.focus_distance,
            )
            moved = True
            self._apply_lens()
            return
        elif key == "0":
            self.reset()
            return
        else:
            moved = False
        if moved:
            self.lens = Lens(
                origin=o.astype(np.float32), forward=self.lens.forward,
                up=self.lens.up, vfov=self.lens.vfov,
                aperture=self.lens.aperture,
                focus_distance=self.lens.focus_distance,
            )
            self._apply_lens()

    def _apply_lens(self):
        self.engine.set_lens(self.lens_handle, self.lens)
        self.reset()  # camera moved -> restart accumulation

    def reset(self):
        self.engine.reset_sensor(self.sensor)

    # --- frame loop ---

    def step(self) -> np.ndarray:
        """One 1-spp accumulate; returns the running-mean RGBA frame."""
        if self.max_samples and (
            self.engine.sample_count(self.sensor) >= self.max_samples
        ):
            return self.engine.get_sensor_data(self.sensor)
        return self.engine.render(self.sensor, self.lens_handle)

    def frame_png(self) -> bytes:
        from PIL import Image

        rgb = tonemap(self.engine.get_sensor_data(self.sensor), self.exposure)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, "PNG")
        return buf.getvalue()

    def screenshot(self, path):
        with open(path, "wb") as f:
            f.write(self.frame_png())

    def status(self) -> dict:
        m = self.engine.metrics
        return {
            "samples": self.engine.sample_count(self.sensor),
            "last_frame_seconds": m.get("last_frame_seconds", 0.0),
            "mrays_per_sec": m.get("last_mrays_per_sec", 0.0),
            "origin": np.asarray(self.lens.origin).tolist(),
        }

    # --- web frontend ---

    def run_web(self, port: int = 8000, host: str = "127.0.0.1",
                background_render: bool = True):
        """Serve the live view; blocks. Keys are forwarded from the browser."""
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        viewer = self

        if background_render:
            def loop():
                while not viewer._stop.is_set():
                    idle = (
                        time.time() - viewer._last_poll > viewer.IDLE_TIMEOUT
                    )
                    done = viewer.max_samples and (
                        viewer.engine.sample_count(viewer.sensor)
                        >= viewer.max_samples
                    )
                    if idle or done:
                        time.sleep(0.25)
                        continue
                    viewer.step()

            threading.Thread(target=loop, daemon=True).start()

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code, body, ctype):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                viewer._last_poll = time.time()
                if self.path == "/":
                    self._send(200, _INDEX_HTML.encode(), "text/html")
                elif self.path.startswith("/frame.png"):
                    self._send(200, viewer.frame_png(), "image/png")
                elif self.path == "/status":
                    self._send(
                        200, json.dumps(viewer.status()).encode(),
                        "application/json",
                    )
                else:
                    self._send(404, b"not found", "text/plain")

            def do_POST(self):
                if self.path.startswith("/key/"):
                    viewer.handle_key(self.path.rsplit("/", 1)[-1])
                    self._send(200, b"ok", "text/plain")
                else:
                    self._send(404, b"not found", "text/plain")

        server = ThreadingHTTPServer((host, port), Handler)
        try:
            server.serve_forever()
        finally:
            viewer._stop.set()


_INDEX_HTML = """<!doctype html>
<title>moonshine_tpu</title>
<style>body{background:#111;color:#ccc;font-family:monospace;text-align:center}</style>
<h3>moonshine_tpu — WASD move, R/F up/down, Q/E turn, 0 reset</h3>
<img id=v width=70%><div id=s></div>
<script>
const img=document.getElementById('v'), st=document.getElementById('s');
function tick(){img.src='/frame.png?'+Date.now();
 fetch('/status').then(r=>r.json()).then(j=>{
  st.textContent=`samples ${j.samples} | frame ${(j.last_frame_seconds*1e3).toFixed(0)}ms | ${j.mrays_per_sec.toFixed(2)} Mrays/s`});}
setInterval(tick, 500); tick();
document.addEventListener('keydown', e=>fetch('/key/'+e.key,{method:'POST'}));
</script>"""
