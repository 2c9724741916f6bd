"""Minimal HTTP serving layer over :class:`CascadePipeline`.

The reference has no serving story at all — inference is the
``generate_images.py`` batch CLI (reference ``generate_images.py:19-374``).
This module adds a load-once/serve-many HTTP endpoint on top of the jitted
pipeline: models compile on startup, every request reuses the compiled
programs, and device access is serialized behind a lock (one TPU program
runs at a time anyway; queueing in-process beats queueing in XLA).

Endpoints
---------
``GET /healthz``                           liveness -> ``{"status": "ok"}``
``POST /generate`` ``{"num_images": N, "seed": S, "return_images": bool}``
    -> ``{"tokens": [[...]], "shape": [...], "images_png_b64": [...]}``
    (images rendered per-sample as PNG, base64; omitted unless requested)

Run: ``python serve_generation.py --config-path gen.json --decoder-path
model.pt --port 8000`` (plus ``--bf16`` for serving precision).
"""

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _render_png(image_chw):
    """(C, H, W) float BGR in [-1, 1] -> PNG bytes (RGB, like the grid
    writer's BGR->RGB flip, ``utils/image_io.py``)."""
    from PIL import Image
    arr = np.asarray(image_chw, np.float32)
    arr = np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)
    rgb = arr[::-1].transpose(1, 2, 0)  # BGR CHW -> RGB HWC
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    return buf.getvalue()


class GenerationServer:
    """Wraps a :class:`~qaig_tpu.infer.pipeline.CascadePipeline`.

    ``max_batch`` bounds per-request work (memory and latency); the
    device lock serializes generate calls across handler threads.
    ``batch_multiple`` > 1 enforces that ``num_images`` divides evenly
    over a sharded-generation mesh (see ``serve_generation.py
    --shard-batch``).
    """

    def __init__(self, pipeline, host="127.0.0.1", port=8000, max_batch=64,
                 batch_multiple=1):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.batch_multiple = max(1, batch_multiple)
        self._lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet by default
                pass

            def _reply(self, code, payload):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, {"status": "ok"})
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/generate":
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length) or b"{}")
                    num = int(req.get("num_images", 1))
                    seed = int(req.get("seed", 0))
                    want_images = bool(req.get("return_images", False))
                    if not 1 <= num <= server.max_batch:
                        self._reply(400, {
                            "error": f"num_images must be in "
                                     f"[1, {server.max_batch}]"})
                        return
                    if num % server.batch_multiple:
                        self._reply(400, {
                            "error": f"num_images must be a multiple of "
                                     f"{server.batch_multiple} (sharded "
                                     f"generation)"})
                        return
                    with server._lock:
                        images, tokens = server.pipeline.generate(
                            num, seed=seed)
                    payload = {
                        "tokens": np.asarray(tokens).tolist(),
                        "shape": list(np.asarray(images).shape),
                    }
                    if want_images:
                        payload["images_png_b64"] = [
                            base64.b64encode(_render_png(img)).decode()
                            for img in np.asarray(images)]
                    self._reply(200, payload)
                except Exception as e:  # surface as a JSON 500, keep serving
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = None

    @property
    def port(self):
        return self._httpd.server_address[1]

    def start(self, background=True):
        if background:
            self._thread = threading.Thread(
                target=self._httpd.serve_forever, daemon=True)
            self._thread.start()
        else:
            self._httpd.serve_forever()

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
