"""HTTP presentation shell — the analogue of the reference's web shell
(web/index.html + the wasm canvas glue, src/lib.rs:1255-1300).

Serves:
  /            a minimal page with the live view + WASD/orbit key capture
  /stream      MJPEG stream of rendered frames
  /frame.png   the latest frame as PNG
  /key?k=w&p=1 key events (pressed p=1 / released p=0)
  /stats       JSON frame statistics

Stdlib-only (http.server); frames come from a FrameLoop running in a
background thread.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from .frame_loop import FrameLoop

_PAGE = b"""<!doctype html>
<html><head><title>rust_wgpu_raytracing_tpu</title></head>
<body style="background:#111;color:#eee;font-family:monospace">
<h3>rust_wgpu_raytracing_tpu &mdash; TPU ray tracer</h3>
<img id="v" src="/stream" style="image-rendering:pixelated">
<p>WASD/arrows orbit &middot; space/shift up-down (reference key map)</p>
<script>
const send=(k,p)=>fetch(`/key?k=${encodeURIComponent(k)}&p=${p?1:0}`);
onkeydown=e=>send(e.key.toLowerCase(),1);
onkeyup=e=>send(e.key.toLowerCase(),0);
</script></body></html>
"""


class RenderServer:
    def __init__(self, loop: FrameLoop, host: str = "127.0.0.1",
                 port: int = 8080):
        self.loop = loop
        self.latest: np.ndarray | None = None
        self.frame_event = threading.Event()
        self._closing = threading.Event()
        loop.present = self._on_frame
        self.httpd = ThreadingHTTPServer((host, port), self._handler())
        self.port = self.httpd.server_address[1]

    def _on_frame(self, img: np.ndarray):
        self.latest = img
        self.frame_event.set()
        self.frame_event = threading.Event()

    def _encode_jpeg(self, img) -> bytes:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=85)
        return buf.getvalue()

    def _encode_png(self, img) -> bytes:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        return buf.getvalue()

    def _handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
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
                    self._send(200, "text/html", _PAGE)
                elif url.path == "/frame.png":
                    img = server.latest
                    if img is None:
                        self._send(503, "text/plain", b"no frame yet")
                    else:
                        self._send(200, "image/png", server._encode_png(img))
                elif url.path == "/key":
                    q = parse_qs(url.query)
                    key = q.get("k", [""])[0]
                    pressed = q.get("p", ["1"])[0] == "1"
                    mapping = {"arrowup": "up", "arrowdown": "down",
                               "arrowleft": "left", "arrowright": "right",
                               " ": "space", "shift": "lshift"}
                    server.loop.push_key(mapping.get(key, key), pressed)
                    self._send(200, "text/plain", b"ok")
                elif url.path == "/stats":
                    body = json.dumps({
                        **server.loop.profiler.summary(),
                        "frames_rendered": server.loop.frame_index,
                        "size": [server.loop.renderer.width,
                                 server.loop.renderer.height],
                    }).encode()
                    self._send(200, "application/json", body)
                elif url.path == "/stream":
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=frame")
                    self.end_headers()
                    try:
                        sent_first = False
                        # exit on client disconnect OR server shutdown
                        # (a connected client must not pin the handler
                        # thread forever after shutdown())
                        while not server._closing.is_set():
                            ev = server.frame_event
                            fired = ev.wait(timeout=5.0)
                            # stream until the CLIENT goes away: gating
                            # on loop.running killed streams opened
                            # before run() started; and only (re)send
                            # when a new frame actually arrived (or
                            # once at connect, so the page shows the
                            # last frame of a paused loop)
                            if not fired and sent_first:
                                continue
                            img = server.latest
                            if img is None:
                                continue
                            jpg = server._encode_jpeg(img)
                            self.wfile.write(
                                b"--frame\r\nContent-Type: image/jpeg\r\n"
                                + f"Content-Length: {len(jpg)}\r\n\r\n".encode()
                                + jpg + b"\r\n")
                            sent_first = True
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                else:
                    self._send(404, "text/plain", b"not found")

        return Handler

    def serve_async(self) -> threading.Thread:
        th = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        th.start()
        return th

    def shutdown(self):
        self._closing.set()
        self.frame_event.set()  # wake blocked stream handlers now
        self.httpd.shutdown()
