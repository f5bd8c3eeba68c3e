"""Live preview server — the GLFW/PBO window's headless replacement.

The reference blits every frame into an OpenGL window via a CUDA-mapped
PBO (preview.cpp:109-203) and shows the denoised tensor with cv::imshow
(main.cpp:89-100).  TPU pods are headless, so the equivalent surface is a
tiny in-process HTTP server streaming frames as multipart
``x-mixed-replace`` (MJPEG when PIL is available, PNG parts otherwise —
both render live in any browser):

    python -m ai_path_tracer_denoiser_tpu.app interactive scene.txt --serve 8000
    # then open http://localhost:8000/

Pure stdlib + optional PIL; zero new dependencies.  The server holds only
the latest encoded frame (drop-not-queue, like a swapchain), so a slow
viewer can never stall the render loop.
"""
from __future__ import annotations

import io
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = b"""<!doctype html><html><head><title>ai_path_tracer_denoiser_tpu</title>
<style>body{background:#111;margin:0;display:grid;place-items:center;height:100vh}
img{image-rendering:pixelated;max-width:96vw;max-height:96vh}</style></head>
<body><img src="/stream"></body></html>"""


def _encode(frame: np.ndarray):
    """uint8 (H, W, 3) -> (mime, bytes). JPEG via PIL, else stdlib PNG."""
    try:
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="JPEG", quality=90)
        return "image/jpeg", buf.getvalue()
    except ImportError:
        from .imageio import encode_png
        return "image/png", encode_png(frame)


class PreviewServer:
    """Threaded frame streamer; ``push()`` swaps in the newest frame."""

    def __init__(self, port: int = 8000, host: str = "127.0.0.1"):
        # Loopback by default: the stream is unauthenticated, so exposing
        # it on all interfaces of a shared TPU host must be an explicit
        # choice (pass host="0.0.0.0" / --serve-host to opt in).
        self._frame = None          # (mime, bytes)
        self._seq = 0
        self._cond = threading.Condition()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # silence per-request spam
                pass

            def do_GET(self):
                if self.path == "/stream":
                    self._stream()
                else:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(_PAGE)

            def _stream(self):
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=frame")
                self.end_headers()
                seen = -1
                try:
                    while True:
                        with outer._cond:
                            outer._cond.wait_for(
                                lambda: outer._seq != seen, timeout=5.0)
                            if outer._frame is None:
                                continue
                            seen = outer._seq
                            mime, data = outer._frame
                        self.wfile.write(b"--frame\r\n")
                        self.wfile.write(
                            f"Content-Type: {mime}\r\n"
                            f"Content-Length: {len(data)}\r\n\r\n".encode())
                        self.wfile.write(data)
                        self.wfile.write(b"\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    pass         # viewer closed the tab

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()

    def push(self, frame: np.ndarray):
        """Publish a float [0,1] or uint8 (H, W, 3) frame."""
        arr = np.asarray(frame)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        encoded = _encode(np.ascontiguousarray(arr))
        with self._cond:
            self._frame = encoded
            self._seq += 1
            self._cond.notify_all()

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()
