"""Live preview server: frames stream over HTTP multipart (C16 re-scoped)."""
import http.client

import numpy as np

from ai_path_tracer_denoiser_tpu.utils.preview import PreviewServer


def test_preview_streams_frames():
    server = PreviewServer(port=0, host="127.0.0.1")
    try:
        frame = np.zeros((16, 16, 3), np.float32)
        frame[:, :8] = [1.0, 0.0, 0.0]
        server.push(frame)

        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=10)
        conn.request("GET", "/")
        page = conn.getresponse()
        assert page.status == 200
        assert b"/stream" in page.read()
        conn.close()

        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=10)
        conn.request("GET", "/stream")
        resp = conn.getresponse()
        assert resp.status == 200
        assert "multipart/x-mixed-replace" in resp.getheader("Content-Type")
        head = resp.fp.readline()          # --frame boundary
        assert b"--frame" in head
        ctype = resp.fp.readline()
        assert b"image/" in ctype
        clen = int(resp.fp.readline().split(b":")[1])
        resp.fp.readline()                 # blank
        body = resp.fp.read(clen)
        assert len(body) == clen and clen > 50
        # JPEG (PIL) or PNG (stdlib fallback) magic
        assert body[:2] == b"\xff\xd8" or body[:4] == b"\x89PNG"[:4]
        conn.close()
    finally:
        server.close()
