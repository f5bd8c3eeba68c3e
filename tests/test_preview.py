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


def test_camera_control_endpoint():
    """/camera query params reach the render loop via pop_camera():
    relative d* keys accumulate across requests, absolute keys overwrite,
    unknown/garbage keys are ignored (main.cpp:169-223 analogue)."""
    import urllib.request

    from ai_path_tracer_denoiser_tpu.utils.preview import PreviewServer

    server = PreviewServer(port=0)
    try:
        base = f"http://127.0.0.1:{server.port}"
        for q in ("dphi=0.1", "dphi=0.2&theta=1.5", "zoom=9&junk=1&phi=abc"):
            req = urllib.request.urlopen(f"{base}/camera?{q}", timeout=5)
            assert req.status == 204
        cam = server.pop_camera()
        assert abs(cam["dphi"] - 0.3) < 1e-9     # accumulated
        assert cam["theta"] == 1.5               # absolute
        assert cam["zoom"] == 9.0
        assert "junk" not in cam and "phi" not in cam
        assert server.pop_camera() == {}         # drained
    finally:
        server.close()
