"""Live HTTP preview server (runtime/preview.py): page, frame, status."""

import json
import urllib.request

import numpy as np

from craytpu.runtime.preview import PreviewServer


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.read(), r.headers.get("Content-Type")


def test_preview_server_serves_frame_and_status():
    srv = PreviewServer(32, 24, port=0)   # ephemeral port
    base = srv.start()
    try:
        fb = np.zeros((24, 32, 4), np.float32)
        fb[:, :, 0] = 0.5
        srv.update(fb, done=100, total=400)

        body, ctype = _get(base)
        assert b"craytpu live render" in body and "html" in ctype

        png, ctype = _get(base + "frame.png")
        assert ctype == "image/png" and png[:8] == b"\x89PNG\r\n\x1a\n"

        status, ctype = _get(base + "status.json")
        s = json.loads(status)
        assert s["done"] == 100 and s["total"] == 400
        assert s["version"] == 1

        # progress-only updates bump counters without re-encoding
        srv.progress_only(200, 400)
        s2 = json.loads(_get(base + "status.json")[0])
        assert s2["done"] == 200 and s2["version"] == 1

        # 404 for unknown path
        try:
            _get(base + "nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()
