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


def test_preview_regions_endpoint():
    """Per-region progress grid (ui.c:236-320 analogue): the tracker's
    snapshot shows scheduled-order completion and the in-flight window,
    and the status endpoint carries it to the overlay."""
    from craytpu.runtime.regions import RegionTracker

    W, H, SPP = 64, 40, 4
    # row-major schedule, fb y-up
    xs = np.tile(np.arange(W, dtype=np.int32), H)
    ys = np.repeat(np.arange(H, dtype=np.int32), W)
    tr = RegionTracker(W, H, xs, ys, gw=4, gh=4)
    npix = W * H

    # nothing issued
    frac, infl = tr.snapshot(0, SPP, pool_lanes=256)
    assert frac.shape == (4, 4) and not infl.any() and frac.sum() == 0

    # half the first pass issued, 256-lane live window: schedule starts
    # at fb y=0 (image BOTTOM) -> bottom grid rows retire first
    frac, infl = tr.snapshot(npix // 2, SPP, pool_lanes=256)
    assert frac[3].min() > 0            # bottom row has retired paths
    assert frac[0].max() == 0           # top row untouched
    assert infl.any()

    # everything issued and drained
    frac, infl = tr.snapshot(npix * SPP, SPP, pool_lanes=0)
    assert np.allclose(frac, 1.0) and not infl.any()

    srv = PreviewServer(W, H, port=0)
    base = srv.start()
    try:
        srv.update(np.zeros((H, W, 4), np.float32), done=10, total=100)
        srv.update_regions(frac, infl)
        s = json.loads(_get(base + "status.json")[0])
        assert len(s["regions"]) == 4 and len(s["regions"][0]) == 4
        assert s["regions"][0][0] == 1.0
        assert s["inflight"][0][0] == 0
    finally:
        srv.stop()
