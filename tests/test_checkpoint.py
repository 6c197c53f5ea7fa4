"""Checkpoint/resume: progressive round trip, persistent interrupt ->
checkpoint -> resume equals the uninterrupted render, and the CLI arg
parser not eating flag values as the scene path."""

import os

import numpy as np
import pytest

from craytpu.runtime import checkpoint
from craytpu.scene.sceneloader import load_scene_from_file
from craytpu.scene.compile import compile_scene
from craytpu.models.wavefront_pt import WavefrontRenderer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENE = os.path.join(REPO, "assets", "entry_scene.json")


def test_progressive_roundtrip(tmp_path):
    p = str(tmp_path / "c.npz")
    acc = np.random.default_rng(0).normal(size=(4, 6, 4)).astype(np.float32)
    checkpoint.save(p, acc, 3, 16)
    assert checkpoint.kind(p) == "progressive"
    a2, done, total = checkpoint.load(p)
    np.testing.assert_array_equal(a2, acc)
    assert (done, total) == (3, 16)


def test_persistent_roundtrip(tmp_path):
    p = str(tmp_path / "c.npz")
    fs = np.ones((24, 4), np.float32)
    pend = np.array([5, 99, 12], np.int64)
    ranges = [[100, 120], [150, 192]]  # one per device of the render
    checkpoint.save_persistent(p, fs, pend, ranges, 8, (4, 6))
    assert checkpoint.kind(p) == "persistent"
    resume, total, shape = checkpoint.load_persistent(p)
    np.testing.assert_array_equal(resume["final_sum"], fs)
    np.testing.assert_array_equal(resume["pending"], pend)
    assert resume["ranges"] == ranges
    assert total == 8 and shape == (4, 6)


def test_persistent_interrupt_resume_lossless(monkeypatch):
    """Interrupt a persistent render mid-flight, checkpoint, resume: the
    final image must equal the uninterrupted render exactly (same paths
    traced once each; only float accumulation order may differ)."""
    # k=1 keeps paths in flight at the first refill boundary (the fused
    # drain steps would kill the whole tiny pool before any boundary)
    monkeypatch.setenv("CRAYTPU_POOL_K", "1")
    scene = load_scene_from_file(SCENE)
    r = WavefrontRenderer(compile_scene(scene), tile_rays=8192)
    spp = 3
    ref = r.render_persistent(spp=spp)

    calls = []

    def interrupt():
        calls.append(1)
        return True  # stop at the first refill boundary (paths in flight)

    out = r.render_persistent(spp=spp, interrupt=interrupt)
    assert isinstance(out, tuple) and out[0] == "interrupted"
    _, final_sum, pending, ranges = out
    npix = r.width * r.height
    assert ranges and 0 < ranges[0][0] <= npix * spp
    assert len(pending) > 0          # genuinely mid-flight

    resumed = r.render_persistent(
        spp=spp, resume={"final_sum": final_sum, "pending": pending,
                         "ranges": ranges})
    np.testing.assert_allclose(resumed, ref, rtol=2e-5, atol=2e-6)

    # a v1-era resume dict (single qpos) still loads via the checkpoint
    # module: round trip through the on-disk format
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "c.npz")
        checkpoint.save_persistent(p, final_sum, pending, ranges, spp,
                                   (r.height, r.width))
        resume2, total2, shape2 = checkpoint.load_persistent(p)
        assert total2 == spp and shape2 == (r.height, r.width)
        resumed2 = r.render_persistent(spp=spp, resume=resume2)
        np.testing.assert_allclose(resumed2, ref, rtol=2e-5, atol=2e-6)


def test_args_resume_value_not_scene(tmp_path):
    from craytpu import args as cliargs
    ckpt = tmp_path / "ckpt.npz"
    ckpt.write_bytes(b"x")
    scene = tmp_path / "scene.json"
    scene.write_text("{}")
    opts = cliargs.parse_args(["--resume", str(ckpt), str(scene)])
    assert opts["inputFile"] == str(scene)
    assert opts["resume"] == str(ckpt)
    # --resume before (or without) the scene must not claim the ckpt file
    opts = cliargs.parse_args(["--resume", str(ckpt)])
    assert "inputFile" not in opts


def test_persistent_interrupt_latency_bounded(monkeypatch):
    """The interrupt callable is polled once per pool dispatch, so an
    abort lands within ONE step at ANY render phase — including mid-render
    with a full pool where no refill is eligible (the round-2 gap)."""
    monkeypatch.setenv("CRAYTPU_POOL_K", "1")
    scene = load_scene_from_file(SCENE)
    r = WavefrontRenderer(compile_scene(scene), tile_rays=8192)

    steps = []
    orig = r._pool_step

    def counted(k):
        f = orig(k)

        def g(*a):
            steps.append(1)
            return f(*a)
        return g
    r._pool_step = counted

    polls = []

    def interrupt():
        polls.append(1)
        return len(polls) >= 3   # fire mid-render, before any drain

    out = r.render_persistent(spp=3, interrupt=interrupt)
    assert isinstance(out, tuple) and out[0] == "interrupted"
    # at most one dispatch per poll + the initial one: firing at poll 3
    # must stop the loop within the next dispatch
    assert len(steps) <= len(polls) + 1, (len(steps), len(polls))


def test_args_trace_preview_values_not_scene(tmp_path):
    from craytpu import args as cliargs
    scene = tmp_path / "scene.json"
    scene.write_text("{}")
    tdir = tmp_path / "trc"
    tdir.mkdir()
    # --trace <existing path> before the scene: the path is the trace dir,
    # not the scene (same misparse class as --resume)
    opts = cliargs.parse_args(["--trace", str(tdir), str(scene)])
    assert opts["inputFile"] == str(scene)
    assert opts["trace_dir"] == str(tdir)
    # --preview N: the integer is the pass interval, not a scene candidate
    opts = cliargs.parse_args(["--preview", "4", str(scene)])
    assert opts["inputFile"] == str(scene)
    assert opts["preview"] == 4
    # --preview directly followed by the scene still finds the scene
    opts = cliargs.parse_args(["--preview", str(scene)])
    assert opts["inputFile"] == str(scene)
    assert opts["preview"] is True
