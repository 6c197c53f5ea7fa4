"""Persistent-refill wavefront produces the same image as per-pass
rendering: identical per-(pixel, pass) streams, only the accumulation
order differs (scatter-add vs running mean)."""

import os

import numpy as np
import pytest

from craytpu.scene.sceneloader import load_scene_from_file
from craytpu.scene.compile import compile_scene
from craytpu.models.wavefront_pt import WavefrontRenderer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_persistent_matches_per_pass():
    scene = load_scene_from_file(
        os.path.join(REPO, "assets", "entry_scene.json"))
    # small pool so the refill path actually exercises (96x64=6144 pixels,
    # pool 2048 -> multiple refill rounds per pass, queue spans passes)
    r = WavefrontRenderer(compile_scene(scene), tile_rays=2048)
    spp = 3
    per_pass = r.render(spp=spp)
    persistent = r.render_persistent(spp=spp)
    assert persistent.shape == per_pass.shape
    np.testing.assert_allclose(persistent, per_pass, rtol=2e-5, atol=2e-6)


def test_persistent_respects_bounce_cap():
    scene = load_scene_from_file(
        os.path.join(REPO, "assets", "entry_scene.json"))
    r0 = WavefrontRenderer(compile_scene(scene), bounces=1, tile_rays=2048)
    fb1 = r0.render_persistent(spp=1)
    fb_full = r0.render(spp=1)
    np.testing.assert_allclose(fb1, fb_full, rtol=2e-5, atol=2e-6)
