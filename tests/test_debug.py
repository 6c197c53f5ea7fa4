"""CRAYTPU_DEBUG: the TPU-native analogue of the reference's opt-in
ASan/UBSan builds (CMakeLists.txt:44-55, rebuild/asan + rebuild/ubsan).

One env var turns a NaN escaping any bsdf/material evaluation into a
RAISED error (checkify invariant checks on the bounce step + global
jax_debug_nans) instead of a silent black pixel."""

import json

import jax
import numpy as np
import pytest

from craytpu.scene.sceneloader import load_scene_from_buf
from craytpu.scene.compile import compile_scene
from craytpu.models.wavefront_pt import WavefrontRenderer

SCENE = {
    "renderer": {"samples": 1, "bounces": 4, "width": 16, "height": 12},
    "camera": {"FOV": 70.0, "transforms": [
        {"type": "translate", "x": 0, "y": 0, "z": -4}]},
    "scene": {
        "ambientColor": {"down": {"r": 0.2, "g": 0.2, "b": 0.2},
                         "up": {"r": 0.6, "g": 0.6, "b": 0.8}},
        "primitives": [
            {"type": "sphere", "radius": 1.2,
             "color": {"r": 0.7, "g": 0.3, "b": 0.2},
             "bsdf": "lambertian",
             "instances": [{"transforms": [
                 {"type": "translate", "x": 0, "y": 0, "z": 0}]}]},
        ],
    },
}


@pytest.fixture
def debug_env(monkeypatch):
    monkeypatch.setenv("CRAYTPU_DEBUG", "1")
    yield
    # jax_debug_nans is a process-global config; restore for later tests
    jax.config.update("jax_debug_nans", False)


def _render_poisoned(poison: bool):
    scene = load_scene_from_buf(json.dumps(SCENE))
    cs = compile_scene(scene)
    if poison:
        colors = np.asarray(cs.params.colors).copy()
        colors[:, 0] = np.nan      # a NaN albedo channel — the "bad bsdf"
        cs.params = cs.params._replace(colors=jax.numpy.asarray(colors))
    r = WavefrontRenderer(cs)
    assert r._debug
    return r.render(spp=1)


def test_debug_mode_raises_on_nan_material(debug_env):
    with pytest.raises(Exception) as ei:
        _render_poisoned(True)
    msg = str(ei.value)
    assert "nan" in msg.lower() or "non-finite" in msg.lower()


def test_debug_mode_clean_render_passes(debug_env):
    img = _render_poisoned(False)
    assert np.isfinite(img).all()


def test_debug_off_by_default(monkeypatch):
    monkeypatch.delenv("CRAYTPU_DEBUG", raising=False)
    scene = load_scene_from_buf(json.dumps(SCENE))
    r = WavefrontRenderer(compile_scene(scene))
    assert not r._debug
