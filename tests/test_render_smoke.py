"""End-to-end smoke tests on a tiny sphere scene (no meshes)."""

import json

import numpy as np
import pytest

from craytpu.scene.sceneloader import load_scene_from_buf

SPHERE_SCENE = {
    "renderer": {
        "samples": 2, "bounces": 4, "width": 32, "height": 24,
        "tileWidth": 16, "tileHeight": 16, "outputFilePath": "output/",
        "outputFileName": "smoke",
    },
    "camera": {
        "FOV": 80.0,
        "transforms": [{"type": "translate", "x": 0, "y": 0, "z": -5}],
    },
    "scene": {
        "ambientColor": {
            "down": {"r": 1.0, "g": 1.0, "b": 1.0},
            "up": {"r": 0.5, "g": 0.7, "b": 1.0},
        },
        "primitives": [
            {
                "type": "sphere", "radius": 1.0,
                "color": {"r": 0.9, "g": 0.1, "b": 0.1},
                "bsdf": "lambertian",
                "instances": [{"transforms": [
                    {"type": "translate", "x": 0, "y": 0, "z": 0}]}],
            },
            {
                "type": "sphere", "radius": 0.5,
                "color": {"r": 1.0, "g": 1.0, "b": 1.0},
                "bsdf": "emissive", "intensity": 5.0,
                "instances": [{"transforms": [
                    {"type": "translate", "x": 2, "y": 1, "z": 0}]}],
            },
        ],
    },
}


@pytest.fixture(scope="module")
def sphere_scene():
    return load_scene_from_buf(json.dumps(SPHERE_SCENE))


def test_scene_loads(sphere_scene):
    s = sphere_scene
    assert len(s.spheres) == 2
    assert len(s.instances) == 2
    assert s.prefs.sample_count == 2
    assert s.prefs.bounces == 4
    assert s.camera.width == 32
    assert s.tlas.node_count >= 1


def test_compile(sphere_scene):
    from craytpu.scene.compile import compile_scene
    cs = compile_scene(sphere_scene)
    assert cs.n_instances == 2
    assert len(cs.graphs) >= 1
    # emissive sphere keeps its legacy emission (intensity * color)
    em = np.asarray(cs.params.emission)
    assert em.max() == 5.0


def test_render_pass_executes(sphere_scene):
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import render
    cs = compile_scene(sphere_scene)
    fb = render(cs, spp=2)
    assert fb.shape == (24, 32, 4)
    assert np.isfinite(fb).all()
    # background visible in a corner, sphere visible in the middle
    assert fb[..., :3].max() > 0.1
    # center pixel should be the red diffuse sphere (reddish)
    c = fb[12, 16]
    assert c[0] > c[2]


def test_render_deterministic(sphere_scene):
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import render
    cs = compile_scene(sphere_scene)
    fb1 = render(cs, spp=1)
    fb2 = render(cs, spp=1)
    np.testing.assert_array_equal(fb1, fb2)


def test_png_write(tmp_path, sphere_scene):
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import render
    from craytpu.io.png import write_png, write_bmp
    cs = compile_scene(sphere_scene)
    fb = render(cs, spp=1)
    p = tmp_path / "out.png"
    write_png(str(p), fb, {"Samples per pixel": "1"})
    assert p.exists() and p.stat().st_size > 100
    b = tmp_path / "out.bmp"
    write_bmp(str(b), fb)
    assert b.exists()
