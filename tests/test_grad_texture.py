"""Gradient coverage at the mesh+texture scale (VERDICT round-1 weak item
4): FD-validate texel gradients on a scene with a TEXTURED OBJ mesh (image
node -> params.texels), not just sphere-only constant-color scenes."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from craytpu.scene.sceneloader import load_scene_from_buf
from craytpu.scene.compile import compile_scene
from craytpu.models.wavefront_pt import WavefrontRenderer

W, H = 24, 16


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("texgrad")
    from PIL import Image
    rng = np.random.default_rng(11)
    tex = (rng.uniform(0.2, 0.9, (4, 4, 3)) * 255).astype(np.uint8)
    Image.fromarray(tex).save(d / "checker.png")
    # textured quad (two triangles) facing the camera
    (d / "quad.obj").write_text(
        "mtllib quad.mtl\n"
        "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "vn 0 0 -1\n"
        "usemtl tex\n"
        "f 1/1/1 2/2/1 3/3/1\nf 1/1/1 3/3/1 4/4/1\n")
    (d / "quad.mtl").write_text(
        "newmtl tex\nKd 1.0 1.0 1.0\nmap_Kd checker.png\nillum 2\n")
    scene_json = """{
      "renderer": {"samples": 2, "bounces": 2, "width": %d, "height": %d},
      "camera": {"FOV": 70.0, "transforms": [
          {"type": "translate", "x": 0, "y": 0, "z": -2.5}]},
      "scene": {
        "ambientColor": {"down": {"r": 0.8, "g": 0.8, "b": 0.8},
                         "up": {"r": 0.8, "g": 0.8, "b": 0.8}},
        "meshes": [{"fileName": "quad.obj",
                    "instances": [{"transforms": [
                        {"type": "translate", "x": 0, "y": 0, "z": 0}]}]}]
      }
    }""" % (W, H)
    scene = load_scene_from_buf(scene_json, str(d) + "/")
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs, bounces=2)
    return cs, r


def test_texel_gradients_match_fd(setup):
    cs, r = setup
    assert cs.params.texels.shape[0] > 1, "texture did not load"
    trace = r.make_trace_fn(2)
    xs = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    ys = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))

    def loss(params):
        img = trace(params, xs, ys, jnp.int32(0), jnp.int32(2))
        return jnp.mean(img[..., :3])

    g = jax.jit(jax.grad(loss))(cs.params)
    gt = np.asarray(g.texels, np.float64)
    assert np.isfinite(gt).all()
    assert np.abs(gt).max() > 0.0, "no texel gradient signal"

    lj = jax.jit(loss)
    t0 = np.asarray(cs.params.texels)
    eps = 5e-3
    checked = 0
    for idx in np.argwhere(np.abs(gt) > np.abs(gt).max() * 0.25)[:4]:
        i, j = int(idx[0]), int(idx[1])
        tp = t0.copy()
        tp[i, j] += eps
        lp = float(lj(cs.params._replace(texels=jnp.asarray(tp))))
        tm = t0.copy()
        tm[i, j] -= eps
        lm = float(lj(cs.params._replace(texels=jnp.asarray(tm))))
        fd = (lp - lm) / (2 * eps)
        assert fd == pytest.approx(gt[i, j], rel=3e-2, abs=1e-5), (
            f"texels[{i},{j}]: AD={gt[i, j]} FD={fd}")
        checked += 1
    assert checked >= 2
