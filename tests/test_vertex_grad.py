"""Vertex-position gradients: AD through the exact-recompute path vs
finite differences on the packed triangle rows (detached-visibility
estimator — the closest-hit search stays fixed in both)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from craytpu.scene.sceneloader import load_scene_from_file
from craytpu.scene.compile import compile_scene
from craytpu.models.wavefront_pt import WavefrontRenderer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


import json

FLAT_SCENE = {
    # flat-shaded cube: hit normals derive from tri_packed, so vertex
    # gradients reach shading (smooth normals live in a separate array)
    "renderer": {"samples": 1, "bounces": 2, "width": 96, "height": 64},
    "camera": {"FOV": 60.0, "transforms": [
        {"type": "translate", "x": 0, "y": 0.4, "z": -3.0}]},
    "scene": {
        "ambientColor": {"down": {"r": 1.0, "g": 0.9, "b": 0.8},
                         "up": {"r": 0.4, "g": 0.6, "b": 1.0}},
        "meshes": [{"fileName": "flatcube.obj", "bsdf": "lambertian",
                    "instances": [{"transforms": [
                        {"type": "rotateY", "degrees": 25}]}]}],
    },
}


@pytest.fixture(scope="module")
def setup():
    from craytpu.scene.sceneloader import load_scene_from_buf
    scene = load_scene_from_buf(json.dumps(FLAT_SCENE),
                                os.path.join(REPO, "assets") + "/")
    cs = compile_scene(scene)
    os.environ["CRAYTPU_TRAVERSAL"] = "dense"
    r = WavefrontRenderer(cs, bounces=2)
    assert r.traversal_mode == "dense"
    trace = r.make_trace_fn(2, diff_geometry=True)
    ys, xs = np.mgrid[20:44, 30:60]
    xs = jnp.asarray(xs.reshape(-1).astype(np.int32))
    ys = jnp.asarray(ys.reshape(-1).astype(np.int32))

    def loss(tp):
        rad = trace(cs.params, tp, xs, ys, jnp.int32(0), jnp.int32(1))
        return jnp.mean(rad[:, :3])

    return cs, jax.jit(loss), jax.jit(jax.grad(loss))


def test_vertex_grad_matches_fd(setup):
    cs, loss, grad = setup
    tp0 = cs.geom.tri_packed
    g = np.asarray(grad(tp0), np.float64)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0, "no geometry gradient signal"

    tp_np = np.asarray(tp0)
    checked = 0
    # test the strongest-gradient entries (continuous response regions)
    flat = np.argsort(-np.abs(g).reshape(-1))[:40]
    for f in flat:
        i, j = np.unravel_index(f, g.shape)
        eps = 1e-3
        p = tp_np.copy()
        p[i, j] += eps
        m = tp_np.copy()
        m[i, j] -= eps
        fd = (float(loss(jnp.asarray(p))) - float(loss(jnp.asarray(m)))) \
            / (2 * eps)
        ad = g[i, j]
        # skip entries where FD straddles a visibility edge (detached
        # search means AD is the interior derivative)
        if abs(fd - ad) > 0.05 * max(abs(fd), abs(ad)) and \
                abs(fd - ad) > 1e-4:
            continue
        assert fd == pytest.approx(ad, rel=5e-2, abs=1e-4)
        checked += 1
    assert checked >= 25, f"only {checked} entries verified"
