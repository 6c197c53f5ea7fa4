"""Differentiability acceptance: AD gradients vs finite differences.

The estimator is detached-sampling: paths (BVH hits, lobe choices, RR) are
fixed by the sample streams; gradients flow through the radiance chain
(attenuations, emissions, background). For parameters that do not flip any
discrete decision, d(render)/d(param) must match finite differences.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from craytpu.scene.sceneloader import load_scene_from_buf
from craytpu.scene.compile import compile_scene
from craytpu.models.wavefront_pt import WavefrontRenderer

SCENE = {
    "renderer": {"samples": 2, "bounces": 3, "width": 24, "height": 16},
    "camera": {"FOV": 70.0, "transforms": [
        {"type": "translate", "x": 0, "y": 0, "z": -4}]},
    "scene": {
        "ambientColor": {"down": {"r": 0.8, "g": 0.8, "b": 0.8},
                         "up": {"r": 0.4, "g": 0.6, "b": 0.9}},
        "primitives": [
            {"type": "sphere", "radius": 1.0,
             "color": {"r": 0.7, "g": 0.3, "b": 0.2}, "bsdf": "lambertian",
             "instances": [{"transforms": [
                 {"type": "translate", "x": 0, "y": 0, "z": 0}]}]},
            {"type": "sphere", "radius": 0.5,
             "color": {"r": 1.0, "g": 0.8, "b": 0.6}, "bsdf": "emissive",
             "intensity": 4.0,
             "instances": [{"transforms": [
                 {"type": "translate", "x": 1.5, "y": 1.0, "z": -0.5}]}]},
        ],
    },
}


@pytest.fixture(scope="module")
def setup():
    scene = load_scene_from_buf(json.dumps(SCENE))
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs, bounces=3)
    trace = r.make_trace_fn(3)
    ys, xs = np.mgrid[0:16, 0:24]
    xs = jnp.asarray(xs.reshape(-1).astype(np.int32))
    ys = jnp.asarray(ys.reshape(-1).astype(np.int32))

    def loss(params):
        rad = trace(params, xs, ys, jnp.int32(0), jnp.int32(2))
        return jnp.mean(rad[:, :3])
    return cs, jax.jit(loss), jax.jit(jax.grad(loss))


def test_grad_matches_finite_differences(setup):
    cs, loss, grad = setup
    p0 = cs.params
    g = grad(p0)
    g_colors = np.asarray(g.colors, np.float64)
    assert np.isfinite(g_colors).all()
    assert np.abs(g_colors).max() > 0.0, "no gradient signal at all"

    # central differences on every color-table entry with meaningful grad
    eps = 2e-3
    checked = 0
    colors0 = np.asarray(p0.colors)
    for idx in np.argwhere(np.abs(g_colors) > 1e-4)[:8]:
        i, j = int(idx[0]), int(idx[1])
        cp = colors0.copy()
        cp[i, j] += eps
        lp = float(loss(p0._replace(colors=jnp.asarray(cp))))
        cm = colors0.copy()
        cm[i, j] -= eps
        lm = float(loss(p0._replace(colors=jnp.asarray(cm))))
        fd = (lp - lm) / (2 * eps)
        ad = g_colors[i, j]
        assert fd == pytest.approx(ad, rel=2e-2, abs=1e-4), (
            f"colors[{i},{j}]: AD={ad} FD={fd}")
        checked += 1
    assert checked >= 2


def test_grad_emission_and_values(setup):
    cs, loss, grad = setup
    p0 = cs.params
    g = grad(p0)
    g_em = np.asarray(g.emission, np.float64)
    assert np.isfinite(g_em).all()
    # the emissive sphere's legacy emission contributes linearly
    assert np.abs(g_em).max() > 0.0
    i, j = np.unravel_index(np.abs(g_em).argmax(), g_em.shape)
    eps = 1e-2
    em0 = np.asarray(p0.emission)
    ep = em0.copy()
    ep[i, j] += eps
    em = em0.copy()
    em[i, j] -= eps
    fd = (float(loss(p0._replace(emission=jnp.asarray(ep))))
          - float(loss(p0._replace(emission=jnp.asarray(em))))) / (2 * eps)
    assert fd == pytest.approx(float(g_em[i, j]), rel=2e-2, abs=1e-5)
