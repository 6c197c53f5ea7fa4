"""Edge-aware visibility gradients vs finite differences.

The acceptance test from VERDICT round 1 item 4: a triangle silhouette
moving across pixels. The interior (detached-sampling) estimator alone
gives ZERO derivative for a vertex motion that only shifts the silhouette;
with the boundary term (ops/edge_grad.py) the AD gradient must match the
finite difference of the rendered image.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from craytpu.scene.sceneloader import load_scene_from_buf
from craytpu.scene.compile import compile_scene
from craytpu.models.wavefront_pt import WavefrontRenderer
from craytpu.ops.edge_grad import make_edge_grad_fn

W, H = 32, 24
PASSES = 48


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge")
    # one triangle facing the camera at z=2, dark lambertian against a
    # bright ambient background
    (d / "tri.obj").write_text(
        "mtllib tri.mtl\n"
        "v -0.8 -0.6 0.0\nv 0.8 -0.6 0.0\nv 0.0 0.7 0.0\n"
        "vt 0.5 0.5\n"
        "vn 0 0 -1\n"
        "usemtl dark\n"
        "f 1/1/1 2/1/1 3/1/1\n")
    (d / "tri.mtl").write_text("newmtl dark\nKd 0.12 0.12 0.12\nillum 2\n")
    scene_json = """{
      "renderer": {"samples": 2, "bounces": 2,
                   "width": %d, "height": %d},
      "camera": {"FOV": 60.0, "transforms": [
          {"type": "translate", "x": 0, "y": 0, "z": -2.0}]},
      "scene": {
        "ambientColor": {"down": {"r": 0.9, "g": 0.9, "b": 0.9},
                         "up": {"r": 0.9, "g": 0.9, "b": 0.9}},
        "meshes": [{"fileName": "tri.obj", "bsdf": "lambertian",
                    "instances": [{"transforms": [
                        {"type": "translate", "x": 0, "y": 0, "z": 0}]}]}]
      }
    }""" % (W, H)
    scene = load_scene_from_buf(scene_json, str(d) + "/")
    cs = compile_scene(scene)
    # the SIMT while_loop is not reverse-differentiable; the dense MXU
    # search is (same numbers, exact winner recompute)
    os.environ["CRAYTPU_TRAVERSAL"] = "dense"
    try:
        r = WavefrontRenderer(cs)
    finally:
        del os.environ["CRAYTPU_TRAVERSAL"]
    return scene, cs, r


def _pack(v0, v1, v2):
    """poly.c packing for the single triangle: [v0, e1, e2, n]."""
    e1 = v0 - v1
    e2 = v2 - v0
    n = jnp.cross(e1, e2)
    return jnp.concatenate([v0, e1, e2, n])[None, :]


def _frame_loss(scene, passes):
    """Mean RGB of the FULL rendered image for a (possibly perturbed)
    scene: a fresh compile so geometry motion really moves the silhouette
    (the dense search's coefficient blocks are static per compile — that
    staticness is exactly why the interior estimator is visibility-blind)."""
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs)
    xs = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    ys = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    trace = jax.jit(r.make_trace_fn(depth=2))
    tot = 0.0
    for p in range(passes):
        img = trace(cs.params, xs, ys, jnp.int32(p), jnp.int32(passes))
        tot += float(jnp.mean(img[..., :3]))
    return tot / passes


def test_silhouette_gradient_matches_fd(setup):
    scene, cs, r = setup
    xs = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    ys = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    trace = r.make_trace_fn(depth=2, diff_geometry=True)
    boundary = make_edge_grad_fn(cs, scene, r, depth=2,
                                 samples_per_edge=64)

    base = np.asarray(cs.geom.tri_packed)[0]
    v0 = jnp.asarray(base[0:3])
    v1 = v0 - jnp.asarray(base[3:6])
    v2 = jnp.asarray(base[6:9]) + v0

    def loss_at(v0x, with_boundary=True):
        tp = _pack(jnp.stack([v0x, v0[1], v0[2]]), v1, v2)

        def one_pass(p):
            img = trace(cs.params, tp, xs, ys, jnp.int32(p),
                        jnp.int32(PASSES))
            if with_boundary:
                img = img + boundary(cs.params, tp, jnp.int32(p),
                                     jnp.int32(PASSES))
            return jnp.mean(img[..., :3])
        return sum(one_pass(p) for p in range(PASSES)) / PASSES

    gj = jax.jit(jax.grad(lambda v: loss_at(v)))
    g_int = jax.jit(jax.grad(
        lambda v: loss_at(v, with_boundary=False)))

    x0 = float(v0[0])
    ad = float(gj(jnp.float32(x0)))
    ad_interior = float(g_int(jnp.float32(x0)))

    # TRUE finite difference: perturb the mesh vertex and re-run the whole
    # pipeline (fresh BVH + search coefficients) with common random numbers
    h = 0.04
    vid = 0  # first OBJ vertex is v0
    orig = scene.vertices.copy()

    def fd_loss(x):
        scene.vertices = orig.copy()
        scene.vertices[vid, 0] = x
        return _frame_loss(scene, PASSES)

    try:
        fd = (fd_loss(x0 + h) - fd_loss(x0 - h)) / (2 * h)
    finally:
        scene.vertices = orig

    # moving the vertex mostly shifts the silhouette: the interior
    # estimator alone must NOT explain the finite difference
    assert abs(fd - ad_interior) > 0.5 * abs(fd), (fd, ad_interior)
    # the boundary-augmented gradient does
    assert np.sign(ad) == np.sign(fd)
    np.testing.assert_allclose(ad, fd, rtol=0.3)
