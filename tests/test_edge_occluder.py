"""Edge gradients across a MESH-OVER-MESH occlusion boundary, at 64x48.

The round-2 FD validation covered a single triangle against the
background environment; here a dark occluder triangle hides part of a
bright receiver quad (a second mesh), so the silhouette separates two
MESH radiances. Moving the occluder's vertex changes the image almost
purely through that occlusion boundary — the interior estimator is blind
to it, the boundary term (ops/edge_grad.py) must explain the true finite
difference. Also exercises the productized inverse-rendering entry point:
shard.make_train_step(geometry=True) flows silhouette gradients into the
occluder's packed triangle rows end-to-end.
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

W, H = 64, 48
PASSES = 32
DEPTH = 2

SCENE_JSON = """{
  "renderer": {"samples": 2, "bounces": %d,
               "width": %d, "height": %d},
  "camera": {"FOV": 60.0, "transforms": [
      {"type": "translate", "x": 0, "y": 0, "z": -2.0}]},
  "scene": {
    "ambientColor": {"down": {"r": 0.65, "g": 0.65, "b": 0.65},
                     "up": {"r": 0.65, "g": 0.65, "b": 0.65}},
    "meshes": [
      {"fileName": "quad.obj", "bsdf": "lambertian",
       "instances": [{"transforms": [
           {"type": "translate", "x": 0, "y": 0, "z": 0}]}]},
      {"fileName": "occ.obj", "bsdf": "lambertian",
       "instances": [{"transforms": [
           {"type": "translate", "x": 0, "y": 0, "z": 0}]}]}
    ]
  }
}""" % (DEPTH, W, H)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("occ")
    # bright receiver quad at z=+0.8 (two triangles)
    (d / "quad.obj").write_text(
        "mtllib quad.mtl\n"
        "v -1.4 -1.1 0.8\nv 1.4 -1.1 0.8\nv 1.4 1.1 0.8\nv -1.4 1.1 0.8\n"
        "vt 0.5 0.5\n"
        "vn 0 0 -1\n"
        "usemtl bright\n"
        "f 1/1/1 2/1/1 3/1/1\n"
        "f 1/1/1 3/1/1 4/1/1\n")
    (d / "quad.mtl").write_text(
        "newmtl bright\nKd 0.85 0.85 0.85\nillum 2\n")
    # dark occluder triangle at z=0, covering part of the quad
    (d / "occ.obj").write_text(
        "mtllib occ.mtl\n"
        "v -0.55 -0.4 0.0\nv 0.55 -0.4 0.0\nv 0.0 0.5 0.0\n"
        "vt 0.5 0.5\n"
        "vn 0 0 -1\n"
        "usemtl dark\n"
        "f 1/1/1 2/1/1 3/1/1\n")
    (d / "occ.mtl").write_text("newmtl dark\nKd 0.08 0.08 0.08\nillum 2\n")
    scene = load_scene_from_buf(SCENE_JSON, str(d) + "/")
    cs = compile_scene(scene)
    os.environ["CRAYTPU_TRAVERSAL"] = "dense"
    try:
        r = WavefrontRenderer(cs)
    finally:
        del os.environ["CRAYTPU_TRAVERSAL"]
    return scene, cs, r


def _repack_occ(tri_packed, v0):
    """Rebuild the occluder's packed row [v0, e1, e2, n] (poly.c layout)
    from a perturbed first vertex; rows 0-1 (the quad) stay unchanged.
    The occluder triangle is the LAST global triangle (mesh order)."""
    base = tri_packed[2]
    v1 = base[0:3] - base[3:6]
    v2 = base[6:9] + base[0:3]
    e1 = v0 - v1
    e2 = v2 - v0
    n = jnp.cross(e1, e2)
    row = jnp.concatenate([v0, e1, e2, n])
    return tri_packed.at[2, :12].set(row)


def _frame_loss(scene, passes):
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs)
    xs = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    ys = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    trace = jax.jit(r.make_trace_fn(depth=DEPTH))
    tot = 0.0
    for p in range(passes):
        img = trace(cs.params, xs, ys, jnp.int32(p), jnp.int32(passes))
        tot += float(jnp.mean(img[..., :3]))
    return tot / passes


def test_occlusion_boundary_gradient_matches_fd(setup):
    scene, cs, r = setup
    xs = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    ys = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    trace = r.make_trace_fn(depth=DEPTH, diff_geometry=True)
    boundary = make_edge_grad_fn(cs, scene, r, depth=DEPTH,
                                 samples_per_edge=64)
    tp0 = jnp.asarray(cs.geom.tri_packed)
    v0 = tp0[2, 0:3]

    def loss_at(v0x, with_boundary=True):
        tp = _repack_occ(tp0, jnp.stack([v0x, v0[1], v0[2]]))

        def one_pass(p):
            img = trace(cs.params, tp, xs, ys, jnp.int32(p),
                        jnp.int32(PASSES))
            if with_boundary:
                img = img + boundary(cs.params, tp, jnp.int32(p),
                                     jnp.int32(PASSES))
            return jnp.mean(img[..., :3])
        return sum(one_pass(p) for p in range(PASSES)) / PASSES

    x0 = float(v0[0])
    ad = float(jax.jit(jax.grad(lambda v: loss_at(v)))(jnp.float32(x0)))
    ad_interior = float(jax.jit(jax.grad(
        lambda v: loss_at(v, with_boundary=False)))(jnp.float32(x0)))

    # true finite difference: perturb the OBJ vertex, full recompile
    # (fresh BVH + search coefficients), common random numbers
    h = 0.05
    vid = 4          # quad has vertices 0-3; occluder v0 is global 4
    orig = scene.vertices.copy()
    assert abs(orig[vid, 0] - x0) < 1e-6   # layout sanity

    def fd_loss(x):
        scene.vertices = orig.copy()
        scene.vertices[vid, 0] = x
        return _frame_loss(scene, PASSES)

    try:
        fd = (fd_loss(x0 + h) - fd_loss(x0 - h)) / (2 * h)
    finally:
        scene.vertices = orig

    # the occlusion boundary dominates: interior-only must NOT explain fd
    assert abs(fd - ad_interior) > 0.5 * abs(fd), (fd, ad_interior)
    assert np.sign(ad) == np.sign(fd)
    np.testing.assert_allclose(ad, fd, rtol=0.3)


def test_train_step_geometry_flows_silhouette_grads(setup):
    """shard.make_train_step(geometry=True): one sharded training step
    must move the occluder's packed row (silhouette gradients flow
    through the product entry point, not just the raw estimator)."""
    scene, cs, r = setup
    from craytpu.parallel import shard

    mesh = shard.make_mesh(4, n_sample=2)
    npix = W * H
    xs = np.tile(np.arange(W, dtype=np.int32), H)
    ys = np.repeat(np.arange(H, dtype=np.int32), W)
    pad = shard.pad_to(npix, mesh.shape[shard.RAY_AXIS]) - npix
    xs = jnp.asarray(np.concatenate([xs, np.zeros(pad, np.int32)]))
    ys = jnp.asarray(np.concatenate([ys, np.zeros(pad, np.int32)]))

    # target: the CURRENT scene rendered a few passes (so the loss is
    # small but its gradient field is live)
    render = shard.make_sharded_render_fn(r, mesh, depth=DEPTH)
    target = render(cs.params, xs, ys, jnp.int32(7))[..., :3] * 0.8

    step, init = shard.make_train_step(r, mesh, depth=DEPTH,
                                       learning_rate=5e-3,
                                       geometry=True, scene=scene,
                                       edge_samples=16)
    theta = (cs.params, jnp.asarray(cs.geom.tri_packed))
    opt_state = init(theta)
    theta2, opt_state, loss = step(theta, opt_state, xs, ys, target,
                                   jnp.int32(0))
    assert np.isfinite(float(loss))
    moved = np.abs(np.asarray(theta2[1][2, :9] - theta[1][2, :9]))
    assert moved.max() > 0.0, "occluder vertices did not move"
    assert np.all(np.isfinite(np.asarray(theta2[1])))
