"""Next-event estimation: lower variance at equal spp, same expected
image (unbiased), and gradient-safe (FD check with NEE on)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from craytpu.scene.sceneloader import load_scene_from_file, \
    load_scene_from_buf
from craytpu.scene.compile import compile_scene
from craytpu.models.wavefront_pt import WavefrontRenderer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _passes(r, cs, xs, ys, n, depth, nee):
    trace = jax.jit(r.make_trace_fn(depth=depth, nee=nee))
    out = []
    for p in range(n):
        out.append(np.asarray(
            trace(cs.params, xs, ys, jnp.int32(p), jnp.int32(n))))
    return np.stack(out)          # (n, B, 4)


def test_nee_lower_variance_same_mean():
    # sphere light + lambertian receiver (CPU-compile-friendly; the full
    # scene.json NEE path is exercised by scripts/nee_compare.py on TPU)
    scene = load_scene_from_buf(json.dumps(GRAD_SCENE))
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs)
    W, H = r.width, r.height
    xs = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    ys = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    N = 24
    plain = _passes(r, cs, xs, ys, N, depth=4, nee=False)
    nee = _passes(r, cs, xs, ys, N, depth=4, nee=True)

    # unbiased: NEE's 24-pass mean must agree with a CONVERGED plain
    # estimate (the tiny light makes the 24-pass plain mean itself far
    # noisier than NEE's — that asymmetry is the whole point)
    ref = _passes(r, cs, xs, ys, 1200, depth=4, nee=False)
    m_ref = ref[..., :3].mean()
    m_n = nee[..., :3].mean()
    assert abs(m_n - m_ref) / max(m_ref, 1e-6) < 0.08, (m_ref, m_n)

    # variance: per-pixel variance across passes, averaged over the image.
    # NEE turns the hit-or-miss emitter lottery on diffuse surfaces into a
    # smooth shadow-ray estimate
    v_p = plain[..., :3].var(axis=0).mean()
    v_n = nee[..., :3].var(axis=0).mean()
    assert v_n < 0.3 * v_p, (v_p, v_n)


GRAD_SCENE = {
    "renderer": {"samples": 2, "bounces": 3, "width": 24, "height": 16},
    "camera": {"FOV": 70.0, "transforms": [
        {"type": "translate", "x": 0, "y": 0, "z": -4}]},
    "scene": {
        "ambientColor": {"down": {"r": 0.1, "g": 0.1, "b": 0.1},
                         "up": {"r": 0.1, "g": 0.1, "b": 0.1}},
        "primitives": [
            {"type": "sphere", "radius": 1.0,
             "color": {"r": 0.7, "g": 0.3, "b": 0.2}, "bsdf": "lambertian",
             "instances": [{"transforms": [
                 {"type": "translate", "x": 0, "y": 0, "z": 0}]}]},
            {"type": "sphere", "radius": 0.1,
             "color": {"r": 1.0, "g": 0.8, "b": 0.6}, "bsdf": "emissive",
             "intensity": 400.0,
             "instances": [{"transforms": [
                 {"type": "translate", "x": 2.5, "y": 2.0, "z": -1.5}]}]},
        ],
    },
}


def test_nee_nonuniform_scaled_sphere_unbiased():
    """An emissive sphere under a NON-uniform scale is an ellipsoid; the
    table's uniform-area sphere sampling would bias it (ADVICE r2). It is
    excluded from the light table and its emission must still arrive via
    BSDF paths — including after NEE-handled diffuse vertices (the
    suppression is table-aware)."""
    import copy
    sc = copy.deepcopy(GRAD_SCENE)
    # second, non-uniformly scaled emitter with its own material
    sc["scene"]["primitives"].append(
        {"type": "sphere", "radius": 0.1,
         "color": {"r": 0.5, "g": 1.0, "b": 0.5}, "bsdf": "emissive",
         "intensity": 300.0,
         "instances": [{"transforms": [
             {"type": "scale", "x": 3.0, "y": 1.0, "z": 1.0},
             {"type": "translate", "x": -2.5, "y": 2.0, "z": -1.5}]}]})
    scene = load_scene_from_buf(json.dumps(sc))
    cs = compile_scene(scene)
    lights = cs.dense_meta["lights"]
    assert lights is not None and lights["count"] == 1  # ellipsoid dropped
    mask = np.asarray(cs.dense_meta["lights_mat_mask"])
    em = np.asarray(cs.params.emission)
    table_mat = int(np.asarray(lights["mat"])[0])
    assert mask[table_mat]
    excl = [k for k in range(em.shape[0])
            if np.any(em[k, :3] != 0) and k != table_mat]
    assert excl and not mask[excl[0]]

    r = WavefrontRenderer(cs)
    W, H = r.width, r.height
    xs = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    ys = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    nee = _passes(r, cs, xs, ys, 48, depth=4, nee=True)
    ref = _passes(r, cs, xs, ys, 1600, depth=4, nee=False)
    m_ref = ref[..., :3].mean()
    m_n = nee[..., :3].mean()
    assert abs(m_n - m_ref) / max(m_ref, 1e-6) < 0.10, (m_ref, m_n)


def test_nee_gradients_match_fd():
    scene = load_scene_from_buf(json.dumps(GRAD_SCENE))
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs)
    assert cs.dense_meta["lights"] is not None
    assert np.asarray(cs.dense_meta["mat_nee"]).any()
    W, H = r.width, r.height
    xs = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    ys = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    trace = r.make_trace_fn(depth=3, nee=True)

    def loss(params):
        img = trace(params, xs, ys, jnp.int32(0), jnp.int32(1))
        return jnp.mean(img[..., :3])

    g = jax.grad(loss)(cs.params)
    # FD on the emissive material's red emission channel (the NEE path
    # differentiates through Le)
    k = int(np.argmax(np.asarray(cs.params.emission)[:, 0]))
    eps = 1e-2
    em = np.asarray(cs.params.emission)

    def at(v):
        e2 = em.copy()
        e2[k, 0] = v
        return float(loss(cs.params._replace(emission=jnp.asarray(e2))))

    fd = (at(em[k, 0] + eps) - at(em[k, 0] - eps)) / (2 * eps)
    ad = float(np.asarray(g.emission)[k, 0])
    assert fd != 0.0
    np.testing.assert_allclose(ad, fd, rtol=2e-3, atol=1e-6)


def test_nee_persistent_pool_matches_trace():
    """The product's --nee path: the persistent pool (prev-NEE flag in
    bit 16 of pdepth) and the batched multi-step path must produce the
    SAME image as the validated fixed-depth NEE trace — identical
    per-(pixel, pass) streams, so equality is near-exact (float
    accumulation order only)."""
    scene = load_scene_from_buf(json.dumps(GRAD_SCENE))
    cs = compile_scene(scene)
    depth = cs.prefs.bounces
    spp = 4
    r = WavefrontRenderer(cs, nee=True)
    W, H = r.width, r.height
    xs = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    ys = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))

    trace = jax.jit(r.make_trace_fn(depth=depth, nee=True))
    want = np.zeros((H, W, 4), np.float32)
    for p in range(spp):
        img = np.asarray(trace(cs.params, xs, ys, jnp.int32(p),
                               jnp.int32(spp)))
        want += img.reshape(H, W, 4)
    want /= spp

    got_pool = np.asarray(r.render_persistent(spp=spp))
    np.testing.assert_allclose(got_pool, want, rtol=1e-5, atol=1e-6)

    got_batch = np.asarray(r.render(spp=spp))
    np.testing.assert_allclose(got_batch, want, rtol=1e-5, atol=1e-6)
