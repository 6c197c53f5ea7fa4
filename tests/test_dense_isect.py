"""Dense MXU closest-hit search agrees with the SIMT BVH traversal."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from craytpu.scene.sceneloader import load_scene_from_file
from craytpu.scene.compile import compile_scene
from craytpu.ops import traverse as trv
from craytpu.ops.dense_isect import make_dense_traverse_fn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cscene():
    return compile_scene(load_scene_from_file(
        os.path.join(REPO, "assets", "entry_scene.json")))


def _random_rays(rng, n):
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_dense_matches_simt(cscene):
    simt = trv.make_traverse_fn(cscene.tlas_end, cscene.stack_depth,
                                cscene.max_leaf_tris, cscene.max_leaf_inst)
    dense = make_dense_traverse_fn(cscene.dense_meta)
    rng = np.random.default_rng(7)
    o, d = _random_rays(rng, 4096)
    h_s = simt(cscene.geom, o, d)
    h_d = dense(cscene.geom, o, d)

    inst_s = np.asarray(h_s.inst)
    inst_d = np.asarray(h_d.inst)
    # identical hit/miss classification and winners
    np.testing.assert_array_equal(inst_s >= 0, inst_d >= 0)
    agree = inst_s == inst_d
    assert agree.mean() > 0.999  # ties between instances are measure-zero
    np.testing.assert_array_equal(np.asarray(h_s.prim)[agree],
                                  np.asarray(h_d.prim)[agree])
    # t/u/v agreement where the same primitive won. Same formulas on the
    # same data, but XLA fuses the surrounding einsums differently per jit
    # context, so allow ulp-level drift (FMA contraction differences).
    same = agree & (np.asarray(h_s.prim) == np.asarray(h_d.prim))
    hit = same & (inst_s >= 0)
    np.testing.assert_allclose(np.asarray(h_s.t)[hit],
                               np.asarray(h_d.t)[hit], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h_s.u)[hit],
                               np.asarray(h_d.u)[hit],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_s.v)[hit],
                               np.asarray(h_d.v)[hit],
                               rtol=1e-4, atol=1e-5)
    assert hit.sum() > 100  # the scene is actually being hit


def test_dense_render_matches_simt_render(cscene, monkeypatch):
    """Full wavefront render, both traversal backends, identical images
    (modulo winner ties, which this small frame should not contain)."""
    from craytpu.models.wavefront_pt import WavefrontRenderer
    monkeypatch.setenv("CRAYTPU_TRAVERSAL", "simt")
    fb_s = WavefrontRenderer(cscene, bounces=4).render(spp=2)
    monkeypatch.setenv("CRAYTPU_TRAVERSAL", "dense")
    r = WavefrontRenderer(cscene, bounces=4)
    assert r.traversal_mode == "dense"
    fb_d = r.render(spp=2)
    diff = np.abs(fb_s - fb_d)
    assert (diff == 0).mean() > 0.98  # ulp drift from differing fusions
    assert diff.max() < 1e-5
