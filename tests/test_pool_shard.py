"""Mesh-sharded persistent render (parallel/pool_shard.py): the product's
multi-device path. The sharded full-frame image must equal the
single-device persistent render (same per-(pixel, pass) sample streams;
only float accumulation order differs)."""

import os

import jax
import numpy as np
import pytest

from craytpu.scene.sceneloader import load_scene_from_file
from craytpu.scene.compile import compile_scene
from craytpu.models.wavefront_pt import WavefrontRenderer
from craytpu.parallel.pool_shard import (ShardedPoolRenderer, default_mesh,
                                         make_renderer)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENE = os.path.join(REPO, "assets", "entry_scene.json")


@pytest.fixture(scope="module")
def cscene():
    return compile_scene(load_scene_from_file(SCENE))


def test_sharded_equals_single_device(cscene):
    spp = 8
    ref = WavefrontRenderer(cscene, tile_rays=8192).render_persistent(
        spp=spp)
    r = ShardedPoolRenderer(cscene, tile_rays=2048)
    assert r.D == 8
    img = r.render_persistent(spp=spp)
    assert img.shape == ref.shape
    np.testing.assert_allclose(img, ref, rtol=2e-5, atol=2e-6)


def test_sharded_spp_not_multiple_of_devices(cscene):
    # 3 passes over 8 devices: 5 devices idle-pad, image still exact
    spp = 3
    ref = WavefrontRenderer(cscene, tile_rays=8192).render_persistent(
        spp=spp)
    img = ShardedPoolRenderer(cscene, tile_rays=2048).render_persistent(
        spp=spp)
    np.testing.assert_allclose(img, ref, rtol=2e-5, atol=2e-6)


def test_make_renderer_picks_sharded():
    cs = compile_scene(load_scene_from_file(SCENE))
    r = make_renderer(cs)
    # the test mesh has 8 virtual CPU devices -> product path is sharded
    assert isinstance(r, ShardedPoolRenderer)
    assert r.D == len(jax.devices())


def test_sharded_interrupt_aborts(cscene):
    r = ShardedPoolRenderer(cscene, tile_rays=2048)
    out = r.render_persistent(spp=4, interrupt=lambda: True)
    assert out == ("aborted",)
    with pytest.raises(NotImplementedError):
        r.render_persistent(spp=2, resume={"final_sum": 0, "qpos": 0,
                                           "pending": []})
