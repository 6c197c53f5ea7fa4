"""Sharded forward rendering over the virtual 8-device mesh matches the
single-device trace (scene replicated, rays sharded, samples pmean-ed)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from craytpu.scene.sceneloader import load_scene_from_file
from craytpu.scene.compile import compile_scene
from craytpu.models.wavefront_pt import WavefrontRenderer
from craytpu.parallel import shard

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sharded_render_matches_single():
    scene = load_scene_from_file(
        os.path.join(REPO, "assets", "entry_scene.json"))
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs, bounces=3)
    mesh = shard.make_mesh(8)  # (sample=2, rays=4)
    n_sample = mesh.shape[shard.SAMPLE_AXIS]
    render = jax.jit(shard.make_sharded_render_fn(r, mesh, depth=3))

    B = 4 * 64  # multiple of the ray-axis size
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.integers(0, r.width, B, dtype=np.int32))
    ys = jnp.asarray(rng.integers(0, r.height, B, dtype=np.int32))
    out = np.asarray(render(cs.params, xs, ys, jnp.int32(0)))
    assert out.shape == (B, 4)
    assert np.isfinite(out).all()

    # oracle: average the same passes on one device
    trace = r.make_trace_fn(3)
    ref = np.mean([np.asarray(trace(cs.params, xs, ys, jnp.int32(p),
                                    jnp.int32(n_sample)))
                   for p in range(n_sample)], axis=0)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)
