"""flash2 kernel winner parity vs the SIMT reference walk, on CPU via
Pallas interpret mode (CRAYTPU_FLASH_INTERPRET=1).

This is the offline guard for kernel edits: the TPU golden gate
(bench.py) catches regressions end-to-end, but only on TPU hardware —
this test exercises the same kernel source (instance plan, superblock
worklists, in-kernel spheres, winner extraction) per-hit on CPU.
Tolerance: the search runs double-bf16 (~2^-27 relative), so winner
DISTANCES match to ~1e-5 relative; winner IDs may differ only where two
primitives are within that distance of each other (shared edges), so we
assert id parity on the non-ambiguous hits.
"""

import os

import numpy as np
import pytest

SCENE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "entry_scene.json")


@pytest.fixture(scope="module")
def isect_pair():
    os.environ["CRAYTPU_FLASH_INTERPRET"] = "1"
    try:
        from craytpu.scene.sceneloader import load_scene_from_file
        from craytpu.scene.compile import compile_scene
        from craytpu.ops.hitrec import make_isect_fn
        cs = compile_scene(load_scene_from_file(SCENE))
        flash = make_isect_fn(cs, "flash")
        simt = make_isect_fn(cs, "simt")
    finally:
        del os.environ["CRAYTPU_FLASH_INTERPRET"]
    return cs, flash, simt


def _rays(cs, B, seed):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    bb = np.asarray(cs.geom.node_bounds[0])
    lo, hi = bb[[0, 2, 4]], bb[[1, 3, 5]]
    span = hi - lo
    o = rng.uniform(lo - 0.3 * span, hi + 0.3 * span,
                    (B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_flash2_matches_simt_winners(isect_pair):
    import jax.numpy as jnp
    cs, flash, simt = isect_pair
    B = 512
    o, d = _rays(cs, B, 3)
    alive = jnp.ones(B, bool)

    fh = flash(cs.geom, o, d, alive)
    sh = simt(cs.geom, o, d, alive)
    f_hit, s_hit = np.asarray(fh[0]), np.asarray(sh[0])
    # hit/miss classification identical
    np.testing.assert_array_equal(f_hit, s_hit)
    both = f_hit & s_hit
    ft = np.asarray(fh[5])[both]
    st = np.asarray(sh[5])[both]
    # winner distances match to search precision
    np.testing.assert_allclose(ft, st, rtol=2e-5, atol=1e-6)
    # material ids match wherever the scene is unambiguous at this t
    f_mat = np.asarray(fh[4])[both]
    s_mat = np.asarray(sh[4])[both]
    mismatch = (f_mat != s_mat).mean() if both.any() else 0.0
    assert mismatch < 0.01, f"winner material mismatch {mismatch:.3%}"


def test_flash2_respects_dead_lanes(isect_pair):
    import jax.numpy as jnp
    cs, flash, _ = isect_pair
    B = 512
    o, d = _rays(cs, B, 5)
    alive = jnp.asarray((np.arange(B) % 3 == 0))
    fh = flash(cs.geom, o, d, alive)
    assert not np.asarray(fh[0])[~np.asarray(alive)].any()
