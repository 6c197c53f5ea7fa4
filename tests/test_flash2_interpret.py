"""flash2 kernel winner parity vs the SIMT reference walk, on CPU via
Pallas interpret mode (CRAYTPU_FLASH_INTERPRET=1).

This is the offline guard for kernel edits: the TPU golden gate
(bench.py) catches regressions end-to-end, but only on TPU hardware —
this test exercises the same kernel source (instance plan, superblock
worklists, DMA streaming, in-kernel spheres, winner extraction) per-hit
on CPU, across the kernel variants (v1/v3, classic/lean epilogue,
resident/streaming W). Tolerance: the search runs double-bf16 (~2^-27
relative), so winner DISTANCES match to ~1e-5 relative; winner IDs may
differ only where two primitives are within that distance of each other
(shared edges), so id parity is asserted on the non-ambiguous hits.
"""

import os

import numpy as np
import pytest

SCENE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "entry_scene.json")

VARIANTS = [
    {},                                           # v1 classic
    {"CRAYTPU_FLASH_EPI": "lean"},                # v1 lean epilogue
    {"CRAYTPU_FLASH_V3": "1"},                    # v3 vectorized culling
    {"CRAYTPU_FLASH_V3": "1", "CRAYTPU_FLASH_EPI": "lean"},
    # streaming W (HBM double-buffer DMA path), both kernels
    {"CRAYTPU_W_RESIDENT_BYTES": "1024"},
    {"CRAYTPU_FLASH_V3": "1", "CRAYTPU_W_RESIDENT_BYTES": "1024"},
]


@pytest.fixture(scope="module")
def scene_and_simt():
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.ops.hitrec import make_isect_fn
    cs = compile_scene(load_scene_from_file(SCENE))
    return cs, make_isect_fn(cs, "simt")


def _flash_variant(cs, env):
    """Build the flash isect fn with variant env flags set (all flags
    are read at kernel build/trace time)."""
    from craytpu.ops.hitrec import make_isect_fn
    env = dict(env, CRAYTPU_FLASH_INTERPRET="1")
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        return make_isect_fn(cs, "flash")
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


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


@pytest.mark.parametrize("env", VARIANTS,
                         ids=lambda e: "+".join(
                             f"{k.split('_')[-1]}={v}"
                             for k, v in e.items()) or "v1")
def test_flash2_matches_simt_winners(scene_and_simt, env):
    import jax.numpy as jnp
    cs, simt = scene_and_simt
    flash = _flash_variant(cs, env)
    B = 512
    o, d = _rays(cs, B, 3)
    alive = jnp.ones(B, bool)

    fh = flash(cs.geom, o, d, alive)
    sh = simt(cs.geom, o, d, alive)
    f_hit, s_hit = np.asarray(fh[0]), np.asarray(sh[0])
    np.testing.assert_array_equal(f_hit, s_hit)
    both = f_hit & s_hit
    ft = np.asarray(fh[5])[both]
    st = np.asarray(sh[5])[both]
    np.testing.assert_allclose(ft, st, rtol=2e-5, atol=1e-6)
    f_mat = np.asarray(fh[4])[both]
    s_mat = np.asarray(sh[4])[both]
    mismatch = (f_mat != s_mat).mean() if both.any() else 0.0
    assert mismatch < 0.01, f"winner material mismatch {mismatch:.3%}"


def test_flash2_respects_dead_lanes(scene_and_simt):
    import jax.numpy as jnp
    cs, _ = scene_and_simt
    flash = _flash_variant(cs, {"CRAYTPU_FLASH_V3": "1"})
    B = 512
    o, d = _rays(cs, B, 5)
    alive = jnp.asarray((np.arange(B) % 3 == 0))
    fh = flash(cs.geom, o, d, alive)
    assert not np.asarray(fh[0])[~np.asarray(alive)].any()
