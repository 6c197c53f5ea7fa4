"""Byte-packed quad-texture tables must be BIT-identical to the f32 path.

make_ctx(packed=True) packs byte-exact LDR textures' bilinear quads into
u32 words; fetch_bilinear_quadtab dequantizes in-register as
f32(byte)/255 — the reference's own fetch-time math (texture.c:33-64).
This checks, on real uv samples over the flagship scene's 499x570 LDR
map, that the packed fetch reproduces the f32-table fetch (and the
classic 4-gather fetch_bilinear) bit-for-bit, including wrap-around and
out-of-range uv.
"""

import os

import numpy as np
import pytest

SCENE = "/root/reference/input/scene.json"


@pytest.mark.skipif(not os.path.exists(SCENE),
                    reason="reference scene corpus not present")
def test_packed_quadtab_bit_exact():
    import jax
    import jax.numpy as jnp
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.ops import texture as tex

    cs = compile_scene(load_scene_from_file(SCENE,
                                            {"width": 64, "height": 64}))
    reg = cs.reg
    assert reg.quad_slot, "scene should have a quad-eligible texture"
    tex_id, slot = next(iter(reg.quad_slot.items()))
    assert reg._quad_byte_exact[slot], "LDR map should be byte-exact"
    meta = reg.tex_meta[tex_id]

    ctx_f32 = reg.make_ctx(cs.params, packed=False)
    ctx_pk = reg.make_ctx(cs.params, packed=True)
    assert ctx_pk.texq[slot].dtype == jnp.uint32
    assert ctx_f32.texq[slot].dtype == jnp.float32

    rng = np.random.default_rng(7)
    # in-range, wrap-around (negative / >1), and exact-texel-corner uvs
    u = jnp.asarray(np.concatenate([
        rng.uniform(0, 1, 4096), rng.uniform(-2, 3, 2048),
        np.arange(64) / 64.0]).astype(np.float32))
    v = jnp.asarray(np.concatenate([
        rng.uniform(0, 1, 4096), rng.uniform(-2, 3, 2048),
        np.arange(64) / 32.0]).astype(np.float32))

    out_f32 = np.asarray(tex.fetch_bilinear_quadtab(
        ctx_f32.texq[slot], meta, u, v))
    out_pk = np.asarray(tex.fetch_bilinear_quadtab(
        ctx_pk.texq[slot], meta, u, v))
    out_classic = np.asarray(tex.fetch_bilinear(
        cs.params.texels, meta, u, v))
    assert np.array_equal(out_f32, out_classic)
    assert np.array_equal(out_pk, out_f32), (
        f"packed fetch diverged: max|d|={np.abs(out_pk - out_f32).max()}")
