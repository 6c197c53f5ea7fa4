"""The Pallas hit-record kernel must be BIT-identical to the XLA
hitrec twin (ops/hitrec.py) — golden parity rides on these formulas.
Runs the kernel in interpret mode on the CPU mesh over random winner
ids (valid and degenerate combinations alike).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from craytpu.scene.sceneloader import load_scene_from_file
from craytpu.scene.compile import compile_scene
from craytpu.ops.hitrec import make_hitrec_fn
from craytpu.ops import hitrec_kernel as hk
from craytpu.ops import vecmath as vm

f32 = jnp.float32
i32 = jnp.int32


@pytest.fixture(scope="module")
def cscene():
    scene = load_scene_from_file(
        "/root/reference/input/refraction.json",
        {"width": 80, "height": 50, "samples": 4})
    return compile_scene(scene)


def test_hitrec_kernel_bitexact(cscene):
    dm = cscene.dense_meta
    B = hk.BLK
    rng = np.random.default_rng(99)
    o = jnp.asarray(rng.uniform(900, 1200, (B, 3)).astype(np.float32))
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    P = dm["tri_wide"].shape[0]
    I = dm["inst_wide"].shape[0]
    prim = jnp.asarray(rng.integers(-1, P, B, dtype=np.int32))
    inst = jnp.asarray(rng.integers(-1, I, B, dtype=np.int32))
    t_k = jnp.asarray(rng.uniform(0, 2000, B).astype(np.float32))

    xla = make_hitrec_fn(dm["tri_wide"], dm["inst_wide"],
                         dm["sphere_uv"], diff=False)
    is_hit, p_w, n_w, uv, mat, t, u, v = jax.jit(
        lambda *a: xla(cscene.geom, *a))(o, d, t_k, prim, inst)

    kernel = hk.build_hitrec_kernel(dm["sphere_uv"], interpret=True)
    tw = jnp.asarray(dm["tri_wide"])[jnp.maximum(prim, 0)]
    iwT = jnp.asarray(dm["inst_wide"]).T @ (
        (jnp.arange(I, dtype=i32)[:, None]
         == jnp.maximum(inst, 0)[None, :]).astype(f32))
    out = jax.jit(kernel)(tw.T, iwT, o.T, d.T, t_k[None],
                          (prim < 0).astype(i32)[None],
                          (inst >= 0).astype(i32)[None])

    def eq(name, a, b):
        a, b = np.asarray(a), np.asarray(b)
        mism = (a.view(np.uint32) != b.view(np.uint32))
        assert not mism.any(), \
            f"{name}: {mism.sum()} mismatched bits, e.g. " \
            f"{a[np.nonzero(mism)][:3]} vs {b[np.nonzero(mism)][:3]}"

    eq("t", t, out[0])
    eq("u", u, out[1])
    eq("v", v, out[2])
    eq("p_w", p_w, out[3:6].T)
    eq("n_w", n_w, out[6:9].T)
    # uv: mesh rows direct; sphere rows go through the same trig the
    # XLA twin uses, computed here from the exported object normal
    nsx, nsy, nsz = out[11], out[12], out[13]
    phi = jnp.arctan2(nsz, nsx)
    theta = jnp.arcsin(jnp.clip(nsy, -1.0, 1.0))
    sph_v = (theta + vm.PI / f32(2.0)) / vm.PI
    sph_u = f32(1.0) - (phi + vm.PI) / (vm.PI * f32(2.0))
    sph_u = vm.wrap_min_max(sph_u, f32(0.0), f32(1.0))
    sph_v = vm.wrap_min_max(sph_v, f32(0.0), f32(1.0))
    is_sphere = np.asarray(prim) < 0
    uv_k = np.where(is_sphere[:, None],
                    np.stack([np.asarray(sph_u), np.asarray(sph_v)],
                             axis=-1),
                    np.asarray(out[9:11].T))
    if dm["sphere_uv"]:
        eq("uv", uv, uv_k)
    else:
        eq("uv_mesh", np.where(is_sphere[:, None], 0.0, np.asarray(uv)),
           np.where(is_sphere[:, None], 0.0, np.asarray(out[9:11].T)))
