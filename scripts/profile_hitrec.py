"""Attribute hitrec's per-bounce cost: gathers, transforms, triangle
recompute, sphere recompute, interpolation — each timed in isolation on
the saved mixed pool state (scripts/profile_step.py writes it).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import WavefrontRenderer
    from craytpu.ops import flash2 as fx2
    from craytpu.ops import intersect as isx
    from craytpu.ops import vecmath as vm
    import jax
    import jax.numpy as jnp

    f32 = jnp.float32
    scene = load_scene_from_file("/root/reference/input/scene.json",
                                 {"width": 1920, "height": 1080})
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs)
    B = r.tile_rays
    state = "/tmp/kernel_state.npz"
    if os.path.exists(state):
        z = np.load(state)
        o_w, d_w = jnp.asarray(z["o"]), jnp.asarray(z["d"])
        alive = jnp.asarray(z["alive"])
    else:
        xs, ys, _, _, _, _ = r._pixel_schedule
        o_w, d_w, _ = r._init_rays(xs[:B], ys[:B], jnp.int32(0),
                                   jnp.int32(16))
        alive = jnp.ones(B, bool)

    dm = cs.dense_meta
    flash = jax.jit(fx2.build_flash2_fn(dm))
    rays_T = fx2.pack_rays_T(o_w, d_w)
    lim = fx2.pack_limit(jnp.where(alive, f32(3.4e38), f32(0.0)),
                         rays_T.shape[0])
    t_k, p_k, i_k = flash(rays_T, lim)
    t_k = jnp.reshape(t_k, (-1,))[:B]
    prim = jnp.reshape(p_k, (-1,))[:B]
    inst = jnp.reshape(i_k, (-1,))[:B]
    jax.block_until_ready((t_k, prim, inst))

    tri_wide = jnp.asarray(dm["tri_wide"])
    inst_wide = jnp.asarray(dm["inst_wide"])
    n_inst = int(inst_wide.shape[0])

    def gathers(prim, inst):
        pr = jnp.maximum(prim, 0)
        oh = (jnp.maximum(inst, 0)[:, None]
              == jnp.arange(n_inst, dtype=inst.dtype)[None, :]).astype(f32)
        return tri_wide[pr], oh @ inst_wide

    tw, iw = jax.jit(gathers)(prim, inst)
    jax.block_until_ready((tw, iw))

    def transforms(iw, o_w, d_w):
        Ainv = iw[:, 12:24].reshape(-1, 3, 4)
        o_s = vm.mat34_point(Ainv, o_w)
        d_s = vm.mat33_vec(Ainv, d_w)
        return vm.fma_raw(d_s, iw[:, 24:25], o_s), d_s

    o_s, d_s = jax.jit(transforms)(iw, o_w, d_w)
    jax.block_until_ready((o_s, d_s))

    def transforms_einsum(iw, o_w, d_w):
        Ainv = iw[:, 12:24].reshape(-1, 3, 4)
        o_s = (jnp.einsum("...ij,...j->...i", Ainv[..., :, :3], o_w)
               + Ainv[..., :, 3])
        d_s = jnp.einsum("...ij,...j->...i", Ainv[..., :, :3], d_w)
        return o_s + d_s * iw[:, 24:25], d_s

    def tri_re(tw, o_s, d_s):
        return isx.tri_intersect(tw[:, 0:12], o_s, d_s,
                                 jnp.full(B, f32(3.4e38), f32))

    def sph_re(iw, o_s, d_s):
        return isx.sphere_intersect(iw[:, 26], o_s, d_s,
                                    jnp.full(B, f32(3.4e38), f32))

    def interp(tw, u, v):
        w = f32(1.0) - u - v
        n_smooth = vm.fma_raw(
            tw[:, 12:15], w[..., None],
            vm.fma_raw(tw[:, 15:18], u[..., None],
                       tw[:, 18:21] * v[..., None]))
        uv_mesh = vm.fma_raw(
            tw[:, 21:23], w[..., None],
            vm.fma_raw(tw[:, 23:25], u[..., None],
                       tw[:, 25:27] * v[..., None]))
        return n_smooth, uv_mesh

    _, t_x, u_x, v_x = jax.jit(tri_re)(tw, o_s, d_s)
    jax.block_until_ready(u_x)

    from craytpu.ops.hitrec import make_hitrec_fn
    hit_full = jax.jit(lambda o, d, t, p, i: make_hitrec_fn(
        dm["tri_wide"], dm["inst_wide"], dm["sphere_uv"], False)(
        cs.geom, o, d, t, p, i))

    print(f"B={B}", flush=True)
    for name, fn, args in [
            ("gathers (tw, iw)", jax.jit(gathers), (prim, inst)),
            ("transforms explicit", jax.jit(transforms), (iw, o_w, d_w)),
            ("transforms einsum", jax.jit(transforms_einsum),
             (iw, o_w, d_w)),
            ("tri recompute", jax.jit(tri_re), (tw, o_s, d_s)),
            ("sphere recompute", jax.jit(sph_re), (iw, o_s, d_s)),
            ("interp", jax.jit(interp), (tw, u_x, v_x)),
            ("hitrec FULL", hit_full, (o_w, d_w, t_k, prim, inst)),
    ]:
        print(f"{name:22s} {timeit(fn, *args):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
