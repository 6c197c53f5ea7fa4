"""Per-component timing of one wavefront bounce step on the TPU.

Loads scene.json at 1080p, builds a 262k-ray batch of primaries, and times
each stage of the step in isolation (jitted, donated where the real step
donates): flash kernel, sphere pass, exact recompute, hit_info, shading,
whole fused step, compaction. Prints a ms table.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=20, warmup=3):
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
    import jax
    import jax.numpy as jnp

    scene = load_scene_from_file("/root/reference/input/scene.json",
                                 {"width": 1920, "height": 1080})
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs)
    print("platform:", jax.default_backend(), " traversal:",
          r.traversal_mode, " tile_rays:", r.tile_rays, file=sys.stderr)

    B = r.tile_rays
    xs, ys, flat, T, _, _ = r._pixel_schedule
    xs, ys = xs[:B], ys[:B]
    o, d, s = r._init_rays(xs, ys, jnp.int32(0), jnp.int32(16))
    jax.block_until_ready(o)

    rows = []

    # --- full fused k-step (k=2, like the persistent path) ---
    lane = jnp.arange(B, dtype=jnp.int32)
    weight = jnp.ones((B, 4), jnp.float32)
    alive = jnp.ones(B, bool)
    pdepth = jnp.zeros(B, jnp.int32)
    npix = r.width * r.height
    final = jnp.zeros((npix, 4), jnp.float32)

    def run_multi(k):
        m = r._multi_step(k)

        def f(o, d, weight, s, alive, pdepth, final, lane):
            return m(cs.params, cs.geom, cs.shade, cs.mat_graph,
                     o, d, weight, s, alive, pdepth, final, lane)
        # donation: pass copies
        def g():
            return f(o + 0, d + 0, weight + 0, jax.tree.map(lambda x: x + 0, s),
                     alive.copy(), pdepth + 0, final + 0, lane)
        return timeit(g, n=10)

    rows.append(("multi_step k=1 (per bounce)", run_multi(1)))
    rows.append(("multi_step k=2 (per 2 bounces)", run_multi(2)))

    # --- traversal kernel alone ---
    if r.traversal_mode == "flash":
        from craytpu.ops import flash_isect as fx
        from craytpu.ops import dense_isect as dx
        dm = cs.dense_meta
        flash = fx.build_flash_fn(dm["W_T"], dm["bb"], dm["inst_rows"],
                                  dm["plan"])
        rays_T = fx.pack_rays_T(o, d)
        jax.block_until_ready(rays_T)
        fj = jax.jit(lambda rt: flash(rt))
        rows.append(("flash kernel", timeit(fj, rays_T)))

        packj = jax.jit(lambda o, d: fx.pack_rays_T(o, d))
        rows.append(("pack_rays_T", timeit(packj, o, d)))

        t, p, ii = fj(rays_T)

        def sphere_and_recompute(o, d, t, p, ii):
            bt = t.reshape(-1)[:B]
            bp = p.reshape(-1)[:B]
            bi = ii.reshape(-1)[:B]
            bt, bp, bi = dx.sphere_pass(cs.geom, o, d, dm["inst_order"],
                                        bt, bp, bi)
            return dx.exact_recompute(cs.geom, o, d, bt, bp, bi)
        srj = jax.jit(sphere_and_recompute)
        rows.append(("sphere_pass + exact_recompute",
                     timeit(srj, o, d, t, p, ii)))

        hit = srj(o, d, t, p, ii)
        from craytpu.ops import traverse as trv
        hij = jax.jit(lambda o, d, hit: trv.hit_info(cs.geom, cs.shade,
                                                     o, d, hit))
        rows.append(("hit_info", timeit(hij, o, d, hit)))

        # whole traverse fn (kernel + spheres + recompute)
        tj = jax.jit(lambda o, d: r.traverse(cs.geom, o, d))
        rows.append(("traverse total", timeit(tj, o, d)))

        # shading: build the same shade_all the step uses
        is_hit, p_w, n_w, uv, mat_id = hij(o, d, hit)
        from craytpu.ops import shading
        rec = shading.HitRec(incident=d, normal=n_w, uv=uv, hit_point=p_w,
                             distance=hit.t, emission=cs.params.emission[mat_id],
                             ior=cs.params.ior[mat_id], mat_id=mat_id)
        gid = cs.mat_graph[mat_id]
        bsdf_fns = r.bsdf_fns

        def shade_all(rec_in, st, gid):
            import jax.numpy as jnp
            from craytpu.ops import sampler as smp
            Bq = gid.shape[0]
            out = jnp.zeros((Bq, 3), jnp.float32)
            col = jnp.zeros((Bq, 4), jnp.float32)
            s_sel = st
            for gi in range(len(bsdf_fns)):
                m = gid == gi

                def do(carry, _gi=gi, _m=m):
                    out, col, s_sel = carry
                    o_i, c_i, s_i = bsdf_fns[_gi](cs.params, rec_in, st)
                    return (jnp.where(_m[..., None], o_i, out),
                            jnp.where(_m[..., None], c_i, col),
                            smp.select_state(_m, s_i, s_sel))
                out, col, s_sel = jax.lax.cond(jnp.any(m), do,
                                               lambda c: c, (out, col, s_sel))
            return out, col, s_sel
        shj = jax.jit(shade_all)
        rows.append(("shade_all (%d graphs)" % len(bsdf_fns),
                     timeit(shj, rec, s, gid)))

    # --- compaction ---
    if getattr(r, "_compact", None) is None:
        _, r._compact = r._make_compact()
        r._compact = jax.jit(r._compact, static_argnums=(7,))
    cj = lambda: r._compact(o, d, weight, s, alive, lane, pdepth, B)
    rows.append(("compact (sort+gather B->B)", timeit(cj)))

    # --- init rays ---
    rows.append(("init_rays",
                 timeit(lambda: r._init_rays(xs, ys, jnp.int32(0),
                                             jnp.int32(16)))))

    print()
    print(f"{'stage':40s} {'ms':>8s}")
    for name, ms in rows:
        print(f"{name:40s} {ms:8.2f}")


if __name__ == "__main__":
    main()
