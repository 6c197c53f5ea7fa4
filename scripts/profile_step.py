"""Per-component timing of one wavefront bounce step on the TPU (flash2).

Builds a REALISTIC pool state (3 bounces, Morton-sorted, ~25% dead) at
1080p scene.json and times each stage in isolation: pack, kernel, hitrec,
shade, full fused step, flush-pack-refill. Prints a ms table.
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
    from craytpu.ops.hitrec import make_hitrec_fn
    import jax
    import jax.numpy as jnp

    scene = load_scene_from_file("/root/reference/input/scene.json",
                                 {"width": 1920, "height": 1080})
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs)
    B = r.tile_rays
    print("platform:", jax.default_backend(), " traversal:",
          r.traversal_mode, " B:", B, file=sys.stderr)

    xs, ys, flat, T, _, _ = r._pixel_schedule
    xs, ys = xs[:B], ys[:B]
    o0, d0, s = r._init_rays(xs, ys, jnp.int32(0), jnp.int32(16))

    # realistic state: 3 bounces then Morton sort (like the pool at
    # refill). Bounced in 256k chunks: the plain (non-donating) dynamic
    # step at the full 1M width faults the axon TPU worker (2026-08-18;
    # the donated pool-step path at 1M is fine — bench.py runs it), and
    # chunked bouncing produces the identical state anyway.
    step = r._make_step("dynamic")
    stepj = jax.jit(lambda o, d, w, fin, st, alive: step(
        cs.params, cs.geom, cs.shade, cs.mat_graph, o, d, w, fin, st,
        alive, False))
    CH = min(B, 262144)
    parts = []
    for c0 in range(0, B, CH):
        sl = slice(c0, c0 + CH)
        o, d = o0[sl], d0[sl]
        st = jax.tree.map(lambda x: x[sl], s)
        w = jnp.ones((CH, 4), jnp.float32)
        fin = jnp.zeros((CH, 4), jnp.float32)
        alive = jnp.ones(CH, bool)
        for _ in range(3):
            o, d, w, fin, st, alive = stepj(o, d, w, fin, st, alive)
        jax.block_until_ready(o)
        parts.append((o, d, w, st, alive))
    o = jnp.concatenate([p[0] for p in parts])
    d = jnp.concatenate([p[1] for p in parts])
    w = jnp.concatenate([p[2] for p in parts])
    st = jax.tree.map(lambda *xs: jnp.concatenate(xs),
                      *[p[3] for p in parts])
    alive = jnp.concatenate([p[4] for p in parts])
    key_fn = r._morton_key()
    order = jnp.argsort(key_fn(o, d, alive))
    o, d, w = o[order], d[order], w[order]
    st = jax.tree.map(lambda x: x[order], st)
    alive = alive[order]
    jax.block_until_ready(o)
    n_alive = int(jnp.sum(alive))
    print(f"state: {n_alive}/{B} alive, sorted", file=sys.stderr)
    # persist the mixed state so profile_kernel.py can time kernel
    # variants on REALISTIC (post-bounce, partially dead) rays instead
    # of coherent primaries — block-size conclusions differ between them
    np.savez("/tmp/kernel_state.npz", o=np.asarray(o), d=np.asarray(d),
             alive=np.asarray(alive))

    rows = []
    dm = cs.dense_meta
    flash = fx2.build_flash2_fn(dm)

    packj = jax.jit(lambda o, d: fx2.pack_rays_T(o, d))
    rays_T = packj(o, d)
    limj = jax.jit(lambda alive: fx2.pack_limit(
        jnp.where(alive, jnp.float32(fx2.FLT_MAX), jnp.float32(0.0)),
        rays_T.shape[0]))
    limit_T = limj(alive)
    rows.append(("pack_rays+limit", timeit(
        jax.jit(lambda o, d, a: (fx2.pack_rays_T(o, d), limj(a))),
        o, d, alive)))

    kj = jax.jit(lambda rt, lt: flash(rt, lt))
    rows.append(("flash2 kernel (sorted, 75% live)",
                 timeit(kj, rays_T, limit_T)))
    lim_all = limj(jnp.ones(B, bool))
    rows.append(("flash2 kernel (sorted, all live)",
                 timeit(kj, rays_T, lim_all)))

    t, p, ii = kj(rays_T, limit_T)
    hit = make_hitrec_fn(dm["tri_wide"], dm["inst_wide"], dm["sphere_uv"],
                         False)
    hj = jax.jit(lambda o, d, t, p, ii: hit(
        cs.geom, o, d, t.reshape(-1)[:B], p.reshape(-1)[:B],
        ii.reshape(-1)[:B]))
    rows.append(("hitrec", timeit(hj, o, d, t, p, ii)))

    isj = jax.jit(lambda o, d, a: r.isect(cs.geom, o, d, a))
    rows.append(("isect total", timeit(isj, o, d, alive)))

    # shading
    from craytpu.ops import shading
    from craytpu.ops import sampler as smp
    is_hit, p_w, n_w, uv, mat_id, t_x = isj(o, d, alive)
    K = cs.params.emission.shape[0]
    oh = (np.asarray(mat_id)[:, None] == np.arange(K)).astype(np.float32)
    rec = shading.HitRec(
        incident=d, normal=n_w, uv=uv, hit_point=p_w, distance=t_x,
        emission=jnp.asarray(oh) @ cs.params.emission,
        ior=jnp.asarray(oh) @ cs.params.ior, mat_id=mat_id)
    gid = cs.mat_graph[mat_id]
    bsdf_fns = r.bsdf_fns

    def shade_all(rec_in, st, gid):
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
            out, col, s_sel = jax.lax.cond(jnp.any(m), do, lambda c: c,
                                           (out, col, s_sel))
        return out, col, s_sel
    rows.append(("shade_all (%d graphs)" % len(bsdf_fns),
                 timeit(jax.jit(shade_all), rec, st, gid)))

    # full fused step (k=1 pool step)
    ps = r._pool_step(1)
    lane = jnp.arange(B, dtype=jnp.int32)
    pdepth = jnp.zeros(B, jnp.int32)
    delta = jnp.zeros((B, 4), jnp.float32)

    def full():
        return ps(cs.params, cs.geom, cs.shade, cs.mat_graph,
                  o + 0, d + 0, w + 0, jax.tree.map(lambda x: x + 0, st),
                  alive.copy(), pdepth + 0, delta + 0)
    rows.append(("pool_step k=1 (per bounce)", timeit(full)))

    # flush_pack_refill (device-side fresh-ray generation)
    Q = B // 4
    fpr = r._flush_pack_refill(B, 1, Q)
    npix = r.width * r.height
    final = jnp.zeros((npix, 4), jnp.float32)
    lpass = jnp.zeros(B, jnp.int32)

    def fprf():
        return fpr(final + 0, o + 0, d + 0, w + 0,
                   jax.tree.map(lambda x: x + 0, st), alive.copy(),
                   lane + 0, lpass + 0, pdepth + 0, delta + 0,
                   np.int32(0), np.int32(0), np.int32(Q), jnp.int32(16))
    rows.append(("flush_pack_refill+fresh (m=1)", timeit(fprf)))

    print()
    print(f"{'stage':36s} {'ms':>8s}")
    for name, ms in rows:
        print(f"{name:36s} {ms:8.2f}")


if __name__ == "__main__":
    main()
