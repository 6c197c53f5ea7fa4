"""Break down the shading stage cost at 1M lanes on TPU (flash2 scene).

shade_all was measured at ~42 ms/step (32% of the bounce step) on
scene.json. This times: each bsdf graph alone, shade with 1..G graphs,
chunked vs unchunked, and the sampler/where overhead, to find where the
milliseconds actually are.
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
    from craytpu.ops import shading
    from craytpu.ops import sampler as smp
    import jax
    import jax.numpy as jnp

    scene = load_scene_from_file("/root/reference/input/scene.json",
                                 {"width": 1920, "height": 1080})
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs)
    B = r.tile_rays
    print("platform:", jax.default_backend(), " B:", B, file=sys.stderr)

    xs, ys, flat, T, _, _ = r._pixel_schedule
    xs, ys = xs[:B], ys[:B]
    o, d, st = r._init_rays(xs, ys, jnp.int32(0), jnp.int32(16))
    is_hit, p_w, n_w, uv, mat_id, t_x = jax.jit(
        lambda o, d: r.isect(cs.geom, o, d, jnp.ones(B, bool)))(o, d)
    K = cs.params.emission.shape[0]
    oh = (mat_id[:, None] == jnp.arange(K, dtype=jnp.int32)[None, :]
          ).astype(jnp.float32)
    rec = shading.HitRec(
        incident=d, normal=n_w, uv=uv, hit_point=p_w, distance=t_x,
        emission=oh @ cs.params.emission, ior=oh @ cs.params.ior,
        mat_id=mat_id)
    gid = jnp.where(is_hit, cs.mat_graph[mat_id], -1)
    gids, cnts = np.unique(np.asarray(gid), return_counts=True)
    print("gid histogram:", dict(zip(gids.tolist(), cnts.tolist())),
          file=sys.stderr)
    bsdf_fns = r.bsdf_fns
    G = len(bsdf_fns)
    rows = []

    # each graph alone over the FULL wavefront, no mask machinery
    for gi in range(G):
        f = jax.jit(lambda rec, st, _g=gi: bsdf_fns[_g](cs.params, rec, st))
        rows.append((f"graph {gi} alone (1M lanes)", timeit(f, rec, st)))

    # masked-combine of all graphs, no cond, no chunking
    def shade_flat(rec, st, gid):
        out = jnp.zeros((B, 3), jnp.float32)
        col = jnp.zeros((B, 4), jnp.float32)
        s_sel = st
        for gi in range(G):
            m = gid == gi
            o_i, c_i, s_i = bsdf_fns[gi](cs.params, rec, st)
            out = jnp.where(m[..., None], o_i, out)
            col = jnp.where(m[..., None], c_i, col)
            s_sel = smp.select_state(m, s_i, s_sel)
        return out, col, s_sel
    rows.append(("all graphs, no cond, unchunked",
                 timeit(jax.jit(shade_flat), rec, st, gid)))

    # cond-gated, unchunked
    def shade_cond(rec, st, gid):
        out = jnp.zeros((B, 3), jnp.float32)
        col = jnp.zeros((B, 4), jnp.float32)
        s_sel = st
        for gi in range(G):
            m = gid == gi

            def do(carry, _gi=gi, _m=m):
                out, col, s_sel = carry
                o_i, c_i, s_i = bsdf_fns[_gi](cs.params, rec, st)
                return (jnp.where(_m[..., None], o_i, out),
                        jnp.where(_m[..., None], c_i, col),
                        smp.select_state(_m, s_i, s_sel))
            out, col, s_sel = jax.lax.cond(jnp.any(m), do, lambda c: c,
                                           (out, col, s_sel))
        return out, col, s_sel
    rows.append(("all graphs, cond, unchunked",
                 timeit(jax.jit(shade_cond), rec, st, gid)))

    # the production chunked path (64k chunks, cond per chunk)
    step = r._make_step("dynamic")  # builds shade_all internally; time via
    # the internal helper by rebuilding it standalone:
    SHADE_CHUNK = int(os.environ.get("CRAYTPU_SHADE_CHUNK", "65536"))

    def shade_chunked(rec, st, gid):
        nch = B // SHADE_CHUNK

        def sl(x, i):
            return jax.lax.slice_in_dim(x, i * SHADE_CHUNK,
                                        (i + 1) * SHADE_CHUNK, axis=0)
        outs = []
        for i in range(nch):
            rc = jax.tree.map(lambda x: sl(x, i), rec)
            sc = jax.tree.map(lambda x: sl(x, i), st)
            gc = sl(gid, i)
            out = jnp.zeros((SHADE_CHUNK, 3), jnp.float32)
            col = jnp.zeros((SHADE_CHUNK, 4), jnp.float32)
            s_sel = sc
            for gi in range(G):
                m = gc == gi

                def do(carry, _gi=gi, _m=m, _rc=rc, _sc=sc):
                    out, col, s_sel = carry
                    o_i, c_i, s_i = bsdf_fns[_gi](cs.params, _rc, _sc)
                    return (jnp.where(_m[..., None], o_i, out),
                            jnp.where(_m[..., None], c_i, col),
                            smp.select_state(_m, s_i, s_sel))
                out, col, s_sel = jax.lax.cond(jnp.any(m), do,
                                               lambda c: c,
                                               (out, col, s_sel))
            outs.append((out, col, s_sel))
        out = jnp.concatenate([o_[0] for o_ in outs])
        col = jnp.concatenate([o_[1] for o_ in outs])
        s2 = jax.tree.map(lambda *xs: jnp.concatenate(xs),
                          *[o_[2] for o_ in outs])
        return out, col, s2
    rows.append((f"all graphs, cond, {SHADE_CHUNK // 1024}k chunks",
                 timeit(jax.jit(shade_chunked), rec, st, gid)))

    # sampler-dimension cost alone (2 dims, what diffuse consumes)
    def dims_only(st):
        d0, s1 = smp.get_dimension(r.kind, st)
        d1, s1 = smp.get_dimension(r.kind, s1)
        return d0 + d1, s1
    rows.append(("2 sampler dims (1M lanes)", timeit(jax.jit(dims_only),
                                                     st)))

    # select_state cost alone
    m0 = gid == 0
    rows.append(("select_state x1 (1M lanes)", timeit(
        jax.jit(lambda m, a, b: smp.select_state(m, a, b)), m0, st, st)))

    print()
    print(f"{'variant':40s} {'ms':>8s}")
    for name, ms in rows:
        print(f"{name:40s} {ms:8.2f}")


if __name__ == "__main__":
    main()
