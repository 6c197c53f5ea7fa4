"""Measure kernel sensitivity to ray order: time the flash kernel on
(a) coherent primaries, (b) bounced rays as-is, (c) bounced rays
Morton-sorted, (d) bounced rays octant-bucket-sorted. Also time the sorts
themselves, the big argsort, and a one-hot counting sort."""

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
    import jax
    import jax.numpy as jnp

    scene = load_scene_from_file("/root/reference/input/scene.json",
                                 {"width": 1920, "height": 1080})
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs)
    B = r.tile_rays

    xs, ys, flat, T, _, _ = r._pixel_schedule
    xs, ys = xs[:B], ys[:B]
    o0, d0, s = r._init_rays(xs, ys, jnp.int32(0), jnp.int32(16))

    # run 3 bounces to get realistic mixed rays (use the step directly)
    step = r._make_step("dynamic")
    stepj = jax.jit(lambda o, d, w, fin, s, alive: step(
        cs.params, cs.geom, cs.shade, cs.mat_graph, o, d, w, fin, s,
        alive, False))
    w = jnp.ones((B, 4), jnp.float32)
    fin = jnp.zeros((B, 4), jnp.float32)
    alive = jnp.ones(B, bool)
    o, d = o0, d0
    st = s
    for _ in range(3):
        o, d, w, fin, st, alive = stepj(o, d, w, fin, st, alive)
    jax.block_until_ready(o)
    n_alive = int(jnp.sum(alive))
    print(f"after 3 bounces: {n_alive}/{B} alive")

    flash = fx2.build_flash2_fn(cs.dense_meta)

    def run_kernel(o, d):
        rays_T = fx2.pack_rays_T(o, d)
        lim = jnp.full(o.shape[0], fx2.FLT_MAX, jnp.float32)
        return flash(rays_T, fx2.pack_limit(lim, rays_T.shape[0]))
    kj = jax.jit(run_kernel)

    print(f"kernel primaries:          {timeit(kj, o0, d0):8.2f} ms")
    print(f"kernel bounced as-is:      {timeit(kj, o, d):8.2f} ms")

    # Morton sort (old _compact key)
    bb = np.asarray(cs.geom.node_bounds[0])
    lo = jnp.asarray(bb[[0, 2, 4]])
    ext = np.maximum(bb[[1, 3, 5]] - bb[[0, 2, 4]], 1e-6)
    inv_ext = jnp.asarray((127.0 / ext).astype(np.float32))

    def spread3(x):
        x = (x | (x << 8)) & 0x0100F00F
        x = (x | (x << 4)) & 0x10C30C3
        x = (x | (x << 2)) & 0x9249249
        return x

    def morton_key(o, d, alive):
        q = jnp.clip(((o - lo) * inv_ext), 0.0, 127.0).astype(jnp.uint32)
        octant = ((d[:, 0] < 0) + 2 * (d[:, 1] < 0)
                  + 4 * (d[:, 2] < 0)).astype(jnp.uint32)
        key = (spread3(q[:, 0]) | (spread3(q[:, 1]) << 1)
               | (spread3(q[:, 2]) << 2)) | (octant << 21)
        return jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))

    def msorted(o, d, alive):
        order = jnp.argsort(morton_key(o, d, alive))
        return o[order], d[order]
    msj = jax.jit(msorted)
    om, dmv = msj(o, d, alive)
    print(f"kernel bounced morton:     {timeit(kj, om, dmv):8.2f} ms")
    print(f"argsort+gather(o,d):       {timeit(msj, o, d, alive):8.2f} ms")

    # coarse bucket sort: alive(1) | octant(3) | coarse pos (2/axis = 6)
    NB = 1024

    def bucket_key(o, d, alive):
        q = jnp.clip(((o - lo) * inv_ext / 32.0), 0.0, 3.0).astype(jnp.int32)
        octant = ((d[:, 0] < 0) + 2 * (d[:, 1] < 0)
                  + 4 * (d[:, 2] < 0)).astype(jnp.int32)
        key = (octant << 6) | (q[:, 0] << 4) | (q[:, 1] << 2) | q[:, 2]
        return jnp.where(alive, key, 512 + key)

    def bsorted(o, d, alive):
        key = bucket_key(o, d, alive)
        oh = (key[:, None] == jnp.arange(NB)[None, :]).astype(jnp.int32)
        cum = jnp.cumsum(oh, axis=0)
        rank = jnp.take_along_axis(cum, key[:, None], axis=1)[:, 0] - 1
        counts = cum[-1]
        offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                jnp.cumsum(counts)[:-1]])
        pos = offs[key] + rank
        o2 = jnp.zeros_like(o).at[pos].set(o)
        d2 = jnp.zeros_like(d).at[pos].set(d)
        return o2, d2
    bsj = jax.jit(bsorted)
    ob, db = bsj(o, d, alive)
    print(f"kernel bounced bucketsort: {timeit(kj, ob, db):8.2f} ms")
    print(f"bucketsort(o,d):           {timeit(bsj, o, d, alive):8.2f} ms")

    # how much does the scatter of the full pool cost? (16 more cols)
    def bscatter_full(o, d, alive):
        key = bucket_key(o, d, alive)
        oh = (key[:, None] == jnp.arange(NB)[None, :]).astype(jnp.int32)
        cum = jnp.cumsum(oh, axis=0)
        rank = jnp.take_along_axis(cum, key[:, None], axis=1)[:, 0] - 1
        counts = cum[-1]
        offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                jnp.cumsum(counts)[:-1]])
        pos = offs[key] + rank
        outs = []
        for arr in (o, d, jnp.concatenate([o, d, o, d], axis=1)):
            outs.append(jnp.zeros_like(arr).at[pos].set(arr))
        return outs
    bfj = jax.jit(bscatter_full)
    print(f"bucketsort full pool:      {timeit(bfj, o, d, alive):8.2f} ms")


if __name__ == "__main__":
    main()
