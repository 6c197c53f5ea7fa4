"""Validate the flash2 kernel against the SIMT reference walk on TPU:
same winner ids / hit data for primaries and for randomized rays, then
time it."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENE = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/input/scene.json"


def main():
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import WavefrontRenderer
    from craytpu.ops.hitrec import make_isect_fn
    import jax
    import jax.numpy as jnp

    scene = load_scene_from_file(SCENE, {"width": 640, "height": 360})
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs)
    B = 65536
    xs, ys, flat, T, _, _ = r._pixel_schedule
    xs, ys = xs[:B], ys[:B]
    o, d, s = r._init_rays(xs, ys, jnp.int32(0), jnp.int32(16))

    # add some random rays inside the scene bbox
    rng = np.random.default_rng(7)
    bb = np.asarray(cs.geom.node_bounds[0])
    lo, hi = bb[[0, 2, 4]], bb[[1, 3, 5]]
    ro = rng.uniform(lo, hi, (B // 2, 3)).astype(np.float32)
    rd = rng.normal(size=(B // 2, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    o = jnp.concatenate([o[:B // 2], jnp.asarray(ro)])
    d = jnp.concatenate([d[:B // 2], jnp.asarray(rd)])

    alive = jnp.ones(B, bool)
    isect_f = jax.jit(lambda o, d, a: make_isect_fn(cs, "flash")(
        cs.geom, o, d, a))
    isect_s = jax.jit(lambda o, d, a: make_isect_fn(cs, "simt")(
        cs.geom, o, d, a))

    t0 = time.perf_counter()
    f = jax.block_until_ready(isect_f(o, d, alive))
    print(f"flash2 compile+run: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    sref = jax.block_until_ready(isect_s(o, d, alive))
    print(f"simt   compile+run: {time.perf_counter()-t0:.1f}s")

    names = ["is_hit", "p_w", "n_w", "uv", "mat_id", "t"]
    f = [np.asarray(x) for x in f]
    sref = [np.asarray(x) for x in sref]
    hit_match = (f[0] == sref[0]).mean()
    print(f"is_hit match: {hit_match:.6f}")
    both = f[0] & sref[0]
    for i, nm in enumerate(names):
        if nm == "is_hit":
            continue
        a, b = f[i][both], sref[i][both]
        if a.dtype.kind == "f":
            d_ = np.abs(a - b)
            rel = d_ / np.maximum(np.abs(b), 1e-6)
            exact = (a == b).mean()
            print(f"{nm:8s}: exact {exact:.4f}  max abs {d_.max():.3e}  "
                  f"max rel {rel.max():.3e}")
        else:
            print(f"{nm:8s}: match {(a == b).mean():.6f}")

    # timing at full wavefront size
    Bf = 262144
    reps = int(np.ceil(Bf / B))
    o2 = jnp.tile(o, (reps, 1))[:Bf]
    d2 = jnp.tile(d, (reps, 1))[:Bf]
    al2 = jnp.ones(Bf, bool)
    for _ in range(2):
        out = isect_f(o2, d2, al2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = isect_f(o2, d2, al2)
    jax.block_until_ready(out)
    print(f"flash2 isect (262k mixed rays): "
          f"{(time.perf_counter()-t0)/10*1e3:.2f} ms")

    # dead-lane culling effect
    al3 = jnp.asarray(np.arange(Bf) % 4 != 0)
    for _ in range(2):
        out = isect_f(o2, d2, al3)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = isect_f(o2, d2, al3)
    jax.block_until_ready(out)
    print(f"flash2 isect (25% dead scattered): "
          f"{(time.perf_counter()-t0)/10*1e3:.2f} ms")


if __name__ == "__main__":
    main()
