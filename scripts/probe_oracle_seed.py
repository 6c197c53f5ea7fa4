"""Upper-bound the gain of ANY best_t seeding scheme (kernel_perf
direction #2): run the flash2 kernel with the limit pre-seeded to the
TRUE hit t (from a first kernel run) and compare kernel time vs the
FLT_MAX baseline. A cross-bounce visit-list/seed mechanism can at best
approach the oracle number.

Usage: python scripts/probe_oracle_seed.py   (real TPU; needs
/tmp/kernel_state.npz from scripts/profile_step.py for the mixed-bounce
pool, else primaries)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    o, d, st = r._init_rays(xs[:B], ys[:B], jnp.int32(0), jnp.int32(16))
    state = "/tmp/kernel_state.npz"
    tag = "primaries"
    if os.path.exists(state):
        z = np.load(state)
        o, d = jnp.asarray(z["o"]), jnp.asarray(z["d"])
        alive = jnp.asarray(z["alive"])
        tag = "mixed pool"
    else:
        alive = jnp.ones(B, bool)
    print(f"state: {tag}  B={B}", flush=True)

    flash = fx2.build_flash2_fn(cs.dense_meta)

    def run(o, d, limit):
        rays_T = fx2.pack_rays_T(o, d)
        return flash(rays_T, fx2.pack_limit(limit, rays_T.shape[0]))

    kj = jax.jit(run)
    lim_base = jnp.where(alive, jnp.float32(fx2.FLT_MAX),
                         jnp.float32(0.0))
    t, p, ii = kj(o, d, lim_base)
    t_true = jnp.reshape(t, (-1,))[:B]
    ms_base = timeit(kj, o, d, lim_base)
    print(f"baseline (FLT_MAX)     {ms_base:8.2f} ms", flush=True)

    for mult, label in ((1.0001, "oracle t*1.0001"),
                        (2.0, "seed t*2"), (8.0, "seed t*8")):
        lim = jnp.where(alive & (t_true < 3e38),
                        t_true * jnp.float32(mult), lim_base)
        ms = timeit(kj, o, d, lim)
        print(f"{label:22s} {ms:8.2f} ms  ({ms / ms_base * 100:.0f}%)",
              flush=True)


if __name__ == "__main__":
    main()
