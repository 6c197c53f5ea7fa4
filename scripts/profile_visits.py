"""Histogram MXU block visits per ray block (CRAYTPU_FLASH_DEBUG=1) on a
realistic sorted pool state, at several depths of bounce mixing.

The DEBUG kernel overwrites its prim output with counters, so it must
NEVER feed the state evolution: the bounce steps here are traced with
the env var unset (clean kernel), and the env var is only set right
before building the separate counting kernel. (An earlier version set
it at import — the corrupted prim ids killed ~70%/bounce of the pool
and the live%% column was garbage.)"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import WavefrontRenderer
    from craytpu.ops import flash2 as fx2
    import jax
    import jax.numpy as jnp

    scene = load_scene_from_file(
        os.environ.get("PROF_SCENE", "/root/reference/input/scene.json"),
        {"width": 1920, "height": 1080})
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs)
    B = r.tile_rays
    xs, ys, _, _, _, _ = r._pixel_schedule
    xs, ys = xs[:B], ys[:B]
    o0, d0, s = r._init_rays(xs, ys, jnp.int32(0), jnp.int32(16))

    step = r._make_step("dynamic")
    stepj = jax.jit(lambda o, d, w, fin, st, alive: step(
        cs.params, cs.geom, cs.shade, cs.mat_graph, o, d, w, fin, st,
        alive, False))
    # force the CLEAN trace now — jit traces lazily and the kernel
    # builder reads CRAYTPU_FLASH_DEBUG at trace time
    _w = jnp.ones((B, 4), jnp.float32)
    _f = jnp.zeros((B, 4), jnp.float32)
    jax.block_until_ready(stepj(o0, d0, _w, _f, s, jnp.ones(B, bool)))
    os.environ["CRAYTPU_FLASH_DEBUG"] = "1"   # counting kernel ONLY
    flash = fx2.build_flash2_fn(cs.dense_meta)
    kj = jax.jit(lambda o, d, a: flash(
        fx2.pack_rays_T(o, d),
        fx2.pack_limit(jnp.where(a, jnp.float32(fx2.FLT_MAX),
                                 jnp.float32(0.0)),
                       (B + fx2.RAY_BLOCK - 1) // fx2.RAY_BLOCK)))
    key_fn = r._morton_key()

    w = jnp.ones((B, 4), jnp.float32)
    fin = jnp.zeros((B, 4), jnp.float32)
    alive = jnp.ones(B, bool)
    o, d, st = o0, d0, s
    for depth in range(6):
        order = jnp.argsort(key_fn(o, d, alive))
        os_, ds_, al_ = o[order], d[order], alive[order]
        t, p, ii = kj(os_, ds_, al_)
        visits = np.asarray(p[:, 0, 0])
        sbents = np.asarray(p[:, 0, 1])
        live = float(jnp.sum(al_)) / B
        print(f"depth {depth}: live {live:5.1%}  visits/rayblock "
              f"mean {visits.mean():6.1f} p50 {np.percentile(visits,50):4.0f} "
              f"p90 {np.percentile(visits,90):4.0f} max {visits.max():4d}  "
              f"sb-entries mean {sbents.mean():5.1f}")
        o, d, w, fin, st, alive = stepj(o, d, w, fin, st, alive)


if __name__ == "__main__":
    main()
