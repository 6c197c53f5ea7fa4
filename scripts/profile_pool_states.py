"""Time the flash kernel + step components on REAL persistent-pool states
captured mid-render (various depths of mixing)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=8, warmup=2):
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

    # capture pool states by wrapping _pool_step
    snaps = []
    orig = r._pool_step

    def wrap(k):
        f = orig(k)

        def g(*args):
            out = f(*args)
            # args after donation are dead; snapshot the OUTPUT state
            o, d, weight, s, alive, pdepth, delta, n_live = out
            if len(snaps) < 40:
                snaps.append((np.asarray(o), np.asarray(d),
                              np.asarray(alive), np.asarray(pdepth)))
            return out
        return g
    r._pool_step = wrap
    r.render_persistent(spp=1)
    r._pool_step = orig
    print(f"captured {len(snaps)} states")

    flash = fx2.build_flash2_fn(cs.dense_meta)

    def run_kernel(o, d):
        rays_T = fx2.pack_rays_T(o, d)
        lim = jnp.full(o.shape[0], fx2.FLT_MAX, jnp.float32)
        return flash(rays_T, fx2.pack_limit(lim, rays_T.shape[0]))
    kj = jax.jit(run_kernel)

    for i in (0, 2, 4, 6, 8, 12, 16, 20, 30):
        if i >= len(snaps):
            break
        o, d, alive, pdepth = snaps[i]
        if o.shape[0] != B:
            continue
        ms = timeit(kj, jnp.asarray(o), jnp.asarray(d))
        dep = pdepth[alive]
        print(f"step {i:3d}: live {alive.sum():7d} "
              f"depth mean {dep.mean() if len(dep) else 0:.1f} "
              f"kernel {ms:7.2f} ms")


if __name__ == "__main__":
    main()
