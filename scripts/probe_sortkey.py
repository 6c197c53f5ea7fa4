"""Compare pool sort-key variants by flash2 kernel time on the saved
realistic mixed pool state (/tmp/kernel_state.npz from profile_step.py).

For each CRAYTPU_SORT_KEY mode the raw lanes are re-sorted by that key
and the production kernel timed on the result — isolating how much ray
grouping (not the sort cost itself, ~constant) changes visit counts.

Usage: python scripts/probe_sortkey.py [mode ...]   (default: all three)
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
    import jax
    import jax.numpy as jnp

    z = np.load("/tmp/kernel_state.npz")
    o0 = jnp.asarray(z["o"])
    d0 = jnp.asarray(z["d"])
    alive0 = jnp.asarray(z["alive"])

    scene = load_scene_from_file("/root/reference/input/scene.json",
                                 {"width": 1920, "height": 1080})
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs)
    flash = fx2.build_flash2_fn(cs.dense_meta)

    def run(o, d, alive):
        rays_T = fx2.pack_rays_T(o, d)
        lim = jnp.where(alive, jnp.float32(fx2.FLT_MAX), jnp.float32(0.0))
        return flash(rays_T, fx2.pack_limit(lim, rays_T.shape[0]))
    kj = jax.jit(run)

    modes = sys.argv[1:] or ["octant", "pos", "dirfine"]
    for mode in modes:
        os.environ["CRAYTPU_SORT_KEY"] = mode
        key_fn = r._morton_key()
        order = jnp.argsort(key_fn(o0, d0, alive0))
        o, d, alive = o0[order], d0[order], alive0[order]
        jax.block_until_ready(o)
        ms = timeit(kj, o, d, alive)
        print(f"sortkey[{mode:8s}]  {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
