"""Ablate the flash2 kernel to locate its time: control/scan/DMA vs MXU
matmul vs epilogue valid-math vs winner extraction.

Runs the same Morton-sorted 1M-lane mixed pool state through kernels
built with CRAYTPU_FLASH_ABLATE = novisit / noepilogue / noextract / ""
(full). Each ablation is compiled in a SUBPROCESS (the env is read at
kernel build import time) unless run with a single mode argument.

Usage: python scripts/profile_kernel.py [mode]
With no argument, spawns itself once per mode sequentially.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = ["novisit", "noepilogue", "noextract", ""]


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


def run_mode(mode: str):
    os.environ["CRAYTPU_FLASH_ABLATE"] = mode
    import numpy as np
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
    o, d, st = r._init_rays(xs, ys, jnp.int32(0), jnp.int32(16))
    # one bounce of mixing via the SIMPLE diffuse-like perturbation: use
    # the real step once (costly compile) OR approximate with reflected
    # rays off the first hit — use primaries + one real bounce state
    # saved by profile_step if present, else primaries only.
    state = "/tmp/kernel_state.npz"
    if os.path.exists(state):
        z = np.load(state)
        o, d = jnp.asarray(z["o"]), jnp.asarray(z["d"])
        alive = jnp.asarray(z["alive"])
    else:
        alive = jnp.ones(B, bool)

    flash = fx2.build_flash2_fn(cs.dense_meta)

    def run(o, d, alive):
        rays_T = fx2.pack_rays_T(o, d)
        lim = jnp.where(alive, jnp.float32(fx2.FLT_MAX), jnp.float32(0.0))
        return flash(rays_T, fx2.pack_limit(lim, rays_T.shape[0]))
    kj = jax.jit(run)
    ms = timeit(kj, o, d, alive)
    label = mode if mode else "full"
    print(f"kernel[{label:10s}]  {ms:8.2f} ms   (B={B})", flush=True)


def main():
    if len(sys.argv) > 1:
        run_mode(sys.argv[1] if sys.argv[1] != "full" else "")
        return
    for m in MODES:
        env = dict(os.environ)
        env["CRAYTPU_FLASH_ABLATE"] = m
        subprocess.run([sys.executable, "-u", __file__, m or "full"],
                       env=env)


if __name__ == "__main__":
    main()
