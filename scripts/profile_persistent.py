"""Instrument the persistent render: per-step wall time, live counts,
occupancy, and derived mean path length at 1080p scene.json."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    spp = int(os.environ.get("PROF_SPP", "2"))

    # monkeypatch pool_step to record times and counts
    orig_pool_step = r._pool_step
    log = []

    def wrapped_pool_step(k):
        f = orig_pool_step(k)

        def g(*args):
            t0 = time.perf_counter()
            out = f(*args)
            jax.block_until_ready(out[-1])
            dt = time.perf_counter() - t0
            log.append((dt, int(out[-1])))
            return out
        return g
    r._pool_step = wrapped_pool_step

    # warmup (compiles)
    r.render_persistent(spp=1)
    log.clear()
    t0 = time.perf_counter()
    r.render_persistent(spp=spp)
    wall = time.perf_counter() - t0

    times = np.array([t for t, _ in log])
    lives = np.array([n for _, n in log])
    B = r.tile_rays
    npix = r.width * r.height
    total_paths = npix * spp
    lane_steps = lives.sum() + 0  # live AFTER step; approx
    print(f"wall {wall:.2f}s  steps {len(log)}  paths {total_paths}")
    print(f"paths/s {total_paths/wall:,.0f}")
    print(f"step time: mean {times.mean()*1e3:.1f} ms  "
          f"p50 {np.percentile(times,50)*1e3:.1f}  "
          f"p90 {np.percentile(times,90)*1e3:.1f}  "
          f"sum {times.sum():.2f}s (of wall {wall:.2f}s)")
    print(f"occupancy (live/B after step): mean {lives.mean()/B:.2%}")
    print(f"lane-steps/path ~= {lives.sum()/total_paths + 1:.1f}")
    # time in steps vs everything else (refill/compact/host)
    print(f"non-step time: {wall - times.sum():.2f}s")
    # histogram of live counts
    for lo in range(0, B + 1, B // 8):
        m = (lives >= lo) & (lives < lo + B // 8)
        if m.sum():
            print(f"  live in [{lo:>7},{lo+B//8:>7}): {m.sum():4d} steps, "
                  f"mean dt {times[m].mean()*1e3:.1f} ms")


if __name__ == "__main__":
    main()
