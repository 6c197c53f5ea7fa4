"""Decompose the fwd+bwd rate: time the compaction-scheduled
differentiable trace VALUE-only vs value_and_grad at the bench
configuration (1080p scene.json, full 1M batch, depth 50).

The persistent forward renderer is the wrong yardstick for the backward
pass — it refills the pool every B/16 dead lanes, while the diff trace
drains a single batch under a static width schedule. This prints all
three rates so the backward overhead is measured against the trace's own
forward.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import WavefrontRenderer
    import jax
    import jax.numpy as jnp

    scene = load_scene_from_file("/root/reference/input/scene.json",
                                 {"width": 1920, "height": 1080})
    r = WavefrontRenderer(compile_scene(scene))
    B = r.tile_rays
    xs, ys, _, _, _, _ = r._pixel_schedule
    xs, ys = xs[:B], ys[:B]
    sched = r.census_schedule(xs, ys, spp=2)
    print("schedule:", sched, file=sys.stderr)
    trace = r.make_trace_fn(remat="segment", compaction=sched)

    def loss(params):
        img = trace(params, xs, ys, jnp.int32(0), jnp.int32(16))
        return jnp.mean(img[..., :3])

    def timeit(fn, n=2):
        v = fn(r.cscene.params)
        v = v[0] if isinstance(v, tuple) else v
        float(v)                      # warm + sync through the value
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(r.cscene.params)
            v = out[0] if isinstance(out, tuple) else out
            float(v)
        return (time.perf_counter() - t0) / n

    fwd = timeit(jax.jit(loss))
    print(f"trace fwd only   : {fwd:7.3f} s  {B/fwd/1e3:8.1f} kpaths/s")
    fb = timeit(jax.jit(jax.value_and_grad(loss)))
    print(f"trace fwd+bwd    : {fb:7.3f} s  {B/fb/1e3:8.1f} kpaths/s  "
          f"(bwd overhead {fb/fwd:.2f}x fwd)")


if __name__ == "__main__":
    main()
