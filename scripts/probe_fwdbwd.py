"""Probe: fwd+bwd paths/s through the differentiable trace on TPU.

Isolates the bench.py gradient section so remat-policy experiments can
be timed without paying the forward bench + goldens. Usage:
    python scripts/probe_fwdbwd.py [remat_mode]
remat_mode: segment (default) | segment_hits | true | none
Pass "sort" as a second arg to enable the per-bounce Morton re-sort.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCENE = os.environ.get("BENCH_SCENE", "/root/reference/input/scene.json")
WIDTH = int(os.environ.get("BENCH_WIDTH", "1920"))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", "1080"))
PASSES = int(os.environ.get("BENCH_PASSES", "16"))

mode = sys.argv[1] if len(sys.argv) > 1 else "segment"
SORT = "sort" in sys.argv[2:]


def main():
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import WavefrontRenderer

    import jax
    import jax.numpy as jnp

    scene = load_scene_from_file(SCENE, {"width": WIDTH, "height": HEIGHT})
    r = WavefrontRenderer(compile_scene(scene))
    print(f"probe: {WIDTH}x{HEIGHT} bounces={r.max_depth} "
          f"platform={jax.devices()[0].platform} remat={mode}",
          file=sys.stderr)

    B = r.tile_rays
    xs, ys, _, _, _, _ = r._pixel_schedule
    xs, ys = xs[:B], ys[:B]
    t0 = time.perf_counter()
    if os.environ.get("PROBE_EXACT_CENSUS", "1") == "1":
        sched = r.census_schedule(
            xs, ys, spp=PASSES, passes=[0], safety=1.05, quant=1024,
            shrink_ratio=float(os.environ.get("PROBE_SHRINK", "0.5")))
    else:
        sched = r.census_schedule(xs, ys, spp=2)
    print(f"probe: schedule {sched}  ({time.perf_counter()-t0:.1f}s)",
          file=sys.stderr)
    remat = {"segment": "segment", "segment_hits": "segment_hits",
             "true": True, "none": False}[mode]
    trace = r.make_trace_fn(remat=remat, compaction=sched, sort=SORT)

    def loss(params):
        img = trace(params, xs, ys, jnp.int32(0), jnp.int32(PASSES))
        return jnp.mean(img[..., :3])

    vg = jax.jit(jax.value_and_grad(loss))
    t0 = time.perf_counter()
    v, g = vg(r.cscene.params)
    jax.block_until_ready(g)
    print(f"probe: compile+warmup {time.perf_counter()-t0:.1f}s "
          f"loss={float(v):.6f}", file=sys.stderr)
    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        v, g = vg(r.cscene.params)
        float(v)
    dt = time.perf_counter() - t0
    pps = B * reps / dt
    print(f"fwd_bwd: {pps:,.0f} paths/s  ({dt/reps:.2f} s/rep, B={B})")


if __name__ == "__main__":
    main()
