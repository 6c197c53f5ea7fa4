"""Benchmark: paths/second on the reference's flagship scene at 1080p.

Renders `input/scene.json` (the c-ray teapot scene, read from the read-only
reference checkout) at 1920x1080 with the wavefront integrator and reports
steady-state paths/s (one path = one per-pixel sample, the same unit as the
reference's live Msamples/s counter, renderer.c:137-155).

Baseline: the reference README's only published number — 1920x1080 @
1000 spp in 26 min on an unspecified CPU ≈ 1.33 Mpaths/s
(/root/reference/README.md:8-10, BASELINE.md). vs_baseline = ours / 1.33e6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SCENE = os.environ.get(
    "BENCH_SCENE", "/root/reference/input/scene.json")
FALLBACK_SCENE = os.path.join(REPO, "assets", "entry_scene.json")
WIDTH = int(os.environ.get("BENCH_WIDTH", "1920"))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", "1080"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "1"))
PASSES = int(os.environ.get("BENCH_PASSES", "4"))
BASELINE_PATHS_PER_S = 1.33e6


def main():
    import numpy as np
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import WavefrontRenderer

    scene_path = SCENE if os.path.exists(SCENE) else FALLBACK_SCENE
    overrides = {"width": WIDTH, "height": HEIGHT}
    scene = load_scene_from_file(scene_path, overrides)
    r = WavefrontRenderer(compile_scene(scene))

    import jax
    import jax.numpy as jnp
    print(f"bench: {scene_path} {r.width}x{r.height} "
          f"bounces={r.max_depth} on {jax.devices()[0].platform}",
          file=sys.stderr)

    # warmup (compile + cache) on one sample, then the timed persistent
    # wavefront render (full occupancy across tiles and passes)
    r.render_persistent(spp=WARMUP)
    t0 = time.perf_counter()
    accum = r.render_persistent(spp=PASSES)
    dt = time.perf_counter() - t0

    paths = r.width * r.height * PASSES
    pps = paths / dt
    out_dir = os.path.join(REPO, "output")
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "bench_frame.npy"), np.asarray(accum))
    print(json.dumps({
        "metric": "paths_per_sec_1080p_scene_json",
        "value": round(pps, 1),
        "unit": "paths/s",
        "vs_baseline": round(pps / BASELINE_PATHS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
