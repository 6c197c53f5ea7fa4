"""Child process for bench.py's mesh-overhead measurement.

Renders the entry scene with the persistent wavefront on however many
devices the parent's XLA_FLAGS exposes (1 -> WavefrontRenderer,
>1 -> ShardedPoolRenderer over the full mesh), after one warmup render,
and prints the timed wall seconds as the LAST stdout line.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SCENE = os.path.join(REPO, "assets", "entry_scene.json")
SPP = int(os.environ.get("BENCH_MESH_SPP", "16"))
SIZE = os.environ.get("BENCH_MESH_SIZE", "160x100")


def main():
    w, h = (int(x) for x in SIZE.split("x"))
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.parallel.pool_shard import make_renderer
    import jax

    cs = compile_scene(load_scene_from_file(
        SCENE, {"width": w, "height": h}))
    r = make_renderer(cs)
    print(f"{len(jax.devices())} devices, {type(r).__name__}",
          file=sys.stderr)
    r.render_persistent(spp=2)              # warmup/compile
    t0 = time.perf_counter()
    r.render_persistent(spp=SPP)
    print(time.perf_counter() - t0)


if __name__ == "__main__":
    main()
