"""Host-side timeline of the persistent render WITHOUT per-step syncing:
how long each host operation (dispatch, count pop, refill) takes, and
where wall time goes. Device work overlaps; long host gaps = stalls."""

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

    scene = load_scene_from_file("/root/reference/input/scene.json",
                                 {"width": 1920, "height": 1080})
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs)

    events = []

    def wrapcall(tag, f):
        def g(*a, **k):
            t0 = time.perf_counter()
            out = f(*a, **k)
            events.append((tag, t0, time.perf_counter() - t0))
            return out
        return g

    orig_ps, orig_fpr = r._pool_step, r._flush_pack_refill
    r._pool_step = lambda k: wrapcall(f"step", orig_ps(k))
    r._flush_pack_refill = lambda B, m, Q: wrapcall(
        f"fpr(m={m})", orig_fpr(B, m, Q))

    # also wrap the count sync (int()) by wrapping counts... monkeypatch
    # int is messy; instead wrap n_live.copy_to_host_async indirectly: skip

    r.render_persistent(spp=1)          # warmup/compiles
    events.clear()
    t0 = time.perf_counter()
    r.render_persistent(spp=int(os.environ.get("PROF_SPP", "2")))
    wall = time.perf_counter() - t0

    total_call = sum(d for _, _, d in events)
    print(f"wall {wall:.2f}s, host-side call time {total_call:.2f}s, "
          f"{len(events)} calls")
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0.0])
    for tag, _, d in events:
        agg[tag][0] += 1
        agg[tag][1] += d
    for tag, (n, tot) in sorted(agg.items()):
        print(f"  {tag:12s} n={n:4d} total {tot:6.2f}s mean {tot/n*1e3:7.1f} ms")
    # gaps between consecutive events (host idle or other host work)
    gaps = []
    for i in range(1, len(events)):
        prev_end = events[i - 1][1] + events[i - 1][2]
        gaps.append(events[i][1] - prev_end)
    gaps = np.array(gaps)
    print(f"  inter-call gaps: total {gaps.sum():.2f}s "
          f"mean {gaps.mean()*1e3:.1f} ms p90 {np.percentile(gaps,90)*1e3:.1f}")


if __name__ == "__main__":
    main()
