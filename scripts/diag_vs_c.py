"""Bitwise per-bounce comparison: craytpu (current backend) vs the
instrumented C reference binary's dump (scripts/README: /tmp/crayinst).

The C dump (CRAY_DUMP_FILE) is a stream of 16-float records
[x, y, pass, depth, o(3), d(3), weight(3), final(3)] written at the TOP
of each pathTrace bounce. We replay the same (pixel, pass) lanes with
the plain per-bounce step and report, per lane, the first depth where
any field's bits differ — and the exact values, so the diverging C
expression can be identified and its fma placement replicated.

Usage:
  python scripts/diag_vs_c.py /tmp/crayrun/dump.bin [max_report]
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W, H, SPP = 160, 100, 16


def load_dump(path):
    raw = np.fromfile(path, np.float32).reshape(-1, 16)
    lanes = {}
    for rec in raw:
        key = (int(rec[0]), int(rec[1]), int(rec[2]))
        lanes.setdefault(key, []).append(rec[3:])
    return {k: np.stack(v) for k, v in lanes.items()}


def main():
    dump = load_dump(sys.argv[1])
    max_report = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import WavefrontRenderer

    print("backend:", jax.default_backend(), flush=True)
    scene = load_scene_from_file(
        "/root/reference/input/refraction.json",
        {"width": W, "height": H, "samples": SPP})
    r = WavefrontRenderer(compile_scene(scene))
    cs = r.cscene

    keys = sorted(dump.keys())
    xs = jnp.asarray([k[0] for k in keys], jnp.int32)
    ys = jnp.asarray([k[1] for k in keys], jnp.int32)
    B = len(keys)
    print(f"{B} lanes from dump", flush=True)

    # group lanes by pass for _init_rays (pass is scalar there)
    o = np.zeros((B, 3), np.float32)
    d = np.zeros((B, 3), np.float32)
    states = [None] * B
    passes = np.asarray([k[2] for k in keys], np.int32)
    s_all = None
    import jax.tree_util as jtu
    for p in sorted(set(passes.tolist())):
        m = passes == p
        oo, dd, ss = r._init_rays(xs[np.nonzero(m)[0]],
                                  ys[np.nonzero(m)[0]],
                                  jnp.int32(p), jnp.int32(SPP))
        o[m] = np.asarray(oo)
        d[m] = np.asarray(dd)
        leaves = [np.asarray(x) for x in jtu.tree_leaves(ss)]
        if s_all is None:
            s_all = [np.zeros((B,) + le.shape[1:], le.dtype)
                     for le in leaves]
        for buf, le in zip(s_all, leaves):
            buf[m] = le
    treedef = jtu.tree_structure(ss)
    s = jtu.tree_unflatten(treedef, [jnp.asarray(x) for x in s_all])
    o, d = jnp.asarray(o), jnp.asarray(d)

    weight = jnp.ones((B, 4), jnp.float32)
    final = jnp.zeros((B, 4), jnp.float32)
    alive = jnp.ones(B, bool)

    recs = []   # per-depth (o, d, w, fin, alive)
    for k in range(r.max_depth):
        recs.append((np.asarray(o), np.asarray(d), np.asarray(weight),
                     np.asarray(final), np.asarray(alive)))
        fn = r._step_pre if k < 4 else r._step_rr
        o, d, weight, final, s, alive = fn(
            cs.params, cs.geom, cs.shade, cs.mat_graph,
            o, d, weight, final, s, alive)
        if not bool(jnp.any(alive)):
            break
    recs.append((np.asarray(o), np.asarray(d), np.asarray(weight),
                 np.asarray(final), np.asarray(alive)))

    # compare
    names = ["o", "d", "w", "fin"]
    first_div = {}
    n_exact = 0
    reported = 0
    depth_hist = {}
    field_hist = {}
    for li, key in enumerate(keys):
        c = dump[key]          # (K, 12): depth, o, d, w, fin
        K = c.shape[0]
        div = None
        for k in range(min(K, len(recs) - 1)):
            ours = recs[k]
            vals = {
                "o": ours[0][li], "d": ours[1][li],
                "w": ours[2][li][:3], "fin": ours[3][li][:3]}
            cv = {"o": c[k, 1:4], "d": c[k, 4:7], "w": c[k, 7:10],
                  "fin": c[k, 10:13]}
            for nm in names:
                if vals[nm].view(np.uint32).tolist() \
                        != cv[nm].view(np.uint32).tolist():
                    div = (k, nm, vals[nm].copy(), cv[nm].copy())
                    break
            if div:
                break
        if div is None:
            n_exact += 1
            continue
        k, nm, ours_v, c_v = div
        depth_hist[k] = depth_hist.get(k, 0) + 1
        field_hist[nm] = field_hist.get(nm, 0) + 1
        if reported < max_report:
            reported += 1
            print(f"\nlane {key} diverges at depth {k} field {nm}:")
            print(f"  ours {ours_v}")
            print(f"  C    {c_v}")
            print(f"  |d| {np.abs(ours_v - c_v)}")

    print(f"\nexact lanes: {n_exact} / {len(keys)}")
    print("first-divergence depth histogram:", dict(sorted(
        depth_hist.items())))
    print("first-divergence field histogram:", field_hist)


if __name__ == "__main__":
    main()
