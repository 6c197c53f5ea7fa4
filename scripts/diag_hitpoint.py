"""Pinpoint the op behind the bounce-1 hit-point divergence (diag_lane).

For one batch of identical primary rays, compute the full hit record
(is_hit, p_w, n_w, uv, mat, t) under each traversal mode on the current
backend and dump to .npz. Run once on TPU and once with
CRAYTPU_PLATFORM=cpu, then "compare" prints a mode x backend error
matrix for p_w / n_w / t, separating winner disagreement (different
prim wins) from same-winner math drift (transform precision).
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "output", "diag")
os.makedirs(OUT, exist_ok=True)

W, H, SPP = 160, 100, 16


def record(tag):
    import jax
    import jax.numpy as jnp
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import WavefrontRenderer
    from craytpu.ops.hitrec import make_isect_fn

    print("backend:", jax.default_backend(), flush=True)
    scene = load_scene_from_file(
        "/root/reference/input/refraction.json",
        {"width": W, "height": H, "samples": SPP})
    r = WavefrontRenderer(compile_scene(scene))

    # deterministic primary rays for the whole frame, pass 0
    xs = np.tile(np.arange(W, dtype=np.int32), H)
    ys = np.repeat(np.arange(H, dtype=np.int32), W)
    o, d, _ = r._init_rays(jnp.asarray(xs), jnp.asarray(ys),
                           jnp.int32(0), jnp.int32(SPP))
    np.save(os.path.join(OUT, f"hp_rays_{tag}.npy"),
            np.concatenate([np.asarray(o), np.asarray(d)], axis=1))

    alive = jnp.ones(o.shape[0], bool)
    modes = ["simt", "dense"]
    if jax.default_backend() != "cpu":
        modes.append("flash")
    for mode in modes:
        fn = jax.jit(lambda oo, dd, aa, m=mode: make_isect_fn(
            r.cscene, m)(r.cscene.geom, oo, dd, aa))
        is_hit, p_w, n_w, uv, mat, t = fn(o, d, alive)
        np.savez(os.path.join(OUT, f"hp_{tag}_{mode}.npz"),
                 hit=np.asarray(is_hit), p=np.asarray(p_w),
                 n=np.asarray(n_w), uv=np.asarray(uv),
                 mat=np.asarray(mat), t=np.asarray(t))
        print(f"{mode}: hits={int(np.asarray(is_hit).sum())}", flush=True)


def compare():
    ra = np.load(os.path.join(OUT, "hp_rays_cpu.npy"))
    rb = np.load(os.path.join(OUT, "hp_rays_tpu.npy"))
    print("ray parity max|d|:", np.abs(ra - rb).max())

    ref = np.load(os.path.join(OUT, "hp_cpu_simt.npz"))
    combos = [("cpu", "dense"), ("tpu", "simt"), ("tpu", "dense"),
              ("tpu", "flash")]
    for tag, mode in combos:
        f = os.path.join(OUT, f"hp_{tag}_{mode}.npz")
        if not os.path.exists(f):
            continue
        x = np.load(f)
        both = ref["hit"] & x["hit"]
        hit_mism = int((ref["hit"] != x["hit"]).sum())
        mat_mism = int((both & (ref["mat"] != x["mat"])).sum())
        # same-winner lanes: same mat and t within 1e-3 relative
        trel = np.abs(ref["t"] - x["t"]) / np.maximum(np.abs(ref["t"]),
                                                      1e-6)
        samew = both & (ref["mat"] == x["mat"]) & (trel < 1e-3)
        dp = np.abs(ref["p"] - x["p"]).max(axis=-1)
        dn = np.abs(ref["n"] - x["n"]).max(axis=-1)
        dt = np.abs(ref["t"] - x["t"])
        def q(v, m):
            v = v[m]
            if not len(v):
                return "n/a"
            return (f"max={v.max():.3e} p99={np.quantile(v, 0.99):.3e} "
                    f"med={np.median(v):.3e} frac>1e-4="
                    f"{(v > 1e-4).mean():.4f}")
        print(f"\n{tag}/{mode} vs cpu/simt: hit-mism={hit_mism} "
              f"mat-mism={mat_mism} same-winner={int(samew.sum())}")
        print("  |dp| same-winner:", q(dp, samew))
        print("  |dn| same-winner:", q(dn, samew))
        print("  |dt| same-winner:", q(dt, samew))


if __name__ == "__main__":
    if sys.argv[1] == "compare":
        compare()
    else:
        record(sys.argv[1])
