"""Diagnose the TPU-only refraction golden deviation (VERDICT r4 #1).

Renders refraction.json at 160x100/16spp on the current backend in
several traversal modes, saves framebuffers, and prints per-mode golden
scores plus a spatial breakdown of the failing subpixels. Also runs a
direct winner-parity probe: the flash kernel vs the SIMT reference walk
on identical ray batches (primary + bounced), reporting where the two
disagree (instance kind, t gap), which separates "wrong winner selected
by the bf16 search" from "same winner, different shading math".
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W, H, SPP = 160, 100, 16
OUT = os.path.join(REPO, "output", "diag")
os.makedirs(OUT, exist_ok=True)


def load(mode):
    os.environ["CRAYTPU_TRAVERSAL"] = mode
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import WavefrontRenderer
    scene = load_scene_from_file(
        "/root/reference/input/refraction.json",
        {"width": W, "height": H, "samples": SPP})
    return WavefrontRenderer(compile_scene(scene))


def score(fb, tag):
    from craytpu.utils import golden as gold
    ok, within, mean_abs = gold.compare(np.asarray(fb), "refraction",
                                        W, H, SPP)
    print(f"{tag}: ok={ok} within1lsb={within:.5f} mean|d|={mean_abs:.4f}",
          flush=True)
    return ok


def diffmap(fb, tag):
    from craytpu.utils import golden as gold
    from PIL import Image
    path = os.path.join(REPO, "goldens", f"refraction_{W}_{SPP}.png")
    g = np.asarray(Image.open(path).convert("RGB")).astype(np.int32)
    ours = gold.srgb_u8(np.asarray(fb)).astype(np.int32)
    d = np.abs(ours - g).max(axis=-1)          # (H, W) top-down
    bad = d > 1
    print(f"{tag}: bad pixels {bad.sum()} / {bad.size} "
          f"max|d|={d.max()}", flush=True)
    ys, xs = np.nonzero(bad)
    if len(ys):
        # 10x10 cell histogram to see spatial clustering
        cell = (ys // 10) * (W // 10 + 1) + xs // 10
        vals, cnt = np.unique(cell, return_counts=True)
        top = np.argsort(cnt)[::-1][:8]
        for i in top:
            cy, cx = divmod(int(vals[i]), W // 10 + 1)
            print(f"  cell y={cy*10}-{cy*10+9} x={cx*10}-{cx*10+9}: "
                  f"{cnt[i]} bad (maxd "
                  f"{d[cy*10:cy*10+10, cx*10:cx*10+10].max()})",
                  flush=True)
    np.save(os.path.join(OUT, f"d_{tag}.npy"), d)


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)

    # ---- mode renders ----
    for mode in ("flash", "dense"):
        t0 = time.time()
        r = load(mode)
        fb = np.asarray(r.render(spp=SPP))
        print(f"{mode} render {time.time()-t0:.1f}s", flush=True)
        np.save(os.path.join(OUT, f"fb_{mode}.npy"), fb)
        score(fb, mode)
        diffmap(fb, mode)

    # ---- winner parity probe: flash vs simt on identical rays ----
    os.environ["CRAYTPU_TRAVERSAL"] = "flash"
    r = load("flash")
    from craytpu.ops.hitrec import make_isect_fn
    import jax.numpy as jnp
    isect_f = jax.jit(lambda o, d, a: make_isect_fn(r.cscene, "flash")(
        r.cscene.geom, o, d, a))
    isect_s = jax.jit(lambda o, d, a: make_isect_fn(r.cscene, "simt")(
        r.cscene.geom, o, d, a))

    B = min(r.tile_rays, W * H * 4)
    xs, ys, _, _, _, _ = r._pixel_schedule
    xs, ys = xs[:B], ys[:B]
    rng = np.random.default_rng(0)

    def compare_batch(o, d, tag):
        alive = jnp.ones(o.shape[0], bool)
        hf = isect_f(o, d, alive)
        hs = isect_s(o, d, alive)
        # is_hit, p_w, n_w, uv, mat_id, t
        hitf, hits = np.asarray(hf[0]), np.asarray(hs[0])
        tf, ts = np.asarray(hf[5]), np.asarray(hs[5])
        mf, ms = np.asarray(hf[4]), np.asarray(hs[4])
        mism_hit = hitf != hits
        both = hitf & hits
        dt = np.abs(tf - ts)
        rel = dt / np.maximum(np.abs(ts), 1e-6)
        mism_t = both & (rel > 1e-4)
        mism_mat = both & (mf != ms)
        print(f"{tag}: N={len(tf)} hit-mismatch={mism_hit.sum()} "
              f"t-mismatch(rel>1e-4)={mism_t.sum()} "
              f"mat-mismatch={mism_mat.sum()}", flush=True)
        for idx in np.nonzero(mism_hit | mism_t | mism_mat)[0][:10]:
            print(f"  lane {idx}: hit {hitf[idx]}/{hits[idx]} "
                  f"t {tf[idx]:.6g}/{ts[idx]:.6g} "
                  f"mat {mf[idx]}/{ms[idx]}", flush=True)
        return hf

    for pass_idx in range(2):
        o, d, _ = r._init_rays(xs, ys, jnp.int32(pass_idx),
                               jnp.int32(SPP))
        hf = compare_batch(o, d, f"primary pass{pass_idx}")
        # bounce off the hits: reflect-ish random directions from hit
        # points (not physically meaningful, just secondary-ray shaped:
        # origins on surfaces, directions random)
        p = np.asarray(hf[1])
        n = np.asarray(hf[2])
        hit = np.asarray(hf[0])
        nd = rng.normal(size=p.shape).astype(np.float32)
        nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
        o2 = np.where(hit[:, None], p, np.asarray(o))
        d2 = np.where(hit[:, None], nd, np.asarray(d)).astype(np.float32)
        compare_batch(jnp.asarray(o2), jnp.asarray(d2),
                      f"secondary pass{pass_idx}")


if __name__ == "__main__":
    main()
