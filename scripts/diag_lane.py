"""Per-lane bounce-by-bounce bisect of the TPU refraction deviation.

Usage: python scripts/diag_lane.py <tag>
  (CRAYTPU_PLATFORM=cpu python ... cpu   -> output/diag/lane_cpu.npz)
  (python ... tpu                        -> output/diag/lane_tpu.npz)
then: python scripts/diag_lane.py compare

Replays the 16 samples of the worst golden-failing pixels with the plain
per-bounce step (identical sampler streams on both backends) and records
(o, d, weight, alive) after every bounce, so the first diverging bounce
and the diverging quantity (hit point vs scatter direction vs shading
weight) are directly visible.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "output", "diag")

W, H, SPP = 160, 100, 16
NPIX = 24


def pick_pixels():
    d = np.load(os.path.join(OUT, "d_flash.npy"))   # (H, W) top-down
    flat = np.argsort(d.ravel())[::-1][:NPIX]
    ys_top, xs = np.unravel_index(flat, d.shape)
    ys_fb = H - 1 - ys_top                          # framebuffer y-up
    return xs.astype(np.int32), ys_fb.astype(np.int32), d.ravel()[flat]


def record(tag):
    import jax
    import jax.numpy as jnp
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import WavefrontRenderer

    xs, ys_fb, dv = pick_pixels()
    print("backend:", jax.default_backend(), "worst d:", dv[:8])

    scene = load_scene_from_file(
        "/root/reference/input/refraction.json",
        {"width": W, "height": H, "samples": SPP})
    r = WavefrontRenderer(compile_scene(scene))
    cs = r.cscene

    # lanes = NPIX pixels x SPP passes
    xs_l = jnp.asarray(np.tile(xs, SPP))
    ys_l = jnp.asarray(np.tile(ys_fb, SPP))
    B = xs_l.shape[0]

    os_rec, ds_rec, ws_rec, al_rec = [], [], [], []
    # per-pass init (pass index varies per lane block)
    import jax.numpy as jnp
    o_all, d_all, s_all = [], [], []
    for p in range(SPP):
        o, d, s = r._init_rays(jnp.asarray(xs, jnp.int32),
                               jnp.asarray(ys_fb, jnp.int32),
                               jnp.int32(p), jnp.int32(SPP))
        o_all.append(o)
        d_all.append(d)
        s_all.append(s)
    o = jnp.concatenate(o_all)
    d = jnp.concatenate(d_all)
    s = jax.tree.map(lambda *x: jnp.concatenate(x), *s_all)

    weight = jnp.ones((B, 4), jnp.float32)
    final = jnp.zeros((B, 4), jnp.float32)
    alive = jnp.ones(B, bool)
    fins = []
    for k in range(r.max_depth):
        os_rec.append(np.asarray(o))
        ds_rec.append(np.asarray(d))
        ws_rec.append(np.asarray(weight))
        al_rec.append(np.asarray(alive))
        fn = r._step_pre if k < 4 else r._step_rr
        o, d, weight, final, s, alive = fn(
            cs.params, cs.geom, cs.shade, cs.mat_graph,
            o, d, weight, final, s, alive)
        fins.append(np.asarray(final))
        if not bool(jnp.any(alive)):
            break
    np.savez(os.path.join(OUT, f"lane_{tag}.npz"),
             o=np.stack(os_rec), d=np.stack(ds_rec),
             w=np.stack(ws_rec), al=np.stack(al_rec),
             fin=np.stack(fins), xs=xs, ys=ys_fb)
    print("recorded", len(os_rec), "bounces,", B, "lanes")


def compare():
    a = np.load(os.path.join(OUT, "lane_cpu.npz"))
    b = np.load(os.path.join(OUT, "lane_tpu.npz"))
    K = min(a["o"].shape[0], b["o"].shape[0])
    B = a["o"].shape[1]
    finA = a["fin"][min(K, a["fin"].shape[0]) - 1]
    finB = b["fin"][min(K, b["fin"].shape[0]) - 1]
    dfin = np.abs(finA - finB).max(axis=-1)
    print(f"lanes with |final| diff > 0.01: {(dfin > 0.01).sum()} / {B}")
    worst = np.argsort(dfin)[::-1][:12]
    for ln in worst:
        if dfin[ln] < 1e-4:
            break
        px = ln % NPIX
        print(f"\nlane {ln} (pixel x={a['xs'][px]} yfb={a['ys'][px]} "
              f"pass {ln // NPIX}) final diff {dfin[ln]:.4f}")
        for k in range(K):
            do = np.abs(a["o"][k, ln] - b["o"][k, ln]).max()
            dd = np.abs(a["d"][k, ln] - b["d"][k, ln]).max()
            dw = np.abs(a["w"][k, ln] - b["w"][k, ln]).max()
            alA, alB = a["al"][k, ln], b["al"][k, ln]
            dfk = np.abs(a["fin"][min(k, a["fin"].shape[0]-1), ln]
                         - b["fin"][min(k, b["fin"].shape[0]-1), ln]).max()
            flag = " <-- " if (do > 1e-4 or dd > 1e-4 or dw > 1e-4
                              or alA != alB) else ""
            print(f"  k={k:2d} |do|={do:.3e} |dd|={dd:.3e} "
                  f"|dw|={dw:.3e} alive={int(alA)}/{int(alB)} "
                  f"|dfin|={dfk:.3e}{flag}")
            if do > 1e-2 and k:
                print(f"     cpu o={a['o'][k, ln]} d={a['d'][k, ln]}")
                print(f"     tpu o={b['o'][k, ln]} d={b['d'][k, ln]}")
                break


if __name__ == "__main__":
    tag = sys.argv[1]
    if tag == "compare":
        compare()
    else:
        record(tag)
