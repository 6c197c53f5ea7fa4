"""Bisect the cross-backend camera-ray bit divergence op by op.

Records every intermediate of camera.get_ray for the refraction scene's
camera over a full pixel grid (pass 0) on the current backend; compare
prints which intermediate diverges first and by how many ulps.
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
    import craytpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import WavefrontRenderer
    from craytpu.ops import sampler as smp
    from craytpu.ops import vecmath as vm

    f32 = jnp.float32
    print("backend:", jax.default_backend(), flush=True)
    scene = load_scene_from_file(
        "/root/reference/input/refraction.json",
        {"width": W, "height": H, "samples": SPP})
    r = WavefrontRenderer(compile_scene(scene))
    cam = r.cscene.camera
    kind = r.kind

    xs = np.tile(np.arange(W, dtype=np.int32), H)
    ys = np.repeat(np.arange(H, dtype=np.int32), W)

    forward = jnp.asarray(cam.forward)
    right = jnp.asarray(cam.right)
    up = jnp.asarray(cam.up)
    pix_x = right * f32(cam.sensor_x / cam.width)
    pix_y = up * f32(cam.sensor_y / cam.height)
    half_w = f32(cam.width * 0.5)
    half_h = f32(cam.height * 0.5)
    A = jnp.asarray(cam.A)

    def probe(x, y, s):
        rec = {}
        d1, s = smp.get_dimension(kind, s)
        d2, s = smp.get_dimension(kind, s)
        rec["d1"] = d1
        rec["d2"] = d2
        jx = vm.triangle_distribution(d1)
        jy = vm.triangle_distribution(d2)
        rec["jx"] = jx
        rec["jy"] = jy
        px = jnp.asarray(x, f32) - half_w + jx + f32(0.5)
        py = jnp.asarray(y, f32) - half_h + jy + f32(0.5)
        rec["px"] = px
        rec["py"] = py
        pix_v = forward + pix_x * px + pix_y * py
        rec["pix_v"] = pix_v
        rec["len2"] = vm.vdot(pix_v, pix_v)
        rec["len"] = vm.vlength(pix_v)
        direction = vm.vnormalize(pix_v)
        rec["dir"] = direction
        w_dir = A[:3, :3] @ direction
        rec["w_dir"] = w_dir
        return rec

    def run(xs, ys):
        B = xs.shape[0]
        pix_idx = (ys.astype(jnp.uint32) * jnp.uint32(W)
                   + xs.astype(jnp.uint32))
        s = smp.init_sampler(kind, jnp.broadcast_to(jnp.int32(0), (B,)),
                             jnp.broadcast_to(jnp.int32(SPP), (B,)),
                             pix_idx)
        return jax.vmap(probe)(xs, ys, s)

    rec = jax.jit(run)(jnp.asarray(xs), jnp.asarray(ys))
    np.savez(os.path.join(OUT, f"cam_{tag}.npz"),
             **{k: np.asarray(v) for k, v in rec.items()})
    print("recorded", flush=True)


def compare():
    A = np.load(os.path.join(OUT, "cam_cpu.npz"))
    B = np.load(os.path.join(OUT, "cam_tpu.npz"))
    order = ["d1", "d2", "jx", "jy", "px", "py", "pix_v", "len2", "len",
             "dir", "w_dir"]
    for k in order:
        x = A[k].view(np.uint32).astype(np.int64)
        y = B[k].view(np.uint32).astype(np.int64)
        xs = np.where(x >= 0x80000000, 0x80000000 - x, x)
        ysv = np.where(y >= 0x80000000, 0x80000000 - y, y)
        ulp = np.abs(xs - ysv)
        nd = (x != y).mean() * 100
        print(f"{k:8s} %bits-differ={nd:8.4f}  max-ulp={ulp.max()}")
        if nd and k in ("jx", "pix_v", "len2"):
            i = int(np.argmax(ulp.reshape(ulp.shape[0], -1).max(
                axis=tuple(range(1, ulp.ndim)))) if ulp.ndim > 1
                else np.argmax(ulp))
            print(f"   lane {i}: cpu={A[k][i]!r} tpu={B[k][i]!r}")


if __name__ == "__main__":
    if sys.argv[1] == "compare":
        compare()
    else:
        record(sys.argv[1])
