"""Render a reference scene with craytpu and compare against the C-reference
golden PNG (goldens/<name>_<W>_<spp>.png), pixel-for-pixel in 8-bit sRGB.

Both renderers consume bit-identical PCG sample streams, so images should
match to accumulation rounding (the C code accumulates in float32 across
threads in a different order; expect |diff| <= 1-2 LSB on noisy pixels).

Usage: python scripts/compare_golden.py scene [spp] [width] [height]
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# default to CPU so comparisons never race the single TPU chip; set
# CRAYTPU_PLATFORM to override. Must happen before any jnp array is created.
import jax  # noqa: E402

jax.config.update("jax_platforms",
                  os.environ.get("CRAYTPU_PLATFORM", "cpu"))


def srgb_u8(fb: np.ndarray) -> np.ndarray:
    """float framebuffer (H,W,4, y-up) -> 8-bit sRGB rows top-down, exactly
    like the reference's per-pixel output conversion (renderer.c:297-300 +
    color.h colorToSRGB + texture.c setPixel clamp)."""
    rgb = fb[..., :3]
    srgb = np.where(rgb > 0.0031308,
                    1.055 * np.power(np.maximum(rgb, 1e-12), 1 / 2.4) - 0.055,
                    12.92 * rgb)
    u8 = np.minimum(np.maximum(srgb * 255.0 + 0.5, 0.0),
                    255.0).astype(np.uint8)
    return u8[::-1]  # y-flip: renderBuffer row 0 is image bottom


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "scene"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 320
    height = int(sys.argv[4]) if len(sys.argv) > 4 else 200

    from PIL import Image
    golden_path = os.path.join(REPO, "goldens", f"{name}_{width}_{spp}.png")
    golden = np.asarray(Image.open(golden_path).convert("RGB"))

    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import render

    scene = load_scene_from_file(
        f"/root/reference/input/{name}.json",
        {"width": width, "height": height, "samples": spp})
    cs = compile_scene(scene)
    fb = render(cs, spp=spp)
    ours = srgb_u8(np.asarray(fb))

    diff = np.abs(ours.astype(np.int32) - golden.astype(np.int32))
    frac_exact = float((diff == 0).mean())
    print(f"{name}: shape={ours.shape} max|d|={diff.max()} "
          f"mean|d|={diff.mean():.4f} exact={frac_exact:.4f} "
          f"(<=1 LSB: {float((diff <= 1).mean()):.4f})")
    out = os.path.join(REPO, "output", f"cmp_{name}_{width}_{spp}.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    Image.fromarray(ours).save(out)
    print(f"wrote {out}")
    return 0 if diff.mean() < 1.0 else 1


if __name__ == "__main__":
    sys.exit(main())
