"""Golden-image parity helpers, shared by the pytest gate
(tests/test_golden.py) and the bench-path TPU gate (bench.py).

The C oracle (renderer.c:297-300 + colorToSRGB + setPixel clamp) writes
8-bit sRGB rows top-down; goldens/<name>_<W>_<SPP>.png are its outputs.
Thresholds allow float accumulation-order differences (the C build uses a
per-thread running mean) but fail on any real shading/traversal change.
"""

from __future__ import annotations

import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# the full corpus with 80x50/4spp goldens (9 reference scenes + 2
# synthetic stress scenes with C-oracle goldens)
SCENES = ["scene", "hdr", "refraction", "glowmetal", "uvsphere",
          "alphanode", "fence", "venus", "statues",
          "stress_highpoly", "stress_instances"]

# minimum fraction of subpixels within 1 8-bit LSB of the oracle
MIN_WITHIN_1LSB = 0.985
MAX_MEAN_ABS = 1.0


def scene_path(name: str) -> str:
    if name.startswith("stress_"):
        return os.path.join(REPO, "assets", f"{name}.json")
    return f"/root/reference/input/{name}.json"


def srgb_u8(fb: np.ndarray) -> np.ndarray:
    """float framebuffer (H,W,4, y-up) -> 8-bit sRGB rows top-down."""
    rgb = fb[..., :3]
    srgb = np.where(rgb > 0.0031308,
                    1.055 * np.power(np.maximum(rgb, 1e-12), 1 / 2.4)
                    - 0.055,
                    12.92 * rgb)
    u8 = np.minimum(np.maximum(srgb * 255.0 + 0.5, 0.0),
                    255.0).astype(np.uint8)
    return u8[::-1]


def compare(fb: np.ndarray, name: str, w: int = 80, h: int = 50,
            spp: int = 4):
    """Compare a float framebuffer against goldens/<name>_<w>_<spp>.png.

    Returns (ok, within_1lsb_fraction, mean_abs) — ok is None if no
    golden exists for the scene at this size."""
    from PIL import Image
    path = os.path.join(REPO, "goldens", f"{name}_{w}_{spp}.png")
    if not os.path.exists(path):
        return None, 0.0, 0.0
    golden = np.asarray(Image.open(path).convert("RGB"))
    ours = srgb_u8(np.asarray(fb))
    d = np.abs(ours.astype(np.int32) - golden.astype(np.int32))
    within = float((d <= 1).mean())
    mean_abs = float(d.mean())
    ok = within >= MIN_WITHIN_1LSB and mean_abs <= MAX_MEAN_ABS
    return ok, within, mean_abs


def render_and_compare(name: str, w: int = 80, h: int = 50,
                       spp: int = 4):
    """Render one corpus scene on the CURRENT backend and compare."""
    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import WavefrontRenderer
    scene = load_scene_from_file(
        scene_path(name), {"width": w, "height": h, "samples": spp})
    r = WavefrontRenderer(compile_scene(scene))
    fb = r.render(spp=spp)
    return compare(np.asarray(fb), name, w, h, spp)
