"""PNG writer with tEXt metadata (replaces utils/encoders/formats/png.c).

Embeds the same metadata keys the reference writes (png.c:37-60): Software,
CRay version, Image rendertime, Samples per pixel, Bounces, Renderer threads,
plus system info. The float framebuffer is y-up (row 0 = bottom), so rows
flip on write like the reference's texture storage.
"""

from __future__ import annotations

import numpy as np

from craytpu.version import __version__, REFERENCE_VERSION


def _to_srgb_u8(fb: np.ndarray) -> np.ndarray:
    c = np.clip(fb[..., :3], 0.0, None).astype(np.float32)
    srgb = np.where(c <= 0.0031308, 12.92 * c,
                    1.055 * np.power(np.maximum(c, 1e-12), 1.0 / 2.4) - 0.055)
    return (np.minimum(srgb * 255.0, 255.0)).astype(np.uint8)


def write_png(path: str, framebuffer: np.ndarray, metadata: dict | None = None,
              already_srgb_u8: bool = False) -> None:
    from PIL import Image
    from PIL.PngImagePlugin import PngInfo

    fb = np.asarray(framebuffer)
    data = fb if already_srgb_u8 else _to_srgb_u8(fb)
    data = data[::-1]  # y-up buffer -> PNG top-down rows

    info = PngInfo()
    meta = {"Software": f"craytpu {__version__} "
                        f"(c-ray {REFERENCE_VERSION} capabilities)"}
    meta.update(metadata or {})
    for k, v in meta.items():
        info.add_text(str(k), str(v))
    Image.fromarray(data, "RGB").save(path, pnginfo=info)


def write_bmp(path: str, framebuffer: np.ndarray) -> None:
    """Hand-rolled BMP (utils/encoders/formats/bmp.c:19-88): 24-bit BGR,
    bottom-up rows, row padding to 4 bytes."""
    import struct

    data = _to_srgb_u8(np.asarray(framebuffer))
    h, w, _ = data.shape
    bgr = data[..., ::-1]  # already bottom-up since buffer is y-up
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    img_size = (row_bytes + pad) * h
    with open(path, "wb") as f:
        f.write(b"BM")
        f.write(struct.pack("<IHHI", 54 + img_size, 0, 0, 54))
        f.write(struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                            2835, 2835, 0, 0))
        padding = b"\x00" * pad
        for y in range(h):
            f.write(bgr[y].tobytes())
            f.write(padding)
