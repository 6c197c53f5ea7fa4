"""Texture sampling device ops over one (R, 4) RGBA texel-row buffer.

All scene textures are concatenated into one differentiable float32 table
of RGBA rows (channel layouts are normalized at registration: 1-channel ->
(r,r,r,1), 3-channel -> (r,g,b,1)); each image node is compiled with
static (row_offset, width, height, channels) metadata. One bilinear fetch
is then 4 row gathers instead of 16 scalar gathers — gathers are the
scarce resource on TPU.

Fetch semantics mirror datatypes/image/texture.c:33-85: y-flipped storage
(row 0 = top, fetch y=0 = bottom), wrap-around indexing, and the
reference's bilinear filter with trunc-toward-zero int casts. LDR byte
textures were pre-divided by 255 at load, identical to the fetch-time
division in textureGetPixelInternal.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

f32 = jnp.float32
i32 = jnp.int32


def pack_rgba_rows(data: np.ndarray) -> np.ndarray:
    """(H, W, C) float texture -> (H*W, 4) RGBA rows (texture.c channel
    semantics baked in)."""
    h, w, c = data.shape
    rows = data.reshape(h * w, c).astype(np.float32)
    out = np.ones((h * w, 4), np.float32)
    if c == 1:
        out[:, 0] = out[:, 1] = out[:, 2] = rows[:, 0]
    elif c == 2:
        out[:, 0] = out[:, 1] = out[:, 2] = rows[:, 0]
        out[:, 3] = rows[:, 1]
    else:
        out[:, :min(c, 4)] = rows[:, :4]
    return out


def _clamp_inactive(s, active, lo):
    """Route inactive lanes' gather rows to one resident row: a TPU
    gather reads a full 4 KB (8,128) tile per row no matter how narrow
    the row, so full-width fetches for a sparsely-hit texture are tile-
    traffic-bound; inactive lanes (whose outputs the caller discards by
    where-merge) all hitting row `lo` keeps that traffic on one tile."""
    if active is None:
        return s
    return jnp.where(active, s, jnp.asarray(lo, s.dtype))


def _fetch_internal(texels, meta, xi, yi, active=None):
    """textureGetPixelInternal (texture.c:33-64). xi, yi int32 arrays."""
    offset, w, h, _ = meta
    x = jnp.mod(xi, w)
    y = jnp.mod(yi, h)
    return texels[_clamp_inactive(offset + x + (h - 1 - y) * w,
                                  active, offset)]


def fetch_nearest(texels, meta, x, y, active=None):
    """Unfiltered path: float pixel coords, size_t-cast truncation."""
    return _fetch_internal(texels, meta, jnp.asarray(x, f32).astype(i32),
                           jnp.asarray(y, f32).astype(i32), active=active)


def fetch_bilinear(texels, meta, u, v, active=None):
    """Filtered path (texture.c:67-80): u,v in [0,1] texture coords."""
    _, w, h, _ = meta
    x = u * w
    y = v * h
    xc = x - f32(0.5)
    yc = y - f32(0.5)
    xi = xc.astype(i32)  # trunc toward zero, like (int) cast
    yi = yc.astype(i32)
    tl = _fetch_internal(texels, meta, xi, yi, active=active)
    tr = _fetch_internal(texels, meta, xi + 1, yi, active=active)
    bl = _fetch_internal(texels, meta, xi, yi + 1, active=active)
    br = _fetch_internal(texels, meta, xi + 1, yi + 1, active=active)
    fx = (xc - xi.astype(f32))[..., None]
    fy = (yc - yi.astype(f32))[..., None]
    top = tl * (f32(1.0) - fx) + tr * fx
    bot = bl * (f32(1.0) - fx) + br * fx
    return top * (f32(1.0) - fy) + bot * fy


# textures up to this many texels use the single-gather quad path; larger
# ones (big HDR env maps) fall back to 4 gathers rather than paying the
# per-step quad-table build: the (h*w, 16) table costs ~4 texture-sized
# row-gathers + a 16x-texture write per step, which only amortizes when
# the texel count is well below the wavefront lane count (1M on TPU).
# Default 1<<19: scene.json's 499x570 diffuse map (284k texels) sat just
# above the old 1<<18 cutoff and paid ~18 ms/step in the 4-fetch path —
# a half-lane-count texture still amortizes easily at 1M lanes.
QUAD_MAX_TEXELS = int(os.environ.get("CRAYTPU_QUAD_MAX_TEXELS",
                                     str(1 << 19)))


def build_quad_index(meta) -> np.ndarray:
    """(h*w, 4) i32: for each STORAGE row of one texture, the global
    storage rows of its bilinear quad [tl, tr, bl, br] with the wrap and
    y-flip of _fetch_internal baked in. Per-lane bilinear then needs ONE
    16-wide row gather instead of four 4-wide ones — row gathers are
    descriptor-bound on TPU, so this is ~4x cheaper."""
    offset, w, h, _ = meta
    idx = np.arange(h * w)
    x = idx % w
    y = h - 1 - idx // w          # invert s = x + (h-1-y)*w

    def sidx(xx, yy):
        return np.mod(xx, w) + (h - 1 - np.mod(yy, h)) * w

    quad = np.stack([sidx(x, y), sidx(x + 1, y),
                     sidx(x, y + 1), sidx(x + 1, y + 1)], axis=1)
    return (offset + quad).astype(np.int32)


def fetch_bilinear_quadtab(quad, meta, u, v, active=None):
    """fetch_bilinear with the 4 texel reads fused into ONE row gather
    against a precomputed quad-row table (built once per step by
    Registry.make_ctx from params.texels). Two table forms:

      f32 (h*w, 16): the quad's texels verbatim (differentiable — texel
        gradients flow through the make_ctx gather).
      u32 (h*w, 4): byte-exact LDR quads packed 4 RGBA bytes per word.
        TPU gathers run at ~1 element/cycle regardless of row width, so
        this fetches 4 elements/lane instead of 16; dequantization is
        f32(byte)/255 in-register — the reference's own fetch-time math
        (texture.c:33-64), bit-identical to the f32 table.

    Bit-identical values to fetch_bilinear either way."""
    _, w, h, _ = meta
    x = u * w
    y = v * h
    xc = x - f32(0.5)
    yc = y - f32(0.5)
    xi = xc.astype(i32)
    yi = yc.astype(i32)
    s = (jnp.mod(xi, w) + (h - 1 - jnp.mod(yi, h)) * w)
    s = _clamp_inactive(s, active, 0)
    rows = quad[s]                         # ONE (B,) row gather
    if quad.dtype == jnp.uint32:
        inv255 = f32(255.0)
        texels = []
        for t in range(4):
            word = rows[..., t]
            texels.append(jnp.stack(
                [((word >> (8 * ch)) & jnp.uint32(0xFF)).astype(f32)
                 / inv255 for ch in range(4)], axis=-1))
        tl, tr, bl, br = texels
    else:
        tl = rows[..., 0:4]
        tr = rows[..., 4:8]
        bl = rows[..., 8:12]
        br = rows[..., 12:16]
    fx = (xc - xi.astype(f32))[..., None]
    fy = (yc - yi.astype(f32))[..., None]
    top = tl * (f32(1.0) - fx) + tr * fx
    bot = bl * (f32(1.0) - fx) + br * fx
    return top * (f32(1.0) - fy) + bot * fy
