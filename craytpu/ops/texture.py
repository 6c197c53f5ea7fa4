"""Texture sampling device ops over a single flat texel buffer.

All scene textures are concatenated into one differentiable float32 buffer;
each image node is compiled with static (offset, width, height, channels)
metadata. Fetch semantics mirror datatypes/image/texture.c:33-85: y-flipped
storage (row 0 = top, fetch y=0 = bottom), wrap-around indexing, and the
reference's bilinear filter with trunc-toward-zero int casts. LDR byte
textures were pre-divided by 255 at load, identical to the fetch-time
division in textureGetPixelInternal.
"""

from __future__ import annotations

import jax.numpy as jnp

f32 = jnp.float32
i32 = jnp.int32


def _fetch_internal(texels, meta, xi, yi):
    """textureGetPixelInternal (texture.c:33-64). xi, yi int32 scalars."""
    offset, w, h, ch = meta
    x = jnp.mod(xi, w)
    y = jnp.mod(yi, h)
    base = offset + (x + (h - 1 - y) * w) * ch
    if ch == 1:
        r = texels[base]
        return jnp.stack([r, r, r, jnp.ones_like(r)], axis=-1)
    r = texels[base]
    g = texels[base + 1]
    b = texels[base + 2]
    a = texels[base + 3] if ch > 3 else jnp.ones_like(r)
    return jnp.stack([r, g, b, a], axis=-1)


def fetch_nearest(texels, meta, x, y):
    """Unfiltered path: float pixel coords, size_t-cast truncation."""
    return _fetch_internal(texels, meta, jnp.asarray(x, f32).astype(i32),
                           jnp.asarray(y, f32).astype(i32))


def fetch_bilinear(texels, meta, u, v):
    """Filtered path (texture.c:67-80): u,v in [0,1] texture coords."""
    _, w, h, _ = meta
    x = u * w
    y = v * h
    xc = x - f32(0.5)
    yc = y - f32(0.5)
    xi = xc.astype(i32)  # trunc toward zero, like (int) cast
    yi = yc.astype(i32)
    tl = _fetch_internal(texels, meta, xi, yi)
    tr = _fetch_internal(texels, meta, xi + 1, yi)
    bl = _fetch_internal(texels, meta, xi, yi + 1)
    br = _fetch_internal(texels, meta, xi + 1, yi + 1)
    fx = (xc - xi.astype(f32))[..., None]
    fy = (yc - yi.astype(f32))[..., None]
    top = tl * (f32(1.0) - fx) + tr * fx
    bot = bl * (f32(1.0) - fx) + br * fx
    return top * (f32(1.0) - fy) + bot * fy
