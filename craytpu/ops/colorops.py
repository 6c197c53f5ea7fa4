"""Color device ops: RGBA as shape-(4,) (or (...,4)) float32 arrays.

Mirrors datatypes/color.h (sRGB transfer functions, HSP grayscale, lerp).
"""

from __future__ import annotations

import jax.numpy as jnp

f32 = jnp.float32

BLACK = jnp.zeros(4, f32).at[3].set(1.0)
WHITE = jnp.ones(4, f32)
GRAY = jnp.array([0.5, 0.5, 0.5, 1.0], f32)


def rgba(r, g, b, a=1.0):
    return jnp.array([r, g, b, a], f32)


def color_coef(coef, c):
    """colorCoef: scales ALL four channels including alpha (color.h:46-48)."""
    return c * jnp.asarray(coef, f32)[..., None]


def color_mul(a, b):
    return a * b


def color_add(a, b):
    return a + b


def color_lerp(a, b, t):
    t = jnp.asarray(t, f32)[..., None]
    return a * (f32(1.0) - t) + b * t


def linear_to_srgb(channel):
    return jnp.where(channel <= f32(0.0031308),
                     f32(12.92) * channel,
                     f32(1.055) * jnp.power(jnp.maximum(channel, f32(0.0)),
                                            f32(0.4166666667)) - f32(0.055))


def srgb_to_linear(channel):
    return jnp.where(channel <= f32(0.04045),
                     channel / f32(12.92),
                     jnp.power((channel + f32(0.055)) / f32(1.055), f32(2.4)))


def color_to_srgb(c):
    return jnp.concatenate([linear_to_srgb(c[..., :3]), c[..., 3:]], axis=-1)


def color_from_srgb(c):
    return jnp.concatenate([srgb_to_linear(c[..., :3]), c[..., 3:]], axis=-1)


def grayscale_hsp(c):
    """HSP luminance (color.h:41-44); returns scalar brightness."""
    return jnp.sqrt(f32(0.299) * c[..., 0] ** 2 + f32(0.587) * c[..., 1] ** 2
                    + f32(0.114) * c[..., 2] ** 2)
