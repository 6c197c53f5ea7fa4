"""Vector math device ops (float3 as shape-(3,) arrays, scalar-ray style).

Semantics mirror datatypes/vector.h; written to be vmapped over a wavefront
of rays. Sampler-consuming helpers thread SamplerState explicitly and consume
dimensions in exactly the reference's order.
"""

from __future__ import annotations

import jax.numpy as jnp

from craytpu.ops import sampler as smp

f32 = jnp.float32
PI = f32(3.14159265358979323846)  # includes.h PI


def vec(x, y, z):
    return jnp.stack([jnp.asarray(x, f32), jnp.asarray(y, f32),
                      jnp.asarray(z, f32)])


def vdot(a, b):
    # component-wise, NOT jnp.sum(a*b, axis=-1): the axis reduce pads the
    # minor dim 3 -> 128 on TPU (T(8,128) layout) and a single fused loop
    # of these norms measured 18 ms/step at 1M lanes in device traces.
    # Same float association as the 3-element reduce: (a0+a1)+a2.
    return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
            + a[..., 2] * b[..., 2])


def vcross(a, b):
    return jnp.stack([
        a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
        a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
        a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
    ], axis=-1)


def vlength(a):
    return jnp.sqrt(vdot(a, a))


def vnormalize(a):
    # vector.h:173-176 divides by length (no epsilon guard)
    return a / vlength(a)[..., None]


def vreflect(incident, n):
    """vecReflect (vector.h:211-213)."""
    return incident - n * (vdot(n, incident) * f32(2.0))[..., None]


def refract(in_dir, normal, ni_over_nt):
    """refract (vector.h:252-266). Returns (ok, refracted)."""
    uv = vnormalize(in_dir)
    dt = vdot(uv, normal)
    discriminant = f32(1.0) - ni_over_nt * ni_over_nt * (f32(1.0) - dt * dt)
    ok = discriminant > f32(0.0)
    safe_disc = jnp.maximum(discriminant, f32(0.0))
    refracted = (uv - normal * dt[..., None]) * ni_over_nt[..., None] \
        - normal * jnp.sqrt(safe_disc)[..., None]
    return ok, refracted


def schlick(cosine, ior):
    """schlick (vector.h:268-272)."""
    r0 = (f32(1.0) - ior) / (f32(1.0) + ior)
    r0 = r0 * r0
    return r0 + (f32(1.0) - r0) * jnp.power(f32(1.0) - cosine, f32(5.0))


def random_on_unit_sphere(kind: str, s: smp.SamplerState):
    """randomOnUnitSphere (vector.h:243-249). Consumes 2 dims."""
    sx, s = smp.get_dimension(kind, s)
    sy, s = smp.get_dimension(kind, s)
    a = sx * (f32(2.0) * PI)
    t = jnp.maximum(f32(0.0), sy * (f32(1.0) - sy))
    r = f32(2.0) * jnp.sqrt(t)
    return jnp.stack([jnp.cos(a) * r, jnp.sin(a) * r,
                      f32(1.0) - f32(2.0) * sy], axis=-1), s


def random_coord_on_unit_disc(kind: str, s: smp.SamplerState):
    """randomCoordOnUnitDisc (vector.h:194-198). Consumes 2 dims."""
    d1, s = smp.get_dimension(kind, s)
    r = jnp.sqrt(d1)
    d2, s = smp.get_dimension(kind, s)
    theta = d2 * (f32(2.0) * PI)
    return r * jnp.cos(theta), r * jnp.sin(theta), s


def triangle_distribution(v):
    """Tent-filter reshaping of a uniform sample (camera.c:50-56)."""
    orig = v * f32(2.0) - f32(1.0)
    out = orig / jnp.sqrt(jnp.abs(orig))
    out = jnp.clip(out, f32(-1.0), f32(1.0))
    sign = jnp.where(orig >= f32(0.0), f32(1.0), f32(-1.0))
    out = out - sign
    # C computes orig/sqrt(|orig|) which is NaN at orig==0; clamp handles
    # +-inf but NaN propagates in C too (probability-zero event for PCG
    # floats, but guard anyway to keep XLA numerics clean).
    return jnp.where(orig == f32(0.0), f32(-1.0), out)


def ortho_basis(i):
    """baseWithVec (vector.h:225-237): PBRT orthonormal basis."""
    cond = jnp.abs(i[..., 0]) > jnp.abs(i[..., 1])
    len_a = jnp.sqrt(i[..., 0] ** 2 + i[..., 2] ** 2)
    j_a = jnp.stack([-i[..., 2] / len_a, jnp.zeros_like(len_a),
                     i[..., 0] / len_a], axis=-1)
    len_b = jnp.sqrt(i[..., 1] ** 2 + i[..., 2] ** 2)
    j_b = jnp.stack([jnp.zeros_like(len_b), i[..., 2] / len_b,
                     -i[..., 1] / len_b], axis=-1)
    j = jnp.where(cond[..., None], j_a, j_b)
    return i, j, vcross(i, j)


def wrap_min_max(x, lo, hi):
    """wrapMinMax (vector.h:215-221)."""
    rng = hi - lo
    return lo + jnp.mod(rng + jnp.mod(x - lo, rng), rng)


def along_ray(start, direction, t):
    """alongRay (lightray.h)."""
    return start + direction * jnp.asarray(t, f32)[..., None]
