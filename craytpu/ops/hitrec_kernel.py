"""Pallas hit-record kernel: the whole winner-resolve math in ONE VPU
pass.

The XLA hitrec (ops/hitrec.py) is ~45 reference-rounded fma chains over
(B,·) arrays; at 1M lanes XLA splits it into ~6 fusions, each streaming
the wide rows through HBM — 17.8 ms/bounce measured vs ~1 ms of actual
compute (scripts/profile_hitrec.py). This kernel runs the identical
formulas (same vecmath primitives — Mosaic compiles mul/add with the
same IEEE roundings as XLA, verified bit-level) over transposed
(feature, lane) blocks held in VMEM, so every intermediate lives
on-chip and HBM sees each input/output float exactly once.

Used for the non-differentiable product path; the XLA implementation
remains the differentiable/reference twin, and
tests/test_hitrec_kernel.py pins the two bit-identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from craytpu.ops import vecmath as vm

f32 = jnp.float32
i32 = jnp.int32
FLT_MAX = 3.4028235e38  # Python float: Pallas rejects captured arrays

BLK = 4096
N_OUT = 16   # t u v | p_w(3) | n_w(3) | uv(2) | n_obj_sph(3) | pad


def _kernel(twT, iwT, oT, dT, tk, sph, hit, out, *, sphere_uv):
    def tw(i):
        return twT[i:i + 1, :]

    def iw(i):
        return iwT[i:i + 1, :]

    ox, oy, oz = oT[0:1, :], oT[1:2, :], oT[2:3, :]
    dx, dy, dz = dT[0:1, :], dT[1:2, :], dT[2:3, :]
    is_sph = sph[0:1, :] > 0
    is_hit = hit[0:1, :] > 0
    t_k = tk[0:1, :]

    fma = vm.fma_raw
    dot3 = vm.dot3_cray

    # ---- object-space ray: mat34_point/mat33_vec rounding ----
    def xform_point(base, x, y, z):
        return [fma(z, iw(base + 4 * i + 2),
                    fma(x, iw(base + 4 * i), y * iw(base + 4 * i + 1)))
                + iw(base + 4 * i + 3) for i in range(3)]

    def xform_vec(base, x, y, z):
        return [fma(z, iw(base + 4 * i + 2),
                    fma(x, iw(base + 4 * i), y * iw(base + 4 * i + 1)))
                for i in range(3)]

    o_s = xform_point(12, ox, oy, oz)          # Ainv rows at 12..23
    d_s = xform_vec(12, dx, dy, dz)
    off = iw(24)
    o_s = [fma(d_s[i], off, o_s[i]) for i in range(3)]

    # ---- Moller-Trumbore recompute (tri rows 0:12 = v0 e1 e2 n) ----
    c = [tw(i) - o_s[i] for i in range(3)]
    # r = cross(d_s, c), reference fms rounding
    r = [fma(d_s[1], c[2], -(d_s[2] * c[1])),
         fma(d_s[2], c[0], -(d_s[0] * c[2])),
         fma(d_s[0], c[1], -(d_s[1] * c[0]))]
    n = [tw(9), tw(10), tw(11)]
    inv_det = vm.exact_div(
        f32(1.0), dot3(n[0], n[1], n[2], d_s[0], d_s[1], d_s[2]))
    u_x = dot3(r[0], r[1], r[2], tw(6), tw(7), tw(8)) * inv_det
    v_x = dot3(r[0], r[1], r[2], tw(3), tw(4), tw(5)) * inv_det
    t_x = dot3(n[0], n[1], n[2], c[0], c[1], c[2]) * inv_det

    # ---- sphere quadratic recompute (intersectSphere rounding) ----
    radius = iw(26)
    A = dot3(d_s[0], d_s[1], d_s[2], d_s[0], d_s[1], d_s[2])
    Bq = f32(2.0) * dot3(d_s[0], d_s[1], d_s[2], o_s[0], o_s[1], o_s[2])
    Cq = fma(-radius, radius,
             dot3(o_s[0], o_s[1], o_s[2], o_s[0], o_s[1], o_s[2]))
    disc = fma(Bq, Bq, -((f32(4.0) * A) * Cq))
    sq = vm.exact_sqrt(jnp.maximum(disc, f32(0.0)))
    t0 = (-Bq + sq) / f32(2.0)
    t1 = (-Bq - sq) / f32(2.0)
    t_s = jnp.where((t0 > t1) & (t1 > f32(0.0)), t1, t0)

    is_tri = is_hit & ~is_sph
    t = jnp.where(is_tri, t_x, jnp.where(is_sph & is_hit, t_s, t_k))
    u = jnp.where(is_tri, u_x, f32(0.0))
    v = jnp.where(is_tri, v_x, f32(0.0))
    t = jnp.where(is_hit, t, FLT_MAX)

    p_obj = [vm.det_fma(d_s[i], t, o_s[i]) for i in range(3)]

    # ---- sphere normal (vecNormalize of the object-space hit) ----
    sph_len2 = dot3(p_obj[0], p_obj[1], p_obj[2],
                    p_obj[0], p_obj[1], p_obj[2])
    sph_len = jnp.where(is_sph, vm.exact_sqrt(sph_len2), f32(1.0))
    sph_len = jnp.where(sph_len == 0, f32(1.0), sph_len)
    n_sph = [vm.exact_div(p_obj[i], sph_len) for i in range(3)]

    # ---- mesh normal / uv interpolation (poly.c fma rounding) ----
    w = f32(1.0) - u - v
    flags = tw(28).astype(i32)
    has_n = (flags & 1) == 1
    n_sm = [fma(tw(12 + i), w, fma(tw(15 + i), u, tw(18 + i) * v))
            for i in range(3)]
    n_mesh = [jnp.where(has_n, n_sm[i], tw(9 + i)) for i in range(3)]
    uv_ok = (flags & 2) == 2
    uv_m = [jnp.where(uv_ok,
                      fma(tw(21 + i), w, fma(tw(23 + i), u,
                                             tw(25 + i) * v)),
                      f32(-1.0)) for i in range(2)]

    n_obj = [jnp.where(is_sph, n_sph[i], n_mesh[i]) for i in range(3)]
    # transformVectorWithTranspose rounding (mat33_vec_T)
    n_w = [fma(n_obj[2], iw(12 + 8 + i),
               fma(n_obj[0], iw(12 + i), n_obj[1] * iw(12 + 4 + i)))
           for i in range(3)]
    n_len2 = dot3(n_w[0], n_w[1], n_w[2], n_w[0], n_w[1], n_w[2])
    n_len = vm.exact_sqrt(n_len2)
    n_len = jnp.where(n_len == 0, f32(1.0), n_len)
    n_w = [jnp.where(is_sph, n_w[i], vm.exact_div(n_w[i], n_len))
           for i in range(3)]

    p_w = xform_point(0, p_obj[0], p_obj[1], p_obj[2])   # A rows at 0..11

    out[0:1, :] = t
    out[1:2, :] = u
    out[2:3, :] = v
    for i in range(3):
        out[3 + i:4 + i, :] = p_w[i]
        out[6 + i:7 + i, :] = n_w[i]
        out[11 + i:12 + i, :] = n_sph[i] if sphere_uv \
            else jnp.zeros_like(t)
    for i in range(2):
        out[9 + i:10 + i, :] = uv_m[i]
    out[14:15, :] = jnp.zeros_like(t)
    out[15:16, :] = jnp.zeros_like(t)


def build_hitrec_kernel(sphere_uv: bool, interpret: bool = False):
    """hitrec_k(twT (32,B), iwT (28,B), oT (3,B), dT (3,B), tk (1,B),
    sph (1,B) i32, hit (1,B) i32) -> (16, B) f32 rows
    [t, u, v, p_w, n_w, uv_mesh, n_obj_sph, pad]."""
    kern = functools.partial(_kernel, sphere_uv=sphere_uv)

    def call(twT, iwT, oT, dT, tk, sph, hit):
        B = twT.shape[1]
        assert B % BLK == 0, B
        grid = (B // BLK,)

        def spec(rows):
            return pl.BlockSpec((rows, BLK), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[spec(32), spec(28), spec(3), spec(3), spec(1),
                      spec(1), spec(1)],
            out_specs=spec(N_OUT),
            out_shape=jax.ShapeDtypeStruct((N_OUT, B), f32),
            interpret=interpret,
        )(twT, iwT, oT, dT, tk, sph, hit)

    return call
