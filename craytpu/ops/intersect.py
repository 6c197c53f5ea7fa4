"""Primitive intersection device ops (batched over the last axis's lanes).

  - Möller-Trumbore triangle test   datatypes/poly.c:17-53
  - sphere quadratic test           datatypes/sphere.c:20-50
  - AABB slab test (FMA form)       accelerators/bvh.c:326-352

All functions broadcast: inputs may be single rays ((3,), (6,), scalars) or
wavefronts ((B,3), (B,6), (B,)). Comparisons keep the reference's
NaN-ordering semantics: C writes `x > y ? x : y` (picks y when x is NaN),
which maps to jnp.where(x > y, x, y) — NOT jnp.maximum (NaN-propagating).
"""

from __future__ import annotations

import jax.numpy as jnp

from craytpu.ops import vecmath as vm

f32 = jnp.float32

FLT_MAX = f32(3.4028235e38)


def tri_intersect(tri_row, origin, direction, best_t):
    """Möller-Trumbore against packed triangle rows (..., 12) = v0,e1,e2,n.

    e1 = v0 - v1, e2 = v2 - v0, n = cross(e1, e2), exactly as poly.c:20-22.
    Returns (hit, t, u, v). hit requires t >= 0 and t < best_t.
    """
    v0 = tri_row[..., 0:3]
    e1 = tri_row[..., 3:6]
    e2 = tri_row[..., 6:9]
    n = tri_row[..., 9:12]
    c = v0 - origin
    r = vm.vcross(direction, c)
    # exact_div: TPU's reciprocal-based divide is up to 2 ulp off CPU's;
    # t feeds hit points that deep glass chains amplify (vm.exact_div)
    inv_det = vm.exact_div(f32(1.0), vm.vdot(n, direction))
    u = vm.vdot(r, e2) * inv_det
    v = vm.vdot(r, e1) * inv_det
    uv_ok = (u >= f32(0.0)) & (v >= f32(0.0)) & (u + v <= f32(1.0))
    t = vm.vdot(n, c) * inv_det
    hit = uv_ok & (t >= f32(0.0)) & (t < best_t)
    return hit, t, u, v


def sphere_intersect(radius, origin, direction, best_t):
    """Quadratic solve (sphere.c:20-50), object-space ray, sphere at origin.

    Keeps the reference's quirks: roots divided by 2 (not 2A), closest-root
    pick, 1e-5 near cutoff, and <=best acceptance. Returns (hit, t).

    Rounded exactly like the reference BINARY's contracted build
    (intersectSphere disassembly): C = fnma(r, r, o.o) and
    disc = fms(B, B, (4A)*C) are single-rounding fmas — the (-B + sq)
    cancellation amplifies a 1-ulp disc difference several ulps into t,
    which deep glass chains turn into visible golden deviations.
    """
    A = vm.vdot(direction, direction)
    B = f32(2.0) * vm.vdot(direction, origin)
    C = vm.fma_raw(-radius, radius, vm.vdot(origin, origin))
    disc = vm.fma_raw(B, B, -((f32(4.0) * A) * C))
    has_roots = disc >= f32(0.0)
    sq = vm.exact_sqrt(jnp.maximum(disc, f32(0.0)))
    t0 = (-B + sq) / f32(2.0)
    t1 = (-B - sq) / f32(2.0)
    t0 = jnp.where((t0 > t1) & (t1 > f32(0.0)), t1, t0)
    hit = has_roots & (t0 >= f32(1e-5)) & (t0 <= best_t)
    return hit, t0


def _sel(c, a, b):
    return jnp.where(c, a, b)


def node_intersect(bounds6, inv_dir, scaled_start, octant, max_dist):
    """Slab test (bvh.c:326-352). bounds6 = (..., 6) minx,maxx,miny,maxy,...

    octant is int (..., 3) of 0/1; returns (hit, t_entry).
    """
    def pick(axis):
        lo = bounds6[..., axis * 2]
        hi = bounds6[..., axis * 2 + 1]
        neg = octant[..., axis] == 1
        near = jnp.where(neg, hi, lo)
        far = jnp.where(neg, lo, hi)
        t_near = near * inv_dir[..., axis] + scaled_start[..., axis]
        t_far = far * inv_dir[..., axis] + scaled_start[..., axis]
        return t_near, t_far

    t_min_x, t_max_x = pick(0)
    t_min_y, t_max_y = pick(1)
    t_min_z, t_max_z = pick(2)
    # NaN-safe compare order (bvh.c:340-346)
    t_min = _sel(t_min_x > t_min_y, t_min_x, t_min_y)
    t_max = _sel(t_max_x < t_max_y, t_max_x, t_max_y)
    t_min = _sel(t_min > t_min_z, t_min, t_min_z)
    t_max = _sel(t_max < t_max_z, t_max, t_max_z)
    t_min = _sel(t_min > f32(0.0), t_min, jnp.zeros_like(t_min))
    t_max = _sel(t_max < max_dist, t_max, max_dist)
    return t_min <= t_max, t_min


def ray_octant_invdir(direction):
    """Precompute traversal constants (bvh.c:370-376)."""
    inv_dir = vm.exact_div(f32(1.0), direction)
    octant = (jnp.signbit(direction)).astype(jnp.int32)
    return inv_dir, octant
