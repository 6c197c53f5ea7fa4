"""Primitive intersection device ops (scalar-ray style, vmap over wavefront).

  - Möller-Trumbore triangle test   datatypes/poly.c:17-53
  - sphere quadratic test           datatypes/sphere.c:20-50
  - AABB slab test (FMA form)       accelerators/bvh.c:326-352

All comparisons keep the reference's NaN-ordering semantics: C writes
`x > y ? x : y` (picks y when x is NaN), which maps to jnp.where(x > y, x, y)
— NOT jnp.maximum (which propagates NaNs).
"""

from __future__ import annotations

import jax.numpy as jnp

from craytpu.ops import vecmath as vm

f32 = jnp.float32

FLT_MAX = f32(3.4028235e38)


def tri_intersect(tri_row, origin, direction, best_t):
    """Möller-Trumbore against one packed triangle row (12,) = v0,e1,e2,n.

    e1 = v0 - v1, e2 = v2 - v0, n = cross(e1, e2), exactly as poly.c:20-22.
    Returns (hit, t, u, v). hit requires t >= 0 and t < best_t.
    """
    v0 = tri_row[0:3]
    e1 = tri_row[3:6]
    e2 = tri_row[6:9]
    n = tri_row[9:12]
    c = v0 - origin
    r = vm.vcross(direction, c)
    inv_det = f32(1.0) / vm.vdot(n, direction)
    u = vm.vdot(r, e2) * inv_det
    v = vm.vdot(r, e1) * inv_det
    uv_ok = (u >= f32(0.0)) & (v >= f32(0.0)) & (u + v <= f32(1.0))
    t = vm.vdot(n, c) * inv_det
    hit = uv_ok & (t >= f32(0.0)) & (t < best_t)
    return hit, t, u, v


def sphere_intersect(radius, origin, direction, best_t):
    """Quadratic solve (sphere.c:20-50), object-space ray centered at 0.

    Keeps the reference's quirk of dividing roots by 2 (not 2A), its
    closest-root pick, and the 1e-5 near cutoff. Returns (hit, t).
    """
    A = vm.vdot(direction, direction)
    B = f32(2.0) * vm.vdot(direction, origin)
    C = vm.vdot(origin, origin) - radius * radius
    disc = B * B - f32(4.0) * A * C
    has_roots = disc >= f32(0.0)
    sq = jnp.sqrt(jnp.maximum(disc, f32(0.0)))
    t0 = (-B + sq) / f32(2.0)
    t1 = (-B - sq) / f32(2.0)
    t0 = jnp.where((t0 > t1) & (t1 > f32(0.0)), t1, t0)
    hit = has_roots & (t0 >= f32(1e-5)) & (t0 <= best_t)
    # reference: `t0 < 0.00001f || t0 > *t` rejects; accepts t0 == best
    # but then writes the same distance — equality is harmless either way.
    return hit, t0


def _sel(c, a, b):
    return jnp.where(c, a, b)


def node_intersect(bounds6, inv_dir, scaled_start, octant, max_dist):
    """Slab test (bvh.c:326-352). bounds6 = [minx,maxx,miny,maxy,minz,maxz].

    octant is an int (3,) vector of 0/1; returns (hit, t_entry).
    """
    bx = jnp.where(octant[0] == 0, bounds6[0], bounds6[1])
    Bx = jnp.where(octant[0] == 0, bounds6[1], bounds6[0])
    by = jnp.where(octant[1] == 0, bounds6[2], bounds6[3])
    By = jnp.where(octant[1] == 0, bounds6[3], bounds6[2])
    bz = jnp.where(octant[2] == 0, bounds6[4], bounds6[5])
    Bz = jnp.where(octant[2] == 0, bounds6[5], bounds6[4])
    t_min_x = bx * inv_dir[0] + scaled_start[0]
    t_max_x = Bx * inv_dir[0] + scaled_start[0]
    t_min_y = by * inv_dir[1] + scaled_start[1]
    t_max_y = By * inv_dir[1] + scaled_start[1]
    t_min_z = bz * inv_dir[2] + scaled_start[2]
    t_max_z = Bz * inv_dir[2] + scaled_start[2]
    # NaN-safe compare order (bvh.c:340-346)
    t_min = _sel(t_min_x > t_min_y, t_min_x, t_min_y)
    t_max = _sel(t_max_x < t_max_y, t_max_x, t_max_y)
    t_min = _sel(t_min > t_min_z, t_min, t_min_z)
    t_max = _sel(t_max < t_max_z, t_max, t_max_z)
    t_min = _sel(t_min > f32(0.0), t_min, f32(0.0))
    t_max = _sel(t_max < max_dist, t_max, max_dist)
    return t_min <= t_max, t_min


def ray_octant_invdir(direction):
    """Precompute traversal constants (bvh.c:370-376)."""
    inv_dir = f32(1.0) / direction
    octant = (jnp.signbit(direction)).astype(jnp.int32)
    return inv_dir, octant
