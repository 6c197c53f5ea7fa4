"""Device-side scene representation: SoA pytrees of JAX arrays.

This is the TPU-native analogue of the reference's pointer-based world
(datatypes/scene.h:14-39 + vertexbuffer globals + per-mesh BVHs): every
per-mesh BVH and the top-level BVH are flattened into single global node
arrays; triangles are packed rows; instances are transform pairs + object
references. Shapes use the suffix convention
  M = total BVH nodes (TLAS first, then each BLAS)
  Q = total prim-index slots, P = triangles, I = instances,
  S = spheres, N = normals, T = texcoords, K = materials.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# instance kinds (instance.c constructors)
INST_MESH = 0
INST_SPHERE = 1
INST_MESH_VOLUME = 2
INST_SPHERE_VOLUME = 3


class Geometry(NamedTuple):
    """Everything the traversal kernel needs."""
    node_bounds: jnp.ndarray   # (M, 6) f32: minx,maxx,miny,maxy,minz,maxz
    node_child: jnp.ndarray    # (M,) i32: inner → global left-child node id;
    #                                     leaf → row into prim_idx
    node_count: jnp.ndarray    # (M,) i32: 0 inner, >0 leaf prim count
    prim_idx: jnp.ndarray      # (Q,) i32: TLAS leaf → instance id;
    #                                     BLAS leaf → global triangle id
    tri_packed: jnp.ndarray    # (P, 12) f32: v0, e1=v0-v1, e2=v2-v0, n=e1xe2
    inst_A: jnp.ndarray        # (I, 3, 4) f32 object→world
    inst_Ainv: jnp.ndarray     # (I, 3, 4) f32 world→object
    inst_kind: jnp.ndarray     # (I,) i32 INST_*
    inst_obj: jnp.ndarray      # (I,) i32 mesh or sphere index
    inst_offset: jnp.ndarray   # (I,) f32 rayOffset (bbox.h:43-45)
    inst_density: jnp.ndarray  # (I,) f32 volume density (0 for solids)
    blas_root: jnp.ndarray     # (num_meshes,) i32 global root node (-1 empty)
    sph_radius: jnp.ndarray    # (S,) f32


class ShadeGeom(NamedTuple):
    """Deferred per-hit shading data (only touched for the winning hit).

    hit_info is gather-bound on TPU, so the per-triangle vertex data is
    DENORMALIZED into one wide f32 row per triangle (two gathers per hit
    instead of eight index+vertex gathers):
      tri_shade: [n0(3), n1(3), n2(3), uv0(2), uv1(2), uv2(2), pad]
      tri_mf:    [material id, flags]  flags bit0=has_n, bit1=uv_ok
    """
    tri_shade: jnp.ndarray     # (P, 16) f32 denormalized normals + uvs
    tri_mf: jnp.ndarray        # (P, 2) i32 [mat, flags]
    sph_mat: jnp.ndarray       # (S,) i32 global material id


class MaterialTable(NamedTuple):
    """Legacy per-material fields read by the integrator directly.

    pathtrace.c:44 adds material.emission each hit; plastic reads
    material.IOR from the hit record (plastic.c:66-77).
    """
    emission: jnp.ndarray      # (K, 4) f32
    ior: jnp.ndarray           # (K,) f32
    bsdf_graph: jnp.ndarray    # (K,) i32 index into compiled shading programs


class Hit(NamedTuple):
    """Traversal result (per ray)."""
    t: jnp.ndarray        # f32; distance from the winning instance's
    #                       offset origin (reference parametrization)
    prim: jnp.ndarray     # i32 global triangle id, or -1 for sphere hits
    inst: jnp.ndarray     # i32 instance id, -1 = miss
    u: jnp.ndarray        # f32 barycentric u (triangles)
    v: jnp.ndarray        # f32 barycentric v
