"""Dense MXU-formulated closest-hit search (the TPU-native traversal).

Per-lane BVH walks are gather-bound: XLA lowers per-lane random access at
~10 GB/s effective on TPU (measured on this chip), ~100x below stream
bandwidth, while the MXU idles. This module reformulates Möller-Trumbore
so ALL ray x triangle terms come out of matmuls:

With tri data (v0, e1=v0-v1, e2=v2-v0, n=e1xe2) (poly.c:20-22) and ray
(o, d), every M-T quantity is bilinear in the ray features

    phi(ray) = [d, o, w = d x o, 1]            (10 dims)

      det   = d.n
      u*det = d.(v0 x e2) - w.e2     (r = d x (v0 - o); u*det = r.e2)
      v*det = d.(v0 x e1) - w.e1
      t*det = n.v0 - o.n

so (B,10) @ (10, 4*TB) matmuls yield det/u*det/v*det/t*det for every
(ray, tri) pair, and the closest valid hit is a running min over triangle
blocks — a flash-attention-shaped pipeline (MXU matmul + VPU reduce
epilogue), zero gathers. The search only has to get the WINNING TRIANGLE
ID right: exact (t, u, v) are recomputed afterwards with the classic
formulation (ops/intersect.py) on the single winner, so shading consumes
bit-identical hit data to the SIMT traversal whenever the same triangle
wins (ties apart).

Instancing: rays are transformed into each instance's space and the search
runs against that instance's mesh blocks, the running best carried across
instances in each instance's own t-measure — the same cross-space
comparison the reference makes (instance.c:169-185). Sphere instances use
the exact quadratic (they're a handful). The per-lane SIMT walk
(ops/traverse.py) remains for CPU execution and golden-parity tests;
pick with CRAYTPU_TRAVERSAL=simt|dense|auto.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from craytpu.ops import intersect as isx
from craytpu.ops import vecmath as vm
from craytpu.scene.device import Geometry, Hit, INST_MESH, INST_SPHERE

f32 = jnp.float32
i32 = jnp.int32
FLT_MAX = isx.FLT_MAX

import os as _os
# triangles per streamed block (lane-dim multiple of 128)
TRI_BLOCK = int(_os.environ.get("CRAYTPU_TRI_BLOCK", "256"))


def build_tri_coeffs(tri_packed: np.ndarray) -> np.ndarray:
    """(P, 12) packed triangles -> (nblocks, 10, 4*TRI_BLOCK) coefficients.

    Within a block the columns are [det | u*det | v*det | t*det], each a
    TRI_BLOCK-wide group. Padded slots are all-zero: det=0 turns every
    derived quantity into inf/NaN and the validity mask false.
    """
    tri = np.asarray(tri_packed, np.float32)
    P = tri.shape[0]
    nb = max((P + TRI_BLOCK - 1) // TRI_BLOCK, 1)
    v0, e1, e2, n = tri[:, 0:3], tri[:, 3:6], tri[:, 6:9], tri[:, 9:12]
    W = np.zeros((nb * TRI_BLOCK, 4, 10), np.float32)
    W[:P, 0, 0:3] = n                     # det = d.n
    W[:P, 1, 0:3] = np.cross(v0, e2)      # u*det: d term
    W[:P, 1, 6:9] = -e2                   # u*det: w term
    W[:P, 2, 0:3] = np.cross(v0, e1)      # v*det: d term
    W[:P, 2, 6:9] = -e1                   # v*det: w term
    W[:P, 3, 3:6] = -n                    # t*det: o term
    W[:P, 3, 9] = np.einsum("ij,ij->i", n, v0)  # t*det: const term
    # (nb, TB, 4, 10) -> (nb, 10, 4, TB) -> (nb, 10, 4*TB)
    Wb = W.reshape(nb, TRI_BLOCK, 4, 10).transpose(0, 3, 2, 1)
    return np.ascontiguousarray(Wb.reshape(nb, 10, 4 * TRI_BLOCK))


def ray_features(o, d):
    """phi(ray): (B, 10) = [d, o, d x o, 1]."""
    w = vm.vcross(d, o)
    one = jnp.ones(o.shape[:-1] + (1,), f32)
    return jnp.concatenate([d, o, w, one], axis=-1)


def build_tri_coeffs_T(tri_packed: np.ndarray, phi_dim: int = 16):
    """PHI-major coefficient blocks for the Pallas kernel plus per-block
    bboxes: (nb, phi_dim, 4*TRI_BLOCK) f32 and (nb, 8) f32.

    Within a block, lane groups are [det | u*det | v*det | t*det]. The
    lane dim is 4*TRI_BLOCK (a multiple of 128) so HBM DMA slices stay
    tile-aligned. Block bboxes cover the block's triangles in mesh
    space — triangle packing follows BVH order, so blocks are spatially
    coherent.
    """
    W = build_tri_coeffs(tri_packed)            # (nb, 10, 4*TB)
    nb = W.shape[0]
    WT = np.zeros((nb, phi_dim, 4 * TRI_BLOCK), np.float32)
    WT[:, :10, :] = W
    tri = np.asarray(tri_packed, np.float32)
    v0, e1, e2 = tri[:, 0:3], tri[:, 3:6], tri[:, 6:9]
    v1 = v0 - e1
    v2 = e2 + v0
    lo = np.minimum(v0, np.minimum(v1, v2))
    hi = np.maximum(v0, np.maximum(v1, v2))
    bb = np.zeros((nb, 8), np.float32)
    P = tri.shape[0]
    for k in range(nb):
        s, e = k * TRI_BLOCK, min((k + 1) * TRI_BLOCK, P)
        if s >= e:
            bb[k, 0::2][:3] = FLT_MAX
            bb[k, 1::2][:3] = -FLT_MAX
            continue
        bmin = lo[s:e].min(axis=0)
        bmax = hi[s:e].max(axis=0)
        bb[k] = [bmin[0], bmax[0], bmin[1], bmax[1], bmin[2], bmax[2], 0, 0]
    return WT, bb


def _search_mesh(phi, W, base_prim, best_t, best_prim):
    """Running closest-hit over one mesh's blocks. Returns (t, prim)."""

    def body(carry, Wk):
        bt, bp, k = carry
        q = jax.lax.dot_general(phi, Wk, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)  # (B, 4*TB)
        q = q.reshape(phi.shape[0], 4, TRI_BLOCK)
        det, ud, vd, td = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        inv = f32(1.0) / det
        u = ud * inv
        v = vd * inv
        t = td * inv
        valid = ((u >= f32(0.0)) & (v >= f32(0.0)) & (u + v <= f32(1.0))
                 & (t >= f32(0.0)) & (t < bt[:, None]))
        t = jnp.where(valid, t, FLT_MAX)
        j = jnp.argmin(t, axis=-1)
        tmin = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
        upd = tmin < bt
        bt = jnp.where(upd, tmin, bt)
        bp = jnp.where(upd, base_prim + k * TRI_BLOCK + j.astype(i32), bp)
        return (bt, bp, k + 1), None

    (bt, bp, _), _ = jax.lax.scan(body, (best_t, best_prim, i32(0)), W)
    return bt, bp


def make_dense_traverse_fn(dense_meta: dict):
    """Dense closest-hit, same signature as traverse.make_traverse_fn's
    output: traverse(geom, o_w, d_w) -> Hit."""
    mesh_W = dense_meta["mesh_W"]
    mesh_base = dense_meta["mesh_base"]
    inst_order = dense_meta["inst_order"]

    def traverse(geom: Geometry, o_w, d_w) -> Hit:
        B = o_w.shape[0]
        best_t = jnp.full(B, FLT_MAX, f32)
        best_prim = jnp.full(B, -1, i32)
        best_inst = jnp.full(B, -1, i32)

        for inst_id, kind, obj in inst_order:
            Ainv = geom.inst_Ainv[inst_id]           # static index: slice
            off = geom.inst_offset[inst_id]
            o_i = jnp.einsum("ij,bj->bi", Ainv[:, :3], o_w) + Ainv[:, 3]
            d_i = jnp.einsum("ij,bj->bi", Ainv[:, :3], d_w)
            o_i = o_i + d_i * off
            if kind == INST_SPHERE:
                hit, t = isx.sphere_intersect(geom.sph_radius[obj], o_i,
                                              d_i, best_t)
                best_t = jnp.where(hit, t, best_t)
                best_prim = jnp.where(hit, -1, best_prim)
                best_inst = jnp.where(hit, i32(inst_id), best_inst)
            elif kind == INST_MESH and mesh_W[obj] is not None:
                phi = ray_features(o_i, d_i)
                new_t, new_p = _search_mesh(phi, mesh_W[obj],
                                            i32(mesh_base[obj]),
                                            best_t, best_prim)
                upd = new_t < best_t
                best_t = jnp.where(upd, new_t, best_t)
                best_prim = jnp.where(upd, new_p, best_prim)
                best_inst = jnp.where(upd, i32(inst_id), best_inst)

        return exact_recompute(geom, o_w, d_w, best_t, best_prim, best_inst)

    return traverse


def exact_recompute(geom, o_w, d_w, best_t, best_prim, best_inst) -> Hit:
    """Recompute (t, u, v) for the winning triangle with the classic
    formulation -> bit-identical shading inputs to the SIMT path."""
    B = o_w.shape[0]
    is_tri = best_prim >= 0
    pr = jnp.maximum(best_prim, 0)
    tri = geom.tri_packed[pr]
    safe_inst = jnp.maximum(best_inst, 0)
    Ainv_b = geom.inst_Ainv[safe_inst]
    off_b = geom.inst_offset[safe_inst]
    o_b = jnp.einsum("bij,bj->bi", Ainv_b[:, :, :3], o_w) + Ainv_b[:, :, 3]
    d_b = jnp.einsum("bij,bj->bi", Ainv_b[:, :, :3], d_w)
    o_b = o_b + d_b * off_b[:, None]
    _, t_x, u_x, v_x = isx.tri_intersect(tri, o_b, d_b,
                                         jnp.full(B, FLT_MAX, f32))
    t = jnp.where(is_tri, t_x, best_t)
    u = jnp.where(is_tri, u_x, f32(0.0))
    v = jnp.where(is_tri, v_x, f32(0.0))
    t = jnp.where(best_inst >= 0, t, FLT_MAX)
    return Hit(t=t, prim=best_prim, inst=best_inst, u=u, v=v)


def sphere_pass(geom, o_w, d_w, inst_order, best_t, best_prim, best_inst):
    """Exact quadratic test for every sphere instance, merged into the
    running best (sphere.c:20-50 via instance.c:45-60)."""
    for inst_id, kind, obj in inst_order:
        if kind != INST_SPHERE:
            continue
        Ainv = geom.inst_Ainv[inst_id]
        off = geom.inst_offset[inst_id]
        o_i = jnp.einsum("ij,bj->bi", Ainv[:, :3], o_w) + Ainv[:, 3]
        d_i = jnp.einsum("ij,bj->bi", Ainv[:, :3], d_w)
        o_i = o_i + d_i * off
        hit, t = isx.sphere_intersect(geom.sph_radius[obj], o_i, d_i, best_t)
        best_t = jnp.where(hit, t, best_t)
        best_prim = jnp.where(hit, -1, best_prim)
        best_inst = jnp.where(hit, i32(inst_id), best_inst)
    return best_t, best_prim, best_inst


# (The v1 flash_isect wrapper that used to live here was removed with
# ops/flash_isect.py itself — the Pallas TPU path is ops/flash2.py,
# reached through ops/hitrec.make_isect_fn(mode="flash").)
