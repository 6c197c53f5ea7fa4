"""Two-level BVH traversal as a single unified stack walk (XLA backend).

The reference traverses a top-level BVH over instances and recursively enters
per-mesh bottom-level BVHs (accelerators/bvh.c:354-496). Here both levels
live in one global node array and one ray walks a single stack whose entries
are (node, instance): TLAS entries carry instance -1 (world-space ray), BLAS
entries carry the instance whose inverse transform defines the traversal
space (instance.c:169-185). The closest hit is order-independent, so the
flattened interleaving returns the same hit the reference's nested loops do
(same slab test, same Möller-Trumbore, same per-instance ray offsets).

Written scalar-ray style and vmapped over the wavefront; the loop is a
lax.while_loop so all rays advance in lockstep with masking. A Pallas
VMEM-resident variant can be swapped in behind the same interface.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from craytpu.ops import intersect as isx
from craytpu.ops import vecmath as vm
from craytpu.scene.device import Geometry, Hit, INST_MESH, INST_SPHERE

f32 = jnp.float32
i32 = jnp.int32
FLT_MAX = isx.FLT_MAX


def _mat34_point(M, p):
    return M[:, :3] @ p + M[:, 3]


def _mat34_vec(M, v):
    return M[:, :3] @ v


def _space_ray(geom: Geometry, inst, o_w, d_w):
    """Ray in the traversal space of `inst` (-1 = world).

    For instances the origin is advanced by the per-object rayOffset along
    the (untransformed-length) object-space direction (instance.c:171-174).
    """
    safe = jnp.maximum(inst, 0)
    Ainv = geom.inst_Ainv[safe]
    off = geom.inst_offset[safe]
    o_t = _mat34_point(Ainv, o_w)
    d_t = _mat34_vec(Ainv, d_w)
    o_t = o_t + d_t * off
    is_obj = inst >= 0
    o = jnp.where(is_obj, o_t, o_w)
    d = jnp.where(is_obj, d_t, d_w)
    return o, d


def make_traverse_fn(tlas_end: int, stack_depth: int, max_leaf: int = 16):
    """Build the closest-hit function for a scene topology.

    tlas_end: number of TLAS nodes (TLAS occupies node ids [0, tlas_end));
    stack_depth: static stack allocation per ray.
    """

    def traverse(geom: Geometry, origin_w, direction_w) -> Hit:
        def blas_leaf(carry, node, inst, o, d):
            """Intersect up to max_leaf triangles of a BLAS leaf."""
            best_t, best_prim, best_inst, bu, bv, st_n, st_i, sp = carry
            row = geom.node_child[node]
            count = geom.node_count[node]

            def body(k, acc):
                bt, bp, bi, u0, v0 = acc
                valid = k < count
                pr = geom.prim_idx[jnp.where(valid, row + k, 0)]
                tri = geom.tri_packed[pr]
                hit, t, u, v = isx.tri_intersect(tri, o, d, bt)
                hit = hit & valid
                return (jnp.where(hit, t, bt), jnp.where(hit, pr, bp),
                        jnp.where(hit, inst, bi), jnp.where(hit, u, u0),
                        jnp.where(hit, v, v0))

            best_t, best_prim, best_inst, bu, bv = jax.lax.fori_loop(
                0, max_leaf, body, (best_t, best_prim, best_inst, bu, bv))
            return (best_t, best_prim, best_inst, bu, bv, st_n, st_i, sp)

        def tlas_leaf(carry, node, inst, o, d):
            """Process up to max_leaf instances of a TLAS leaf.

            Spheres are intersected immediately (instance.c:45-60); mesh
            instances push their BLAS root (with their instance id) to be
            walked in object space.
            """
            best_t, best_prim, best_inst, bu, bv, st_n, st_i, sp = carry
            row = geom.node_child[node]
            count = geom.node_count[node]

            def body(k, acc):
                bt, bp, bi, u0, v0, sn, si, p = acc
                valid = k < count
                ii = geom.prim_idx[jnp.where(valid, row + k, 0)]
                kind = geom.inst_kind[ii]
                obj = geom.inst_obj[ii]
                # sphere case
                o_s, d_s = _space_ray(geom, ii, o, d)
                sp_hit, sp_t = isx.sphere_intersect(
                    geom.sph_radius[jnp.where(kind == INST_SPHERE, obj, 0)],
                    o_s, d_s, bt)
                sp_hit = sp_hit & valid & (kind == INST_SPHERE)
                bt = jnp.where(sp_hit, sp_t, bt)
                bp = jnp.where(sp_hit, -1, bp)
                bi = jnp.where(sp_hit, ii, bi)
                # mesh case: push BLAS root
                root = geom.blas_root[jnp.where(kind == INST_MESH, obj, 0)]
                do_push = valid & (kind == INST_MESH) & (root >= 0)
                slot = jnp.minimum(p, stack_depth - 1)
                sn = sn.at[slot].set(jnp.where(do_push, root, sn[slot]))
                si = si.at[slot].set(jnp.where(do_push, ii, si[slot]))
                p = p + do_push.astype(i32)
                return (bt, bp, bi, u0, v0, sn, si, p)

            out = jax.lax.fori_loop(
                0, max_leaf, body,
                (best_t, best_prim, best_inst, bu, bv, st_n, st_i, sp))
            return out

        def step(state):
            (node, inst, sp, st_n, st_i,
             best_t, best_prim, best_inst, bu, bv, done) = state
            o, d = _space_ray(geom, inst, origin_w, direction_w)
            inv_d, octant = isx.ray_octant_invdir(d)
            sstart = -o * inv_d

            is_leaf = geom.node_count[node] > 0

            def leaf_fn(carry):
                is_tlas = node < tlas_end
                return jax.lax.cond(
                    is_tlas,
                    lambda c: tlas_leaf(c, node, inst, o, d),
                    lambda c: blas_leaf(c, node, inst, o, d),
                    carry)

            def inner_fn(carry):
                return carry

            carry = (best_t, best_prim, best_inst, bu, bv, st_n, st_i, sp)
            carry = jax.lax.cond(is_leaf, leaf_fn, inner_fn, carry)
            best_t, best_prim, best_inst, bu, bv, st_n, st_i, sp = carry

            # Inner: slab-test both children, descend near, push far
            # (bvh.c:391-439; child leaves are deferred one iteration).
            left = geom.node_child[node]
            right = left + 1
            hit_l, t_l = isx.node_intersect(geom.node_bounds[left], inv_d,
                                            sstart, octant, best_t)
            hit_r, t_r = isx.node_intersect(geom.node_bounds[right], inv_d,
                                            sstart, octant, best_t)
            hit_l = hit_l & ~is_leaf
            hit_r = hit_r & ~is_leaf

            both = hit_l & hit_r
            near = jnp.where(both & (t_l > t_r), right, left)
            far = jnp.where(both & (t_l > t_r), left, right)
            one = hit_l ^ hit_r
            only = jnp.where(hit_l, left, right)

            # push far child when both hit
            slot = jnp.minimum(sp, stack_depth - 1)
            st_n = st_n.at[slot].set(jnp.where(both, far, st_n[slot]))
            st_i = st_i.at[slot].set(jnp.where(both, inst, st_i[slot]))
            sp = sp + both.astype(i32)

            descend = (~is_leaf) & (both | one)
            next_from_descend = jnp.where(both, near, only)

            # otherwise pop (or finish)
            can_pop = sp > 0
            pop_slot = jnp.maximum(sp - 1, 0)
            popped_n = st_n[pop_slot]
            popped_i = st_i[pop_slot]
            sp = jnp.where(descend, sp, jnp.maximum(sp - 1, 0))

            node = jnp.where(descend, next_from_descend,
                             jnp.where(can_pop, popped_n, node))
            inst = jnp.where(descend, inst,
                             jnp.where(can_pop, popped_i, inst))
            done = done | (~descend & ~can_pop)
            return (node, inst, sp, st_n, st_i,
                    best_t, best_prim, best_inst, bu, bv, done)

        def cond(state):
            return ~state[-1]

        st_n = jnp.zeros(stack_depth, i32)
        st_i = jnp.full(stack_depth, -1, i32)
        init = (i32(0), i32(-1), i32(0), st_n, st_i,
                FLT_MAX, i32(-1), i32(-1), f32(0.0), f32(0.0),
                jnp.asarray(False))
        out = jax.lax.while_loop(cond, step, init)
        (_, _, _, _, _, best_t, best_prim, best_inst, bu, bv, _) = out
        return Hit(t=best_t, prim=best_prim, inst=best_inst, u=bu, v=bv)

    return traverse


def hit_info(geom: Geometry, shade, origin_w, direction_w, hit: Hit):
    """Compute world hit point / normal / uv / material for the winning hit.

    Mirrors the hit-record population done inline by the reference
    (instance.c:45-60 spheres, instance.c:169-185 + poly.c:37-48 meshes),
    deferred to once per bounce. Returns
    (is_hit, hit_point_w, normal_w, uv, mat_id).

    Sphere normals keep the reference's quirk of NOT renormalizing after the
    inverse-transpose transform (instance.c:56); mesh normals are normalized
    (instance.c:181).
    """
    is_hit = hit.inst >= 0
    safe_inst = jnp.maximum(hit.inst, 0)
    A = geom.inst_A[safe_inst]
    Ainv = geom.inst_Ainv[safe_inst]
    o_s, d_s = _space_ray(geom, safe_inst, origin_w, direction_w)
    p_obj = o_s + d_s * hit.t

    is_sphere = hit.prim < 0
    # --- sphere path ---
    n_obj_sphere = vm.vnormalize(p_obj)
    # getTexMapSphere (instance.c:33-43) from the OBJECT-space normal
    phi = jnp.arctan2(n_obj_sphere[2], n_obj_sphere[0])
    theta = jnp.arcsin(jnp.clip(n_obj_sphere[1], -1.0, 1.0))
    sph_v = (theta + vm.PI / f32(2.0)) / vm.PI
    sph_u = f32(1.0) - (phi + vm.PI) / (vm.PI * f32(2.0))
    sph_u = vm.wrap_min_max(sph_u, f32(0.0), f32(1.0))
    sph_v = vm.wrap_min_max(sph_v, f32(0.0), f32(1.0))
    sph_mat = shade.sph_mat[jnp.maximum(geom.inst_obj[safe_inst], 0)]

    # --- mesh path ---
    pr = jnp.maximum(hit.prim, 0)
    u, v = hit.u, hit.v
    w = f32(1.0) - u - v
    nidx = shade.tri_nidx[pr]
    n_smooth = (shade.normals[nidx[1]] * u + shade.normals[nidx[2]] * v
                + shade.normals[nidx[0]] * w)
    n_flat = geom.tri_packed[pr, 9:12]
    n_obj_mesh = jnp.where(shade.tri_has_n[pr], n_smooth, n_flat)
    uvidx = shade.tri_uvidx[pr]
    uv_mesh = (shade.uvs[uvidx[1]] * u + shade.uvs[uvidx[2]] * v
               + shade.uvs[uvidx[0]] * w)
    uv_mesh = jnp.where(shade.tri_uv_ok[pr], uv_mesh,
                        jnp.array([-1.0, -1.0], f32))
    mesh_mat = shade.tri_mat[pr]

    n_obj = jnp.where(is_sphere, n_obj_sphere, n_obj_mesh)
    # world normal: transformVectorWithTranspose(Ainv) == Ainv^T (3x3 part)
    n_w = Ainv[:, :3].T @ n_obj
    n_w = jnp.where(is_sphere, n_w, vm.vnormalize(n_w))

    p_w = _mat34_point(A, p_obj)
    uv = jnp.where(is_sphere, jnp.stack([sph_u, sph_v]), uv_mesh)
    mat_id = jnp.where(is_sphere, sph_mat, mesh_mat)
    return is_hit, p_w, n_w, uv, jnp.where(is_hit, mat_id, 0)
