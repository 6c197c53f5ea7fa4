"""Two-level BVH traversal as a batched wavefront stack walk (XLA backend).

The reference traverses a top-level BVH over instances and recursively enters
per-mesh bottom-level BVHs (accelerators/bvh.c:354-496). Here both levels
live in one global node array and every ray in the wavefront walks a single
stack whose entries are (node, instance): TLAS entries carry instance -1
(world-space ray), BLAS entries carry the instance whose inverse transform
defines the traversal space (instance.c:169-185). The closest hit is
order-independent, so the flattened interleaving returns the same hit the
reference's nested loops do (same slab test, same Möller-Trumbore, same
per-instance ray offsets).

Written natively batched: all state is (B, ...) arrays and the
lax.while_loop condition is the SCALAR "any lane still walking", so XLA
never has to mask loop-invariant scene constants per lane (a vmapped
per-lane while would broadcast the triangle buffer to (B, P, 12)).
Terminated lanes idle masked until the slowest lane finishes — the SIMT
model. A Pallas VMEM-resident variant can swap in behind this interface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from craytpu.ops import intersect as isx
from craytpu.ops import vecmath as vm
from craytpu.scene.device import Geometry, Hit, INST_MESH, INST_SPHERE

f32 = jnp.float32
i32 = jnp.int32
FLT_MAX = isx.FLT_MAX


def _mat34_point(M, p):
    """(..., 3, 4) x (..., 3) affine point transform (explicit chains —
    backend-bit-stable, see vm.mat34_point)."""
    return vm.mat34_point(M, p)


def _mat34_vec(M, v):
    return vm.mat33_vec(M, v)


def space_ray(geom: Geometry, inst, o_w, d_w):
    """Ray in the traversal space of `inst` (-1 = world), batched.

    For instances the origin is advanced by the per-object rayOffset along
    the (untransformed-length) object-space direction (instance.c:171-174).
    """
    safe = jnp.maximum(inst, 0)
    Ainv = geom.inst_Ainv[safe]
    off = geom.inst_offset[safe]
    o_t = _mat34_point(Ainv, o_w)
    d_t = _mat34_vec(Ainv, d_w)
    o_t = vm.fma_raw(d_t, off[..., None], o_t)  # fma, instance.c:174
    is_obj = (inst >= 0)[..., None]
    o = jnp.where(is_obj, o_t, o_w)
    d = jnp.where(is_obj, d_t, d_w)
    return o, d


def make_traverse_fn(tlas_end: int, stack_depth: int,
                     max_leaf_tris: int = 16, max_leaf_inst: int = 16):
    """Build the batched closest-hit function for a scene topology.

    tlas_end: number of TLAS nodes (node ids [0, tlas_end) are TLAS);
    stack_depth: static per-ray stack allocation;
    max_leaf_*: static caps on prims per leaf (from the built BVHs).
    """

    def traverse(geom: Geometry, origin_w, direction_w) -> Hit:
        B = origin_w.shape[0]
        lanes = jnp.arange(B)

        def step(state):
            (node, inst, sp, st_n, st_i,
             best_t, best_prim, best_inst, bu, bv, done) = state
            o, d = space_ray(geom, inst, origin_w, direction_w)
            inv_d, octant = isx.ray_octant_invdir(d)
            sstart = -o * inv_d

            count = geom.node_count[node]
            row = geom.node_child[node]
            is_leaf = (count > 0) & ~done
            is_blas_leaf = is_leaf & (node >= tlas_end)
            is_tlas_leaf = is_leaf & (node < tlas_end)

            # ---- BLAS leaf: up to max_leaf_tris triangle tests ----
            def tri_body(k, acc):
                bt, bp, bi, u0, v0 = acc
                valid = is_blas_leaf & (k < count)
                pr = geom.prim_idx[jnp.where(valid, row + k, 0)]
                tri = geom.tri_packed[pr]
                hit, t, u, v = isx.tri_intersect(tri, o, d, bt)
                hit = hit & valid
                return (jnp.where(hit, t, bt), jnp.where(hit, pr, bp),
                        jnp.where(hit, inst, bi), jnp.where(hit, u, u0),
                        jnp.where(hit, v, v0))

            best_t, best_prim, best_inst, bu, bv = jax.lax.fori_loop(
                0, max_leaf_tris, tri_body,
                (best_t, best_prim, best_inst, bu, bv))

            # ---- TLAS leaf: spheres intersected now, mesh roots pushed ----
            def inst_body(k, acc):
                bt, bp, bi, sn, si, p = acc
                valid = is_tlas_leaf & (k < count)
                ii = geom.prim_idx[jnp.where(valid, row + k, 0)]
                kind = geom.inst_kind[ii]
                obj = geom.inst_obj[ii]
                o_s, d_s = space_ray(geom, ii, origin_w, direction_w)
                sp_hit, sp_t = isx.sphere_intersect(
                    geom.sph_radius[jnp.where(kind == INST_SPHERE, obj, 0)],
                    o_s, d_s, bt)
                sp_hit = sp_hit & valid & (kind == INST_SPHERE)
                bt = jnp.where(sp_hit, sp_t, bt)
                bp = jnp.where(sp_hit, -1, bp)
                bi = jnp.where(sp_hit, ii, bi)
                root = geom.blas_root[jnp.where(kind == INST_MESH, obj, 0)]
                # overflow-safe: drop the push if the stack is full (a full
                # stack would otherwise overwrite the top and cycle forever)
                push = (valid & (kind == INST_MESH) & (root >= 0)
                        & (p < stack_depth))
                slot = jnp.minimum(p, stack_depth - 1)
                sn = sn.at[lanes, slot].set(
                    jnp.where(push, root, sn[lanes, slot]))
                si = si.at[lanes, slot].set(
                    jnp.where(push, ii, si[lanes, slot]))
                p = p + push.astype(i32)
                return (bt, bp, bi, sn, si, p)

            best_t, best_prim, best_inst, st_n, st_i, sp = jax.lax.fori_loop(
                0, max_leaf_inst, inst_body,
                (best_t, best_prim, best_inst, st_n, st_i, sp))

            # ---- inner node: slab-test children, descend near, push far
            # (bvh.c:391-439; child leaves are deferred one iteration) ----
            is_inner = ~is_leaf & ~done
            left = jnp.minimum(row, geom.node_bounds.shape[0] - 1)
            right = jnp.minimum(left + 1, geom.node_bounds.shape[0] - 1)
            hit_l, t_l = isx.node_intersect(geom.node_bounds[left], inv_d,
                                            sstart, octant, best_t)
            hit_r, t_r = isx.node_intersect(geom.node_bounds[right], inv_d,
                                            sstart, octant, best_t)
            hit_l = hit_l & is_inner
            hit_r = hit_r & is_inner

            both = hit_l & hit_r
            swap = both & (t_l > t_r)
            near = jnp.where(swap, right, left)
            far = jnp.where(swap, left, right)
            only = jnp.where(hit_l, left, right)

            both = both & (sp < stack_depth)  # overflow-safe push
            slot = jnp.minimum(sp, stack_depth - 1)
            st_n = st_n.at[lanes, slot].set(
                jnp.where(both, far, st_n[lanes, slot]))
            st_i = st_i.at[lanes, slot].set(
                jnp.where(both, inst, st_i[lanes, slot]))
            sp = sp + both.astype(i32)

            descend = both | (hit_l ^ hit_r)
            next_node = jnp.where(both, near, only)

            can_pop = sp > 0
            pop_slot = jnp.maximum(sp - 1, 0)
            popped_n = st_n[lanes, pop_slot]
            popped_i = st_i[lanes, pop_slot]
            sp = jnp.where(descend, sp, jnp.maximum(sp - 1, 0))

            node = jnp.where(descend, next_node,
                             jnp.where(can_pop, popped_n, node))
            inst = jnp.where(descend, inst,
                             jnp.where(can_pop, popped_i, inst))
            done = done | (~descend & ~can_pop)
            return (node, inst, sp, st_n, st_i,
                    best_t, best_prim, best_inst, bu, bv, done)

        def cond(state):
            return ~jnp.all(state[-1])  # scalar: any lane still walking

        init = (jnp.zeros(B, i32), jnp.full(B, -1, i32), jnp.zeros(B, i32),
                jnp.zeros((B, stack_depth), i32),
                jnp.full((B, stack_depth), -1, i32),
                jnp.full(B, FLT_MAX, f32), jnp.full(B, -1, i32),
                jnp.full(B, -1, i32), jnp.zeros(B, f32), jnp.zeros(B, f32),
                jnp.zeros(B, bool))
        out = jax.lax.while_loop(cond, step, init)
        (_, _, _, _, _, best_t, best_prim, best_inst, bu, bv, _) = out
        return Hit(t=best_t, prim=best_prim, inst=best_inst, u=bu, v=bv)

    return traverse


def hit_info(geom: Geometry, shade, origin_w, direction_w, hit: Hit):
    """Compute world hit point / normal / uv / material for winning hits.

    Batched. Mirrors the hit-record population done inline by the reference
    (instance.c:45-60 spheres, instance.c:169-185 + poly.c:37-48 meshes),
    deferred to once per bounce for the single best hit. Returns
    (is_hit, hit_point_w, normal_w, uv, mat_id).

    Sphere normals keep the reference's quirk of NOT renormalizing after the
    inverse-transpose transform (instance.c:56); mesh normals are normalized
    (instance.c:181).
    """
    is_hit = hit.inst >= 0
    safe_inst = jnp.maximum(hit.inst, 0)
    A = geom.inst_A[safe_inst]
    Ainv = geom.inst_Ainv[safe_inst]
    o_s, d_s = space_ray(geom, safe_inst, origin_w, direction_w)
    p_obj = vm.along_ray(o_s, d_s, hit.t)  # alongRay fma rounding

    is_sphere = hit.prim < 0
    # --- sphere path ---
    sph_len = jnp.where(is_sphere, vm.vlength(p_obj), f32(1.0))
    n_obj_sphere = vm.exact_div(p_obj, jnp.where(sph_len == 0, f32(1.0),
                                                 sph_len)[..., None])
    # getTexMapSphere (instance.c:33-43) from the OBJECT-space normal
    phi = jnp.arctan2(n_obj_sphere[..., 2], n_obj_sphere[..., 0])
    theta = jnp.arcsin(jnp.clip(n_obj_sphere[..., 1], -1.0, 1.0))
    sph_v = (theta + vm.PI / f32(2.0)) / vm.PI
    sph_u = f32(1.0) - (phi + vm.PI) / (vm.PI * f32(2.0))
    sph_u = vm.wrap_min_max(sph_u, f32(0.0), f32(1.0))
    sph_v = vm.wrap_min_max(sph_v, f32(0.0), f32(1.0))
    sph_mat = shade.sph_mat[jnp.maximum(geom.inst_obj[safe_inst], 0)]

    # --- mesh path (two wide gathers per hit: denormalized vertex data) ---
    pr = jnp.maximum(hit.prim, 0)
    u, v = hit.u, hit.v
    w = f32(1.0) - u - v
    ts = shade.tri_shade[pr]                        # (B, 16)
    mf = shade.tri_mf[pr]                           # (B, 2)
    # poly.c:42-46 addCoords(addCoords(u*n1, v*n2), w*n0) contracts to
    # fma(n0, w, fma(n1, u, n2*v)) per component
    n_smooth = vm.fma_raw(
        ts[..., 0:3], w[..., None],
        vm.fma_raw(ts[..., 3:6], u[..., None],
                   ts[..., 6:9] * v[..., None]))
    n_flat = geom.tri_packed[pr][..., 9:12]
    has_n = (mf[..., 1] & 1) == 1
    n_obj_mesh = jnp.where(has_n[..., None], n_smooth, n_flat)
    uv_mesh = vm.fma_raw(
        ts[..., 9:11], w[..., None],
        vm.fma_raw(ts[..., 11:13], u[..., None],
                   ts[..., 13:15] * v[..., None]))
    uv_ok = (mf[..., 1] & 2) == 2
    uv_mesh = jnp.where(uv_ok[..., None], uv_mesh,
                        jnp.array([-1.0, -1.0], f32))
    mesh_mat = mf[..., 0]

    n_obj = jnp.where(is_sphere[..., None], n_obj_sphere, n_obj_mesh)
    # world normal: transformVectorWithTranspose(Ainv) == Ainv^T (3x3 part)
    n_w = vm.mat33_vec_T(Ainv, n_obj)
    n_len = vm.vlength(n_w)
    n_w = jnp.where(is_sphere[..., None], n_w,
                    vm.exact_div(n_w, jnp.where(n_len == 0, f32(1.0),
                                                n_len)[..., None]))

    p_w = _mat34_point(A, p_obj)
    uv = jnp.where(is_sphere[..., None],
                   jnp.stack([sph_u, sph_v], axis=-1), uv_mesh)
    mat_id = jnp.where(is_sphere, sph_mat, mesh_mat)
    return is_hit, p_w, n_w, uv, jnp.where(is_hit, mat_id, 0)
