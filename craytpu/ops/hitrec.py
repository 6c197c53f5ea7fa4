"""Hit-record resolution: winner ids -> shading-ready hit data.

The TPU counterpart of the reference's hit-record population
(instance.c:45-60 spheres, instance.c:169-185 + poly.c:37-48 meshes),
fused into as few WIDE row gathers as possible: per-lane narrow gathers
run ~10x below row-gather bandwidth on TPU, so v1's chain (tri_packed x2,
tri_shade, tri_mf, inst_A, inst_Ainv, sph_mat — 7 gathers across
exact_recompute + hit_info, ~35 ms/bounce at 262k rays) is collapsed to
TWO gathers of denormalized rows:

  tri_wide  (P, 32) f32: [v0 e1 e2 n | n0 n1 n2 | uv0 uv1 uv2 | mat flags]
  inst_wide (I, 28) f32: [A(12) | Ainv(12) | rayOffset | sphere_mat]

Exact (t, u, v) are recomputed here with the classic Möller-Trumbore
formulation on the single winner (same ops, same order as the SIMT path),
so shading consumes bit-identical hit data to the reference-exact
traversal whenever the same primitive wins. Sphere t is likewise
recomputed on the winner with the reference-rounded quadratic
(ops/intersect.py sphere_intersect) — the kernel's in-kernel t is
search precision only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from craytpu.ops import intersect as isx
from craytpu.ops import vecmath as vm

f32 = jnp.float32
i32 = jnp.int32
FLT_MAX = isx.FLT_MAX


def build_wide_rows(tri_packed, tri_shade, tri_mf, inst_A, inst_Ainv,
                    inst_offset, inst_kind, inst_obj, sph_mat,
                    sph_radius=None):
    """Host-side construction of the denormalized rows (numpy)."""
    P = tri_packed.shape[0]
    tw = np.zeros((P, 32), np.float32)
    tw[:, 0:12] = tri_packed
    tw[:, 12:21] = tri_shade[:, 0:9]       # n0, n1, n2
    tw[:, 21:27] = tri_shade[:, 9:15]      # uv0, uv1, uv2
    tw[:, 27] = tri_mf[:, 0].astype(np.float32)   # mat (exact to 2^24)
    tw[:, 28] = tri_mf[:, 1].astype(np.float32)   # flags

    Imax = inst_A.shape[0]
    iw = np.zeros((Imax, 28), np.float32)
    iw[:, 0:12] = inst_A.reshape(Imax, -1)
    iw[:, 12:24] = inst_Ainv.reshape(Imax, -1)
    iw[:, 24] = inst_offset
    from craytpu.scene.device import INST_SPHERE
    for i in range(Imax):
        if inst_kind[i] == INST_SPHERE:
            iw[i, 25] = float(sph_mat[inst_obj[i]])
            if sph_radius is not None:
                iw[i, 26] = float(sph_radius[inst_obj[i]])
    return tw, iw


def make_hitrec_fn(tri_wide, inst_wide, sphere_uv: bool, diff: bool):
    """hitrec(geom, o_w, d_w, t_k, prim, inst) ->
    (is_hit, p_w, n_w, uv, mat_id, t, u, v).

    diff=True sources the triangle row from geom.tri_packed (an extra
    gather) so vertex gradients flow through the exact recompute; the
    static tri_wide copy is used otherwise.
    """
    tri_wide = jnp.asarray(tri_wide)
    inst_wide = jnp.asarray(inst_wide)

    n_inst = int(inst_wide.shape[0])

    def hitrec(geom, o_w, d_w, t_k, prim, inst):
        B = o_w.shape[0]
        is_hit = inst >= 0
        safe_inst = jnp.maximum(inst, 0)
        if n_inst <= 64:
            # one-hot matmul instead of a per-lane gather: the instance
            # table is tiny and narrow gathers run far below stream
            # bandwidth on TPU
            oh = (safe_inst[:, None]
                  == jnp.arange(n_inst, dtype=inst.dtype)[None, :]
                  ).astype(f32)
            iw = oh @ inst_wide                        # (B, 28)
        else:
            iw = inst_wide[safe_inst]                  # (B, 28)
        A = iw[:, 0:12].reshape(-1, 3, 4)
        Ainv = iw[:, 12:24].reshape(-1, 3, 4)
        off = iw[:, 24]
        # object-space ray — identical ops to traverse.space_ray
        # (explicit chains, backend-bit-stable: vm.mat34_point)
        o_s = vm.mat34_point(Ainv, o_w)
        d_s = vm.mat33_vec(Ainv, d_w)
        o_s = vm.fma_raw(d_s, off[..., None], o_s)  # fma, instance.c:174

        is_sphere = prim < 0
        pr = jnp.maximum(prim, 0)
        tw = tri_wide[pr]                               # (B, 32)
        tri_row = geom.tri_packed[pr] if diff else tw[:, 0:12]
        # exact winner recompute (bit-identical to the SIMT tri test)
        _, t_x, u_x, v_x = isx.tri_intersect(
            tri_row, o_s, d_s, jnp.full(B, FLT_MAX, f32))
        is_tri = is_hit & ~is_sphere
        # sphere winners: recompute t with the reference-rounded
        # quadratic too (the Pallas kernel's in-kernel t is search
        # precision — Mosaic's contraction isn't pinned like
        # isx.sphere_intersect's det_fma chain is)
        _, t_s = isx.sphere_intersect(iw[:, 26], o_s, d_s,
                                      jnp.full(B, FLT_MAX, f32))
        t = jnp.where(is_tri, t_x, jnp.where(is_sphere & is_hit,
                                             t_s, t_k))
        u = jnp.where(is_tri, u_x, f32(0.0))
        v = jnp.where(is_tri, v_x, f32(0.0))
        t = jnp.where(is_hit, t, FLT_MAX)

        p_obj = vm.along_ray(o_s, d_s, t)  # alongRay fma rounding

        # --- sphere path (instance.c:45-60) ---
        sph_len = jnp.where(is_sphere, vm.vlength(p_obj), f32(1.0))
        n_obj_sphere = vm.exact_div(
            p_obj, jnp.where(sph_len == 0, f32(1.0), sph_len)[..., None])
        if sphere_uv:
            # getTexMapSphere (instance.c:33-43), object-space normal
            phi = jnp.arctan2(n_obj_sphere[..., 2], n_obj_sphere[..., 0])
            theta = jnp.arcsin(jnp.clip(n_obj_sphere[..., 1], -1.0, 1.0))
            sph_v = (theta + vm.PI / f32(2.0)) / vm.PI
            sph_u = f32(1.0) - (phi + vm.PI) / (vm.PI * f32(2.0))
            sph_u = vm.wrap_min_max(sph_u, f32(0.0), f32(1.0))
            sph_v = vm.wrap_min_max(sph_v, f32(0.0), f32(1.0))
        else:
            # no sphere material in this scene reads uv — skip the trig
            sph_u = jnp.zeros(B, f32)
            sph_v = jnp.zeros(B, f32)
        sph_mat = iw[:, 25].astype(i32)

        # --- mesh path ---
        w = f32(1.0) - u - v
        # poly.c:42-46 contraction: fma(n0, w, fma(n1, u, n2*v))
        n_smooth = vm.fma_raw(
            tw[:, 12:15], w[..., None],
            vm.fma_raw(tw[:, 15:18], u[..., None],
                       tw[:, 18:21] * v[..., None]))
        n_flat = tri_row[:, 9:12]
        flags = tw[:, 28].astype(i32)
        has_n = (flags & 1) == 1
        n_obj_mesh = jnp.where(has_n[..., None], n_smooth, n_flat)
        uv_mesh = vm.fma_raw(
            tw[:, 21:23], w[..., None],
            vm.fma_raw(tw[:, 23:25], u[..., None],
                       tw[:, 25:27] * v[..., None]))
        uv_ok = (flags & 2) == 2
        uv_mesh = jnp.where(uv_ok[..., None], uv_mesh,
                            jnp.array([-1.0, -1.0], f32))
        mesh_mat = tw[:, 27].astype(i32)

        n_obj = jnp.where(is_sphere[..., None], n_obj_sphere, n_obj_mesh)
        # world normal: transformVectorWithTranspose(Ainv) == Ainv^T
        n_w = vm.mat33_vec_T(Ainv, n_obj)
        n_len = vm.vlength(n_w)
        n_w = jnp.where(is_sphere[..., None], n_w,
                        vm.exact_div(n_w, jnp.where(n_len == 0, f32(1.0),
                                                    n_len)[..., None]))

        p_w = vm.mat34_point(A, p_obj)
        uv = jnp.where(is_sphere[..., None],
                       jnp.stack([sph_u, sph_v], axis=-1), uv_mesh)
        mat_id = jnp.where(is_sphere, sph_mat, mesh_mat)
        return (is_hit, p_w, n_w, uv, jnp.where(is_hit, mat_id, 0),
                t, u, v)

    return hitrec


def make_isect_fn(cscene, mode: str, diff: bool = False):
    """Unified closest-hit + hit-record resolve:
    isect(geom, o_w, d_w, alive) -> (is_hit, p_w, n_w, uv, mat_id, t).

    mode: "flash" (Pallas flash2 kernel, TPU), "dense" (pure-XLA MXU
    search), "simt" (reference-exact batched stack walk, CPU/parity).
    """
    dm = cscene.dense_meta

    if mode == "flash" and dm is not None and dm.get("mesh_plan") is not None:
        import os
        import jax as _jax
        from craytpu.ops import flash2 as fx2
        flash = fx2.build_flash2_fn(dm)

        pack = fx2.pack_rays_nat if fx2._natrays() else fx2.pack_rays_T

        # the Pallas hit-record kernel collapses the winner resolve into
        # one VMEM pass (17.8 -> ~1 ms at 1M lanes); the XLA hitrec
        # stays as the differentiable/reference twin (bit-identical —
        # tests/test_hitrec_kernel.py)
        use_kernel = (not diff
                      and _jax.default_backend() != "cpu"
                      and os.environ.get("CRAYTPU_HITREC",
                                         "kernel") == "kernel")
        if use_kernel:
            from craytpu.ops import hitrec_kernel as hk
            kernel = hk.build_hitrec_kernel(dm["sphere_uv"])
            tri_wide = jnp.asarray(dm["tri_wide"])
            inst_wide_T = jnp.asarray(dm["inst_wide"]).T   # (28, I)
            n_inst = int(inst_wide_T.shape[1])
            sphere_uv = dm["sphere_uv"]
            from craytpu.ops import vecmath as vm

            def isect(geom, o_w, d_w, alive):
                B = o_w.shape[0]
                rays_T = pack(o_w, d_w)
                limit = jnp.where(alive, f32(FLT_MAX), f32(0.0))
                t, p, ii = flash(rays_T,
                                 fx2.pack_limit(limit, rays_T.shape[0]))
                t_k = t.reshape(-1)[:B]
                prim = p.reshape(-1)[:B]
                inst = ii.reshape(-1)[:B]

                is_hit = inst >= 0
                safe_inst = jnp.maximum(inst, 0)
                pr = jnp.maximum(prim, 0)
                tw = tri_wide[pr]                          # (B, 32)
                ohT = (jnp.arange(n_inst, dtype=inst.dtype)[:, None]
                       == safe_inst[None, :]).astype(f32)  # (I, B)
                iwT = inst_wide_T @ ohT                    # (28, B)
                pad = (-B) % hk.BLK
                def padw(x, axis=1):
                    if pad == 0:
                        return x
                    widths = [(0, 0)] * x.ndim
                    widths[axis] = (0, pad)
                    return jnp.pad(x, widths)
                out = kernel(
                    padw(tw.T), padw(iwT), padw(o_w.T), padw(d_w.T),
                    padw(t_k[None]), padw((prim < 0).astype(i32)[None]),
                    padw(is_hit.astype(i32)[None]))[:, :B]
                t_out = out[0]
                p_w = out[3:6].T
                n_w = out[6:9].T
                uv_mesh = out[9:11].T
                if sphere_uv:
                    # getTexMapSphere on the exported object-space normal
                    nsx, nsy, nsz = out[11], out[12], out[13]
                    phi = jnp.arctan2(nsz, nsx)
                    theta = jnp.arcsin(jnp.clip(nsy, -1.0, 1.0))
                    sph_v = (theta + vm.PI / f32(2.0)) / vm.PI
                    sph_u = f32(1.0) - (phi + vm.PI) / (vm.PI * f32(2.0))
                    sph_u = vm.wrap_min_max(sph_u, f32(0.0), f32(1.0))
                    sph_v = vm.wrap_min_max(sph_v, f32(0.0), f32(1.0))
                else:
                    sph_u = jnp.zeros(B, f32)
                    sph_v = jnp.zeros(B, f32)
                is_sphere = prim < 0
                uv = jnp.where(is_sphere[..., None],
                               jnp.stack([sph_u, sph_v], axis=-1),
                               uv_mesh)
                mat_id = jnp.where(is_sphere,
                                   iwT[25].astype(i32),
                                   tw[:, 27].astype(i32))
                mat_id = jnp.where(is_hit, mat_id, 0)
                return is_hit, p_w, n_w, uv, mat_id, t_out
            return isect

        hitrec = make_hitrec_fn(dm["tri_wide"], dm["inst_wide"],
                                dm["sphere_uv"], diff)

        def isect(geom, o_w, d_w, alive):
            B = o_w.shape[0]
            rays_T = pack(o_w, d_w)
            limit = jnp.where(alive, f32(FLT_MAX), f32(0.0))
            t, p, ii = flash(rays_T, fx2.pack_limit(limit, rays_T.shape[0]))
            t_k = t.reshape(-1)[:B]
            prim = p.reshape(-1)[:B]
            inst = ii.reshape(-1)[:B]
            out = hitrec(geom, o_w, d_w, t_k, prim, inst)
            return out[:6]
        return isect

    if mode == "dense" and dm is not None:
        from craytpu.ops import dense_isect as dx
        trav = dx.make_dense_traverse_fn(dm)
    else:
        from craytpu.ops import traverse as trv
        trav = cscene_traverse(cscene)

    from craytpu.ops import traverse as trv

    def isect(geom, o_w, d_w, alive):
        hit = trav(geom, o_w, d_w)
        is_hit, p_w, n_w, uv, mat_id = trv.hit_info(geom, cscene.shade,
                                                    o_w, d_w, hit)
        return is_hit & alive, p_w, n_w, uv, mat_id, hit.t
    return isect


def cscene_traverse(cscene):
    from craytpu.ops import traverse as trv
    return trv.make_traverse_fn(cscene.tlas_end, cscene.stack_depth,
                                cscene.max_leaf_tris, cscene.max_leaf_inst)
