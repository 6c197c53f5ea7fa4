"""Flash-intersect: the Pallas TPU closest-hit kernel.

Fuses the dense MXU Möller-Trumbore search (ops/dense_isect.py — see the
phi(ray) @ W(tri) derivation there) with its min-reduction epilogue in
VMEM, flash-attention style. The pure-XLA dense path materializes every
(rays x 4*tris) product slab through HBM (~2 GB per triangle block at
wavefront batch size); this kernel keeps the slab in VMEM and writes only
(best_t, best_prim, best_inst) per ray, so HBM traffic per bounce drops
from terabytes to megabytes.

Layout: RAYS LIVE ON THE LANE DIM (last axis), triangles on sublanes. The
matmul is W_blk (4*TB, 16) @ phi^T (16, RB) -> (4*TB, RB), reductions run
along sublanes to (1, RB) rows, and every per-ray quantity is a (1, RB)
row vector — no transposes anywhere in the kernel.

Per ray block of 256 rays (one grid step), for each mesh instance (static,
scene-specialized python loop):
  - transform the ray block into instance space (Ainv + rayOffset,
    instance.c:169-174) using instance scalars from SMEM
  - slab-test the block against the instance's root bbox; skip the whole
    instance when no ray can beat its current best (BVH-root culling, in
    the reference's own cross-instance t-measure)
  - fori over the instance's 512-triangle blocks:
      slab-test the block bbox (triangle packing follows BVH order, so
      blocks are spatially coherent); skip dead blocks; else MXU matmul +
      u/v/t validity epilogue + running argmin.
Sphere instances are intersected outside (they are a handful) and merged
by the caller; the exact winner (t,u,v) recompute also happens outside —
this kernel only has to get the winning ids right.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

f32 = jnp.float32
i32 = jnp.int32
FLT_MAX = 3.4028235e38  # python float: jnp scalars would be captured consts

# Search-matmul precision: the winner ids are re-validated by an exact f32
# recompute outside the kernel, so lower precision here only risks picking
# a different triangle in near-tie/grazing cases. highest = 6-pass bf16
# (f32-equivalent), high = hand-rolled bf16x3 (Mosaic has no HIGH),
# default = 1-pass bf16.
MM_MODE = os.environ.get("CRAYTPU_MXU_PRECISION", "high")


def _search_dot(Wb, phiT):
    if MM_MODE == "highest":
        return jnp.dot(Wb, phiT, preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)
    # explicit DEFAULT precision: the global
    # jax_default_matmul_precision=highest (set for geometry einsums,
    # jaxsetup.py) would otherwise tag these bf16 dots fp32 and Mosaic
    # rejects fp32-precision-with-bf16-operands ("Bad lhs type")
    DP = jax.lax.Precision.DEFAULT
    if MM_MODE == "default":
        return jnp.dot(Wb.astype(jnp.bfloat16), phiT.astype(jnp.bfloat16),
                       preferred_element_type=f32, precision=DP)
    # bf16x3: q = W_hi@p_hi + W_lo@p_hi + W_hi@p_lo
    W_hi = Wb.astype(jnp.bfloat16)
    W_lo = (Wb - W_hi.astype(f32)).astype(jnp.bfloat16)
    p_hi = phiT.astype(jnp.bfloat16)
    p_lo = (phiT - p_hi.astype(f32)).astype(jnp.bfloat16)
    q = jnp.dot(W_hi, p_hi, preferred_element_type=f32, precision=DP)
    q = q + jnp.dot(W_lo, p_hi, preferred_element_type=f32, precision=DP)
    q = q + jnp.dot(W_hi, p_lo, preferred_element_type=f32, precision=DP)
    return q

RAY_BLOCK = 256
TRI_BLOCK = 256
PHI_DIM = 16  # 10 used: [d, o, d x o, 1]; padded for MXU alignment


def pack_rays_T(o, d):
    """(B,3),(B,3) -> (NRB, 8, RAY_BLOCK) transposed padded ray blocks."""
    B = o.shape[0]
    nrb = max((B + RAY_BLOCK - 1) // RAY_BLOCK, 1)
    pad = nrb * RAY_BLOCK - B
    rays = jnp.concatenate([o, d, jnp.zeros((B, 2), f32)], axis=1)
    if pad:
        rays = jnp.concatenate([rays, jnp.zeros((pad, 8), f32)], axis=0)
    return rays.reshape(nrb, RAY_BLOCK, 8).transpose(0, 2, 1)


def _row(x):
    return x.reshape(1, RAY_BLOCK)


def _kernel(rays_ref, W_ref, bb_ref, inst_ref, t_ref, prim_ref, iid_ref,
            *, plan):
    """plan: static tuple of (inst_id, block_start, block_count, prim_base).

    rays_ref: (1, 8, RB) VMEM; W_ref: (NB, 4*TB, PHI_DIM) VMEM;
    bb_ref: (NB, 8) SMEM tri-block mesh-space bboxes
    [minx,maxx,miny,maxy,minz,maxz,0,0];
    inst_ref: (I, 24) SMEM: Ainv rows (12), rayOffset, root bbox (6), pad.
    Outputs: (1, RB) rows.
    """
    o_x = rays_ref[0, 0:1, :]
    o_y = rays_ref[0, 1:2, :]
    o_z = rays_ref[0, 2:3, :]
    d_x = rays_ref[0, 3:4, :]
    d_y = rays_ref[0, 4:5, :]
    d_z = rays_ref[0, 5:6, :]

    best_t = jnp.full((1, RAY_BLOCK), FLT_MAX, f32)
    best_p = jnp.full((1, RAY_BLOCK), -1, i32)
    best_i = jnp.full((1, RAY_BLOCK), -1, i32)

    lane0 = jax.lax.broadcasted_iota(i32, (TRI_BLOCK, RAY_BLOCK), 0)

    def slab_rows(bb, oi, di, limit):
        """Any ray whose bbox entry can still beat its best. bb = 6 scalars
        (min,max per axis); oi/di = 3 (1,RB) rows each."""
        ok_near = jnp.full((1, RAY_BLOCK), -FLT_MAX, f32)
        ok_far = jnp.full((1, RAY_BLOCK), FLT_MAX, f32)
        for ax in range(3):
            # zero direction components (exact for axis-aligned secondary
            # rays) would make 0 * inf = NaN and NaN-propagating min/max
            # would cull live blocks — rays escaping through walls
            da = di[ax]
            da = jnp.where(da == f32(0.0), f32(1e-30), da)
            inv = f32(1.0) / da
            t0 = (bb[2 * ax] - oi[ax]) * inv
            t1 = (bb[2 * ax + 1] - oi[ax]) * inv
            ok_near = jnp.maximum(ok_near, jnp.minimum(t0, t1))
            ok_far = jnp.minimum(ok_far, jnp.maximum(t0, t1))
        return (ok_near <= ok_far) & (ok_far >= f32(0.0)) & (ok_near < limit)

    for inst_id, b0, bc, prim_base in plan:
        a = [inst_ref[inst_id, c] for c in range(13)]
        # instance-space ray
        oi_x = a[0] * o_x + a[1] * o_y + a[2] * o_z + a[3]
        oi_y = a[4] * o_x + a[5] * o_y + a[6] * o_z + a[7]
        oi_z = a[8] * o_x + a[9] * o_y + a[10] * o_z + a[11]
        di_x = a[0] * d_x + a[1] * d_y + a[2] * d_z
        di_y = a[4] * d_x + a[5] * d_y + a[6] * d_z
        di_z = a[8] * d_x + a[9] * d_y + a[10] * d_z
        off = a[12]
        oi_x = oi_x + di_x * off
        oi_y = oi_y + di_y * off
        oi_z = oi_z + di_z * off
        # phi^T: (16, RB) = [d, o, d x o, 1, 0...]
        w_x = di_y * oi_z - di_z * oi_y
        w_y = di_z * oi_x - di_x * oi_z
        w_z = di_x * oi_y - di_y * oi_x
        phiT = jnp.concatenate([
            di_x, di_y, di_z, oi_x, oi_y, oi_z, w_x, w_y, w_z,
            jnp.ones((1, RAY_BLOCK), f32),
            jnp.zeros((PHI_DIM - 10, RAY_BLOCK), f32)], axis=0)

        root_bb = [inst_ref[inst_id, 13 + c] for c in range(6)]
        root_ok = slab_rows(root_bb, (oi_x, oi_y, oi_z),
                            (di_x, di_y, di_z), best_t)

        def tri_block(k, carry):
            bt, bp, bi = carry
            blk = b0 + k
            bb = [bb_ref[blk, c] for c in range(6)]
            blk_ok = slab_rows(bb, (oi_x, oi_y, oi_z),
                               (di_x, di_y, di_z), bt)

            def do(carry):
                bt, bp, bi = carry
                Wb = W_ref[blk]                       # (4*TB, PHI_DIM)
                q = _search_dot(Wb, phiT)
                det = q[0 * TRI_BLOCK:1 * TRI_BLOCK]
                ud = q[1 * TRI_BLOCK:2 * TRI_BLOCK]
                vd = q[2 * TRI_BLOCK:3 * TRI_BLOCK]
                td = q[3 * TRI_BLOCK:4 * TRI_BLOCK]
                inv = f32(1.0) / det
                u = ud * inv
                v = vd * inv
                t = td * inv
                valid = ((u >= f32(0.0)) & (v >= f32(0.0))
                         & (u + v <= f32(1.0)) & (t >= f32(0.0)) & (t < bt))
                t = jnp.where(valid, t, FLT_MAX)
                tmin = jnp.min(t, axis=0, keepdims=True)      # (1, RB)
                j = jnp.min(jnp.where(t == tmin, lane0, 1 << 30),
                            axis=0, keepdims=True)
                upd = tmin < bt
                bt = jnp.where(upd, tmin, bt)
                bp = jnp.where(upd, prim_base + k * TRI_BLOCK + j, bp)
                bi = jnp.where(upd, inst_id, bi)
                return bt, bp, bi

            return jax.lax.cond(jnp.any(blk_ok), do, lambda c: c,
                                (bt, bp, bi))

        best_t, best_p, best_i = jax.lax.cond(
            jnp.any(root_ok),
            lambda c: jax.lax.fori_loop(0, bc, tri_block, c),
            lambda c: c, (best_t, best_p, best_i))

    t_ref[0] = best_t
    prim_ref[0] = best_p
    iid_ref[0] = best_i


def build_flash_fn(W_all, bb_all, inst_rows, plan):
    """flash(rays_T) -> (t, prim, inst), each (NRB, RAY_BLOCK).

    W_all: (NB, 4*TRI_BLOCK, PHI_DIM) f32; bb_all: (NB, 8) f32 tri-block
    mesh-space bboxes; inst_rows: (I, 24) f32; plan: static tuple of
    (inst_id, block_start, block_count, prim_base) for mesh instances.
    """
    kern = functools.partial(_kernel, plan=tuple(plan))
    # W + a few q slabs + cond/loop temps; Mosaic's default scoped limit
    # (~17MB) is too tight for the unrolled instance plan
    vmem = int(W_all.size * 4) + (48 << 20)

    def flash(rays_T):
        nrb = rays_T.shape[0]
        return pl.pallas_call(
            kern,
            grid=(nrb,),
            in_specs=[
                pl.BlockSpec((1, 8, RAY_BLOCK), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nrb, 1, RAY_BLOCK), f32),
                jax.ShapeDtypeStruct((nrb, 1, RAY_BLOCK), i32),
                jax.ShapeDtypeStruct((nrb, 1, RAY_BLOCK), i32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(vmem, 120 * 1024 * 1024)),
        )(rays_T, W_all, bb_all, inst_rows)

    return flash
