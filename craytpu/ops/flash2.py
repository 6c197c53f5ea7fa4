"""Flash-intersect v2: the Pallas TPU closest-hit kernel, full scene.

Supersedes ops/flash_isect.py (v1). Same MXU bilinear Möller-Trumbore
search (see ops/dense_isect.py for the phi(ray) @ W(tri) derivation), with
four structural upgrades:

  1. DATA-DRIVEN INSTANCE PLAN. v1 unrolled a Python loop over mesh
     instances (compile time O(instances) — hopeless at statues.json's 55
     instances). v2 reads a (IM, 6) i32 SMEM table inside a fori_loop, so
     one compiled kernel serves any instance count.
  2. TWO-LEVEL BLOCK HIERARCHY. Per instance: root bbox cull, then a
     superblock (8 tri-blocks = 2048 tris) bbox scan builds a compacted
     worklist of surviving superblocks in SMEM, then only those visit the
     MXU. Blocks follow BVH order so bboxes are spatially tight — the
     coarse analogue of the reference's BVH walk (bvh.c:354-441), at
     vector-friendly granularity.
  3. DEMAND-STREAMED TRIANGLE DATA. Coefficient blocks live in HBM and
     surviving superblocks are DMA'd into a VMEM double buffer (copy of
     superblock q+1 overlaps the matmuls of superblock q). VMEM no longer
     caps scene size (v1 kept all blocks resident: ~500k tris max,
     ADVICE.md item 5), and culled superblocks cost no HBM traffic.
  4. SPHERES IN-KERNEL. v1 ran sphere instances as a separate XLA pass +
     merge; v2 folds the exact quadratic (sphere.c:20-50 semantics,
     including the <= best-t tie acceptance after meshes) into the same
     kernel, saving two dispatches per bounce.

Also new: a per-ray t limit input — dead pool lanes enter with limit 0 so
blocks of dead rays cull like empty space instead of tracing at full cost.

The kernel returns winner ids + search-precision t only; exact (t, u, v)
are recomputed outside on the single winner (ops/hitrec.py) so shading
consumes bit-identical hit data to the SIMT reference path.
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
FLT_MAX = 3.4028235e38

# r3 sweep on a realistic 3-bounce mixed pool (kernel-only ms at 1M
# lanes): 256 -> 77.4, 512 -> 66.6, 768 -> 61.1, 1024 -> 64.9. 768
# amortizes per-visit control best before block-union culling decay
# sets in; end-to-end it is ~1% ahead of 512.
RAY_BLOCK = int(os.environ.get("CRAYTPU_RAY_BLOCK", "768"))
# M-split: gate each of MSPLIT lane column-groups of a ray block on its
# OWN slab mask per tri-block visit. Lanes are Morton-sorted, so the
# groups are spatially tighter than their union: a tri-block passing
# only one group's slab test costs 1/MSPLIT of the matmul output tiles
# (time ~ output tiles — the K=48 finding). Control (worklists, DMA,
# instance scan) stays at full RAY_BLOCK granularity. Each group must
# be a multiple of the 128-lane MXU tile: RAY_BLOCK=768 allows 1/2/3/6.
MSPLIT = int(os.environ.get("CRAYTPU_FLASH_MSPLIT", "1"))
from craytpu.ops.dense_isect import TRI_BLOCK  # noqa: E402
SB_BLOCKS = int(os.environ.get("CRAYTPU_SB_BLOCKS", "8"))
PHI_DIM = 16                # 10 used: [d, o, d x o, 1]; padded for MXU


_DN = (((0,), (0,)), ((), ()))  # contract dim 0 of both (lhs transposed)


def _stack_factor() -> int:
    """4 (default, full double-bf16) or 3 (CRAYTPU_FLASH_K=48: drop the
    W_lo.p_lo cross term — classic bf16x3 accuracy — for 25% less MXU
    contraction depth). Read when the scene is compiled (split_hi_lo);
    the kernel derives it from the stored W layout, so a process always
    runs a self-consistent pair."""
    return 3 if os.environ.get("CRAYTPU_FLASH_K", "64") == "48" else 4


def split_hi_lo(W: np.ndarray):
    """f32 (NB, PHI, 4*TB) -> stacked bf16 (NB, SF*PHI, 4*TB) coefficient
    blocks [W_hi; W_lo; W_hi(; W_lo)].

    The winner search needs ~f32 accuracy (1-pass bf16 misclassifies u/v
    near shared edges -> light leaks), but three separate K=16 bf16
    matmuls (classic bf16x3) waste the MXU: its contraction pipeline is
    128 deep, so K=16 runs at 1/8 throughput and each extra pass costs a
    full matmul. Instead ALL double-bf16 cross terms ride ONE K=64
    matmul: with rhs rows stacked [p_hi; p_hi; p_lo; p_lo], the single
    product accumulates W_hi.p_hi + W_lo.p_hi + W_hi.p_lo + W_lo.p_lo =
    (W_hi+W_lo).(p_hi+p_lo), i.e. a full bf16-pair product (~2^-27
    relative, better than bf16x3) for the price of one pass.

    CRAYTPU_FLASH_K=48 drops the last [W_lo] group (and _stack_phi its
    [p_lo]), losing only W_lo.p_lo (~2^-16 relative) — the exact winner
    recompute outside the kernel (ops/hitrec.py) still emits bit-exact
    hit data; only near-tie winner SELECTION can differ.
    """
    import numpy as _np
    Whi = W.astype(_np.float32).astype(jnp.bfloat16)
    Wlo = (W - Whi.astype(_np.float32)).astype(jnp.bfloat16)
    groups = [Whi, Wlo, Whi] if _stack_factor() == 3 else \
        [Whi, Wlo, Whi, Wlo]
    return _np.concatenate(groups, axis=1)


def _stack_phi(phiT, sf=4):
    """(PHI, RB) f32 -> (sf*PHI, RB) bf16 [p_hi; p_hi; p_lo(; p_lo)]."""
    p_hi = phiT.astype(jnp.bfloat16)
    p_lo = (phiT - p_hi.astype(f32)).astype(jnp.bfloat16)
    groups = [p_hi, p_hi, p_lo] if sf == 3 else [p_hi, p_hi, p_lo, p_lo]
    return jnp.concatenate(groups, axis=0)


def _search_dot(Wb_stack, phiS):
    """Wb_stack (4*PHI, 4*TB) bf16 x phiS (4*PHI, RB) bf16 -> (4*TB, RB)
    f32 in ONE MXU pass (see split_hi_lo)."""
    return jax.lax.dot_general(Wb_stack, phiS, _DN,
                               preferred_element_type=f32,
                               precision=jax.lax.Precision.DEFAULT)


def pack_rays_T(o, d):
    """(B,3),(B,3) -> (NRB, 8, RAY_BLOCK) transposed padded ray blocks."""
    B = o.shape[0]
    nrb = max((B + RAY_BLOCK - 1) // RAY_BLOCK, 1)
    pad = nrb * RAY_BLOCK - B
    rays = jnp.concatenate([o, d, jnp.zeros((B, 2), f32)], axis=1)
    if pad:
        rays = jnp.concatenate([rays, jnp.zeros((pad, 8), f32)], axis=0)
    return rays.reshape(nrb, RAY_BLOCK, 8).transpose(0, 2, 1)


def _natrays() -> bool:
    """CRAYTPU_FLASH_NATRAYS=1: kernel takes natural-layout (NRB, RB, 8)
    ray blocks (pack_rays_nat) and transposes in-kernel, instead of the
    pool-wide XLA lane transpose (pack_rays_T). Read at TRACE time."""
    return os.environ.get("CRAYTPU_FLASH_NATRAYS", "0") == "1"


def pack_rays_nat(o, d):
    """(B,3),(B,3) -> (NRB, RAY_BLOCK, 8) NATURAL-layout ray blocks:
    a reshape, not a transpose."""
    B = o.shape[0]
    nrb = max((B + RAY_BLOCK - 1) // RAY_BLOCK, 1)
    pad = nrb * RAY_BLOCK - B
    rays = jnp.concatenate([o, d, jnp.zeros((B, 2), f32)], axis=1)
    if pad:
        rays = jnp.concatenate([rays, jnp.zeros((pad, 8), f32)], axis=0)
    return rays.reshape(nrb, RAY_BLOCK, 8)


def pack_limit(limit, nrb):
    B = limit.shape[0]
    pad = nrb * RAY_BLOCK - B
    if pad:
        limit = jnp.concatenate([limit, jnp.zeros(pad, f32)])
    return limit.reshape(nrb, 1, RAY_BLOCK)


def _slab_rows2(bb, oi, di, limit):
    """Rows slab test. bb = 6 scalars (min,max per axis); oi/di = 3
    (1,RB) rows each. Returns (ok, entry_t) rows: ok = ray's bbox entry
    can still beat its best; entry_t = clamped slab entry distance."""
    ok_near = jnp.full((1, RAY_BLOCK), -FLT_MAX, f32)
    ok_far = jnp.full((1, RAY_BLOCK), FLT_MAX, f32)
    for ax in range(3):
        da = di[ax]
        # exact-zero components would make 0 * inf = NaN downstream
        da = jnp.where(da == f32(0.0), f32(1e-30), da)
        inv = f32(1.0) / da
        t0 = (bb[2 * ax] - oi[ax]) * inv
        t1 = (bb[2 * ax + 1] - oi[ax]) * inv
        ok_near = jnp.maximum(ok_near, jnp.minimum(t0, t1))
        ok_far = jnp.minimum(ok_far, jnp.maximum(t0, t1))
    ok = (ok_near <= ok_far) & (ok_far >= f32(0.0)) & (ok_near < limit)
    return ok, jnp.maximum(ok_near, f32(0.0))


def _slab_rows(bb, oi, di, limit):
    return _slab_rows2(bb, oi, di, limit)[0]


def _kernel(plan_ref, sphplan_ref, inst_ref, bb_ref, sbbb_ref,
            rays_ref, limit_ref, W_hbm,
            t_ref, prim_ref, iid_ref,
            wbuf, sems, sb_list, sb_keys, inst_list, inst_keys, dbg,
            *, n_mesh_inst, n_sph_inst, nsb_max, resident, sf=4):
    """One 256-ray block vs the whole scene.

    plan_ref:    (IM, 6) i32 SMEM [inst_id, blk_start, nblocks, sb_start,
                 nsb, prim_base]
    sphplan_ref: (IS, 1) i32 SMEM [inst_id]
    inst_ref:    (I, 24) f32 SMEM [Ainv(12), rayOffset, root_bb(6),
                 radius, pad(4)]
    bb_ref:      (NB, 8) f32 SMEM per-tri-block mesh-space bboxes
    sbbb_ref:    (NSB, 8) f32 SMEM per-superblock bboxes
    rays_ref:    (1, 8, RB) VMEM; limit_ref: (1, 1, RB) VMEM initial t cap
                 (0 for dead lanes -> full cull)
    W_hbm:       (NB + SB_BLOCKS, PHI_DIM, 4*TB) f32 in HBM/ANY
    wbuf:        (2, SB_BLOCKS, PHI_DIM, 4*TB) f32 VMEM double buffer
    sems:        (2,) DMA semaphores; sb_list: (nsb_max,) i32 SMEM worklist
    """
    if _natrays():
        # natural-layout rays (NRB, RB, 8): ONE in-kernel transpose per
        # ray block replaces the XLA-side lane transpose of the whole
        # pool (pack_rays_T measured ~15 ms per step at 1M lanes)
        rT = rays_ref[0].T                       # (8, RB)
        o_x = rT[0:1]
        o_y = rT[1:2]
        o_z = rT[2:3]
        d_x = rT[3:4]
        d_y = rT[4:5]
        d_z = rT[5:6]
    else:
        o_x = rays_ref[0, 0:1, :]
        o_y = rays_ref[0, 1:2, :]
        o_z = rays_ref[0, 2:3, :]
        d_x = rays_ref[0, 3:4, :]
        d_y = rays_ref[0, 4:5, :]
        d_z = rays_ref[0, 5:6, :]

    best_t = limit_ref[0]
    best_p = jnp.full((1, RAY_BLOCK), -1, i32)
    best_i = jnp.full((1, RAY_BLOCK), -1, i32)
    # profiling counters (scripts/profile_visits.py); statically compiled
    # out unless CRAYTPU_FLASH_DEBUG is set
    DEBUG = bool(os.environ.get("CRAYTPU_FLASH_DEBUG"))
    # CRAYTPU_FLASH_ABLATE (profiling only, scripts/profile_kernel.py):
    # "novisit" = skip block bodies (measures scan/DMA/control overhead),
    # "noepilogue" = matmul + one reduce only, "noextract" = full valid
    # math but no winner-id extraction
    ABLATE = os.environ.get("CRAYTPU_FLASH_ABLATE", "")
    # CRAYTPU_FLASH_EPI=lean: division-light winner epilogue (A/B
    # candidate; same accept set up to 1-ulp rounding at t==best)
    EPI = os.environ.get("CRAYTPU_FLASH_EPI", "")
    if DEBUG:
        dbg[0] = i32(0)
        dbg[1] = i32(0)

    lane0 = jax.lax.broadcasted_iota(i32, (TRI_BLOCK, RAY_BLOCK), 0)

    def transform(iid):
        a = [inst_ref[iid, c] for c in range(13)]
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
        return (oi_x, oi_y, oi_z), (di_x, di_y, di_z)

    # ---- phase 0: order surviving mesh instances near-first (by the
    # closest slab entry over live lanes). Processing the nearest
    # instance first tightens best_t for all lanes before farther
    # instances are tested, so their roots/superblocks cull — the
    # wavefront analogue of the reference's ordered BVH descent
    # (bvh.c:391-439). ----
    def p0(im, cnt):
        iid = plan_ref[im, 0]
        oi, di = transform(iid)
        root_bb = [inst_ref[iid, 13 + c] for c in range(6)]
        ok, near = _slab_rows2(root_bb, oi, di, best_t)
        key = jnp.min(jnp.where(ok, near, f32(FLT_MAX)))
        hit_any = jnp.any(ok)

        @pl.when(hit_any)
        def _():
            def shift_cond(p):
                return (p > 0) & (inst_keys[p - 1] > key)

            def shift_body(p):
                inst_keys[p] = inst_keys[p - 1]
                inst_list[p] = inst_list[p - 1]
                return p - 1

            pos = jax.lax.while_loop(shift_cond, shift_body, cnt)
            inst_keys[pos] = key
            inst_list[pos] = im
        return cnt + hit_any.astype(i32)

    def mesh_inst(r, carry):
        bt, bp, bi = carry
        im = inst_list[r]
        iid = plan_ref[im, 0]
        b0 = plan_ref[im, 1]
        nb = plan_ref[im, 2]
        sb0 = plan_ref[im, 3]
        nsb = plan_ref[im, 4]
        pbase = plan_ref[im, 5]
        oi, di = transform(iid)
        root_bb = [inst_ref[iid, 13 + c] for c in range(6)]
        root_ok = _slab_rows(root_bb, oi, di, bt)

        # phi^T: (PHI_DIM, RB) = [d, o, d x o, 1, 0...]
        w_x = di[1] * oi[2] - di[2] * oi[1]
        w_y = di[2] * oi[0] - di[0] * oi[2]
        w_z = di[0] * oi[1] - di[1] * oi[0]
        phiT = jnp.concatenate([
            di[0], di[1], di[2], oi[0], oi[1], oi[2], w_x, w_y, w_z,
            jnp.ones((1, RAY_BLOCK), f32),
            jnp.zeros((PHI_DIM - 10, RAY_BLOCK), f32)], axis=0)
        phiS = _stack_phi(phiT, sf)

        def do_mesh(carry):
            bt0, bp0, bi0 = carry

            # phase 1: near-first compacted worklist of surviving
            # superblocks (same ordering rationale as phase 0)
            def scan_sb(s, cnt):
                bb = [sbbb_ref[sb0 + s, c] for c in range(6)]
                ok, near = _slab_rows2(bb, oi, di, bt0)
                key = jnp.min(jnp.where(ok, near, f32(FLT_MAX)))
                hit_any = jnp.any(ok)

                @pl.when(hit_any)
                def _():
                    if DEBUG:
                        dbg[1] = dbg[1] + 1

                    def shift_cond(p):
                        return (p > 0) & (sb_keys[p - 1] > key)

                    def shift_body(p):
                        sb_keys[p] = sb_keys[p - 1]
                        sb_list[p] = sb_list[p - 1]
                        return p - 1

                    pos = jax.lax.while_loop(shift_cond, shift_body, cnt)
                    sb_keys[pos] = key
                    sb_list[pos] = s
                return cnt + hit_any.astype(i32)

            cnt = jax.lax.fori_loop(0, nsb, scan_sb, i32(0))

            def get_dma(slot, q):
                s = sb_list[q]
                return pltpu.make_async_copy(
                    W_hbm.at[pl.ds(b0 + s * SB_BLOCKS, SB_BLOCKS)],
                    wbuf.at[slot], sems.at[slot])

            if not resident:
                @pl.when(cnt > 0)
                def _():
                    get_dma(0, 0).start()

            # phase 2: double-buffered visit of surviving superblocks
            def sb_body(qi, carry):
                bt, bp, bi = carry
                slot = jax.lax.rem(qi, 2)

                if not resident:
                    @pl.when(qi + 1 < cnt)
                    def _():
                        get_dma(jax.lax.rem(qi + 1, 2), qi + 1).start()

                    get_dma(slot, qi).wait()
                s = sb_list[qi]
                bstart = s * SB_BLOCKS
                bc = jnp.minimum(nb - bstart, SB_BLOCKS)

                def blk_body(bl, carry):
                    bt, bp, bi = carry
                    blk = b0 + bstart + bl
                    bbv = [bb_ref[blk, c] for c in range(6)]
                    blk_ok = _slab_rows(bbv, oi, di, bt)

                    HM = RAY_BLOCK // MSPLIT
                    lane0_c = lane0 if MSPLIT == 1 else \
                        jax.lax.broadcasted_iota(i32, (TRI_BLOCK, HM), 0)

                    def visit_cols(c0, carry):
                        """MXU search + winner epilogue on lane columns
                        [c0, c0+HM); carries are HM-wide slices."""
                        bt, bp, bi = carry
                        if ABLATE == "novisit":
                            return bt, bp, bi
                        if resident:
                            Wb = W_hbm[blk]
                        else:
                            Wb = wbuf[slot, bl]
                        phiS_c = phiS if MSPLIT == 1 \
                            else phiS[:, c0:c0 + HM]
                        q3 = _search_dot(Wb, phiS_c)
                        if ABLATE == "noepilogue":
                            # consume the matmul with a single reduce
                            bt = jnp.minimum(bt, jnp.min(
                                jnp.abs(q3[3 * TRI_BLOCK:4 * TRI_BLOCK])
                                + f32(1e30), axis=0, keepdims=True))
                            return bt, bp, bi
                        if DEBUG and os.environ.get(
                                "CRAYTPU_FLASH_DEBUG") == "2":
                            # two-stage feasibility probe: count visits
                            # where ANY lane has a t-improving candidate
                            # from (det, td) alone — exactly the visits a
                            # det/td-first split kernel would still have
                            # to run the (ud, vd) half-matmul for
                            d0 = q3[0 * TRI_BLOCK:1 * TRI_BLOCK]
                            t0_ = q3[3 * TRI_BLOCK:4 * TRI_BLOCK] / d0
                            cand = ((t0_ > f32(0.0))
                                    & (t0_ < jnp.broadcast_to(
                                        bt, t0_.shape)))

                            @pl.when(jnp.any(cand))
                            def _():
                                dbg[1] = dbg[1] + 1
                        det = q3[0 * TRI_BLOCK:1 * TRI_BLOCK]
                        ud = q3[1 * TRI_BLOCK:2 * TRI_BLOCK]
                        vd = q3[2 * TRI_BLOCK:3 * TRI_BLOCK]
                        td = q3[3 * TRI_BLOCK:4 * TRI_BLOCK]
                        if EPI == "lean":
                            # division-light epilogue: validity via
                            # sign-FLIPPED numerators (x^sign(det) has
                            # the sign of x/det; u/det>=0 etc. become
                            # float compares against |det| with NO
                            # divide), then ONE divide for the t values
                            # the reduce needs. Same accept/reject set:
                            # det==0 -> |det|==0 rejects everything just
                            # as inv=inf/NaN does in the classic chain.
                            u32v = jnp.uint32
                            sgn = det.view(u32v) & jnp.uint32(0x80000000)
                            us = (ud.view(u32v) ^ sgn).view(f32)
                            vs = (vd.view(u32v) ^ sgn).view(f32)
                            ts = (td.view(u32v) ^ sgn).view(f32)
                            ad = (det.view(u32v)
                                  & jnp.uint32(0x7FFFFFFF)).view(f32)
                            # ts>=0 & ts/ad<bt as ONE unsigned compare
                            # (both sides non-negative floats). ad is
                            # clamped so bt(=0 on dead lanes) * ad(=inf
                            # on overflowed dets) cannot make a NaN that
                            # u32-compares as "accept"
                            btad = bt * jnp.minimum(ad, f32(3e37))
                            valid = ((jnp.minimum(us, vs) >= f32(0.0))
                                     & (us + vs <= ad)
                                     & (ts.view(u32v) < btad.view(u32v)))
                            t = jnp.where(valid, ts / ad, FLT_MAX)
                        else:
                            inv = f32(1.0) / det
                            u = ud * inv
                            v = vd * inv
                            t = td * inv
                            # (u>=0 & v>=0) as one min+cmp; (t>=0 & t<bt)
                            # as ONE unsigned compare: non-negative f32
                            # order equals their uint order, negatives/
                            # NaN/inf get the sign/exponent bits and fail
                            valid = ((jnp.minimum(u, v) >= f32(0.0))
                                     & (u + v <= f32(1.0))
                                     & (t.view(jnp.uint32)
                                        < jnp.broadcast_to(
                                            bt, t.shape).view(jnp.uint32)))
                            t = jnp.where(valid, t, FLT_MAX)
                        tmin = jnp.min(t, axis=0, keepdims=True)
                        upd = tmin < bt
                        if ABLATE == "noextract":
                            return jnp.where(upd, tmin, bt), bp, bi

                        def extract(carry):
                            bt, bp, bi = carry
                            j = jnp.min(
                                jnp.where(t == tmin, lane0_c, 1 << 30),
                                axis=0, keepdims=True)
                            bt = jnp.where(upd, tmin, bt)
                            bp = jnp.where(
                                upd,
                                pbase + (bstart + bl) * TRI_BLOCK + j, bp)
                            bi = jnp.where(upd, iid, bi)
                            return bt, bp, bi

                        return jax.lax.cond(jnp.any(upd), extract,
                                            lambda c: c, (bt, bp, bi))

                    if MSPLIT == 1:
                        if DEBUG:
                            @pl.when(jnp.any(blk_ok))
                            def _():
                                dbg[0] = dbg[0] + 1
                        return jax.lax.cond(
                            jnp.any(blk_ok),
                            functools.partial(visit_cols, 0),
                            lambda c: c, (bt, bp, bi))

                    # M-split: each HM-lane column group gates on ITS
                    # slab mask; only passing groups pay matmul tiles
                    for sidx in range(MSPLIT):
                        c0 = sidx * HM
                        ok_s = blk_ok[:, c0:c0 + HM]
                        if DEBUG:
                            # dbg[0] counts GROUP visits: tiles per
                            # group visit = full visit tiles / MSPLIT
                            @pl.when(jnp.any(ok_s))
                            def _():
                                dbg[0] = dbg[0] + 1

                        def run(c, c0=c0):
                            btf, bpf, bif = c
                            sub = visit_cols(
                                c0, (btf[:, c0:c0 + HM],
                                     bpf[:, c0:c0 + HM],
                                     bif[:, c0:c0 + HM]))

                            def put(full, s):
                                # static-slice concat write-back (Pallas
                                # TPU has no dynamic_update_slice; the
                                # group offsets are static anyway)
                                parts = []
                                if c0:
                                    parts.append(full[:, :c0])
                                parts.append(s)
                                if c0 + HM < RAY_BLOCK:
                                    parts.append(full[:, c0 + HM:])
                                return parts[0] if len(parts) == 1 \
                                    else jnp.concatenate(parts, axis=1)

                            return (put(btf, sub[0]), put(bpf, sub[1]),
                                    put(bif, sub[2]))

                        bt, bp, bi = jax.lax.cond(
                            jnp.any(ok_s), run, lambda c: c, (bt, bp, bi))
                    return bt, bp, bi

                return jax.lax.fori_loop(0, bc, blk_body, carry)

            return jax.lax.fori_loop(0, cnt, sb_body, (bt0, bp0, bi0))

        return jax.lax.cond(jnp.any(root_ok), do_mesh, lambda c: c,
                            (bt, bp, bi))

    def run_mesh(carry):
        icnt = jax.lax.fori_loop(0, n_mesh_inst, p0, i32(0))
        return jax.lax.fori_loop(0, icnt, mesh_inst, carry)

    # ---- sphere instances FIRST: exact quadratic, <= tie acceptance.
    # The reference runs spheres after meshes (sphere.c:20-50 via
    # instance.c:45-60), but the winner set is ORDER-INDEPENDENT here:
    # spheres accept t0 <= bt and meshes accept strictly t < bt, so a
    # sphere tied with a mesh triangle wins in either order, and
    # sphere-vs-sphere ordering within the fori_loop is unchanged.
    # Running the cheap quadratics first seeds best_t before the mesh
    # phases, so instance roots / superblocks / tri-blocks behind a
    # sphere hit cull instead of reaching the MXU (the ablated kernel is
    # ~78% matmul — visit count is the whole game). ----
    def sph_inst(si, carry):
        bt, bp, bi = carry
        iid = sphplan_ref[si, 0]
        oi, di = transform(iid)
        radius = inst_ref[iid, 19]
        A = di[0] * di[0] + di[1] * di[1] + di[2] * di[2]
        Bq = f32(2.0) * (di[0] * oi[0] + di[1] * oi[1] + di[2] * oi[2])
        C = (oi[0] * oi[0] + oi[1] * oi[1] + oi[2] * oi[2]
             - radius * radius)
        disc = Bq * Bq - f32(4.0) * A * C
        has = disc >= f32(0.0)
        sq = jnp.sqrt(jnp.maximum(disc, f32(0.0)))
        t0 = (-Bq + sq) / f32(2.0)
        t1 = (-Bq - sq) / f32(2.0)
        t0 = jnp.where((t0 > t1) & (t1 > f32(0.0)), t1, t0)
        hit = has & (t0 >= f32(1e-5)) & (t0 <= bt)
        bt = jnp.where(hit, t0, bt)
        bp = jnp.where(hit, -1, bp)
        bi = jnp.where(hit, iid, bi)
        return bt, bp, bi

    if n_sph_inst:
        best_t, best_p, best_i = jax.lax.cond(
            jnp.any(best_t > f32(0.0)),
            lambda c: jax.lax.fori_loop(0, n_sph_inst, sph_inst, c),
            lambda c: c, (best_t, best_p, best_i))

    if n_mesh_inst:
        # ALL-dead ray blocks (limit 0 everywhere — the sorted pool packs
        # dead lanes into whole blocks) skip the entire instance scan
        best_t, best_p, best_i = jax.lax.cond(
            jnp.any(best_t > f32(0.0)), run_mesh, lambda c: c,
            (best_t, best_p, best_i))

    if DEBUG:
        # replace prim with diagnostic counters per ray block:
        # lane 0 = MXU block visits, lane 1 = superblock worklist entries
        lane_i = jax.lax.broadcasted_iota(i32, (1, RAY_BLOCK), 1)
        best_p = jnp.where(lane_i == 1, dbg[1], dbg[0])
    t_ref[0] = best_t
    prim_ref[0] = best_p
    iid_ref[0] = best_i


# W smaller than this stays fully VMEM-resident (no per-superblock DMA);
# larger scenes stream superblocks from HBM through a double buffer
RESIDENT_BYTES = int(os.environ.get("CRAYTPU_W_RESIDENT_BYTES",
                                    48 * 1024 * 1024))


def build_flash2_fn(meta: dict):
    """flash2(rays_T, limit) -> (t, prim, inst), each (NRB, 1, RAY_BLOCK).

    meta: dense_meta dict with W_pad (NB+SB, 4*PHI, 4*TB) stacked bf16
    (split_hi_lo), bb (NB, 8), sb_bb (NSB, 8), inst_rows (I, 24),
    mesh_plan (IM, 6) i32, sph_plan (IS, 1) i32, nsb_max int.
    """
    W_pad = meta["W_pad"]
    bb = meta["bb"]
    sb_bb = meta["sb_bb"]
    inst_rows = meta["inst_rows"]
    mesh_plan = meta["mesh_plan"]
    sph_plan = meta["sph_plan"]
    n_mesh_inst = int(mesh_plan.shape[0]) if meta["n_mesh_inst"] else 0
    n_sph_inst = int(sph_plan.shape[0]) if meta["n_sph_inst"] else 0
    nsb_max = max(int(meta["nsb_max"]), 1)
    resident = int(W_pad.size) * 2 <= RESIDENT_BYTES
    sf = int(W_pad.shape[1]) // PHI_DIM   # 4 or 3, see _stack_factor

    wspace = pltpu.VMEM if resident else pl.ANY
    kern = functools.partial(_kernel, n_mesh_inst=n_mesh_inst,
                             n_sph_inst=n_sph_inst, nsb_max=nsb_max,
                             resident=resident, sf=sf)
    scratch = [
        pltpu.VMEM((1 if resident else 2, SB_BLOCKS, sf * PHI_DIM,
                    4 * TRI_BLOCK), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SMEM((nsb_max,), i32),                  # sb worklist
        pltpu.SMEM((nsb_max,), f32),                  # sb entry keys
        pltpu.SMEM((max(n_mesh_inst, 1),), i32),      # instance order
        pltpu.SMEM((max(n_mesh_inst, 1),), f32),      # instance keys
        pltpu.SMEM((2,), i32),                        # debug counters
    ]
    vmem_limit = min(int(W_pad.size) * 2 + (32 << 20), 110 << 20) \
        if resident else (48 << 20)

    # CRAYTPU_FLASH_INTERPRET=1: run the kernel in Pallas interpret mode
    # (CPU) — used by tests/test_flash2_interpret.py to validate kernel
    # edits for winner parity without the TPU
    interpret = bool(os.environ.get("CRAYTPU_FLASH_INTERPRET"))

    ray_block_shape = (1, RAY_BLOCK, 8) if _natrays() \
        else (1, 8, RAY_BLOCK)
    ray_specs = [
        pl.BlockSpec(ray_block_shape, lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),   # rays
        pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),   # limit
        pl.BlockSpec(memory_space=wspace),       # W
    ]
    out_specs = [
        pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)] * 3

    def flash(rays_T, limit_T):
        nrb = rays_T.shape[0]
        out_shape = [
            jax.ShapeDtypeStruct((nrb, 1, RAY_BLOCK), f32),
            jax.ShapeDtypeStruct((nrb, 1, RAY_BLOCK), i32),
            jax.ShapeDtypeStruct((nrb, 1, RAY_BLOCK), i32),
        ]
        return pl.pallas_call(
            kern,
            interpret=interpret,
            grid=(nrb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # mesh_plan
                pl.BlockSpec(memory_space=pltpu.SMEM),   # sph_plan
                pl.BlockSpec(memory_space=pltpu.SMEM),   # inst_rows
                pl.BlockSpec(memory_space=pltpu.SMEM),   # bb
                pl.BlockSpec(memory_space=pltpu.SMEM),   # sb_bb
            ] + ray_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit),
        )(mesh_plan, sph_plan, inst_rows, bb, sb_bb, rays_T, limit_T,
          W_pad)

    return flash
