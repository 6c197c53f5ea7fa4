"""Wavefront Monte Carlo path tracer (the integrator).

The TPU-native replacement for the reference's per-pixel megakernel loop
(renderer/pathtrace.c:32-60 + renderThread renderer.c:258-327): the whole
frame is one SoA wavefront of rays advancing bounce-by-bounce. Each bounce is
ONE jitted device step (closest-hit traversal + deferred hit info + node-
graph shading + Russian roulette); the bounce loop runs on the host with an
early exit as soon as every lane has terminated. Keeping the bounce loop out
of the compiled graph keeps the TPU kernel small (the traversal while-loop
is the only device-side loop) and is the natural seam for stream compaction
and multi-chip sharding.

Per-(pixel, pass) semantics match the reference exactly:
  - sampler re-seeded per (pixel, pass): Random/PCG32 in batch mode
    (renderer.c:281), Halton in interactive mode (renderer.c:206)
  - camera ray with tent-filter jitter + optional thin-lens DoF
  - iterative path: closest hit -> add weighted legacy emission ->
    bsdf sample (node graph) -> Russian roulette from depth 4
  - miss adds weighted background and terminates
  - running-average accumulation into a float framebuffer
    (renderer.c:287-294)
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from craytpu.ops import sampler as smp
from craytpu.ops import shading
from craytpu.ops import traverse as trv
from craytpu.ops import vecmath as vm
from craytpu.scene.compile import CompiledScene

f32 = jnp.float32
i32 = jnp.int32
u32 = jnp.uint32


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


class WavefrontRenderer:
    """Compiled render pipeline for one scene + sampler kind."""

    def __init__(self, cscene: CompiledScene, kind: str = smp.RANDOM,
                 bounces: int | None = None, tile_rays: int | None = None,
                 nee: bool = False):
        import os
        from craytpu.utils.jaxsetup import setup_jax
        setup_jax()
        self.cscene = cscene
        self.kind = kind
        # next-event estimation (--nee): per-lane "previous vertex was
        # NEE-handled" flag rides in BIT 16 of pdepth (depths are < 2^16),
        # so the pool permute/refill/shrink machinery needs no new state
        self.nee = bool(nee)
        self.width = cscene.camera.width
        self.height = cscene.camera.height
        self.max_depth = (bounces if bounces is not None
                          else cscene.prefs.bounces)
        # Frames are rendered in fixed-size ray batches ("tiles", the
        # wavefront analogue of tile.c): one device dispatch per batch keeps
        # each TPU step short (the watchdog kills long-running steps) and
        # bounds live-ray memory. One compile serves all batches.
        npix = self.width * self.height
        default_rays = 1 << 20 if jax.default_backend() != "cpu" \
            else 1 << 18
        self.tile_rays = int(tile_rays or
                             os.environ.get("CRAYTPU_TILE_RAYS", 0) or
                             min(default_rays, _next_pow2(npix)))
        self.cam_fn = cscene.camera_fn(kind)
        self.bg_fn = cscene.background_fn()
        self.bsdf_fns = cscene.bsdf_fns(kind)
        self.empty_scene = cscene.n_instances == 0
        # Traversal backend: the flash2 Pallas kernel on TPU (per-lane
        # gathers run ~100x below stream bandwidth there), the SIMT stack
        # walk on CPU (where gathers are cheap and golden parity tests
        # live).
        import jax as _jax
        from craytpu.ops.hitrec import make_isect_fn
        mode = os.environ.get("CRAYTPU_TRAVERSAL", "auto")
        if mode == "auto":
            mode = "simt" if _jax.default_backend() == "cpu" else "flash"
        self.isect = make_isect_fn(cscene, mode)
        self._isect_diff_fn = None
        self.traversal_mode = mode

        from craytpu.utils.jaxsetup import maybe_enable_debug
        self._debug = maybe_enable_debug()
        self._init_rays = jax.jit(self._make_init_rays())
        # two variants: pre-RR (depth < 4) and RR (depth >= 4)
        self._step_pre = self._jit(self._make_step(False, checks=True),
                                   donate_argnums=(4, 5, 6, 7, 8, 9))
        self._step_rr = self._jit(self._make_step(True, checks=True),
                                  donate_argnums=(4, 5, 6, 7, 8, 9))
        self._bg_only = jax.jit(
            lambda params, d: self.bg_fn(params, d))
        self._multi_cache = {}

    def _jit(self, fn, donate_argnums=()):
        """jax.jit, or — under CRAYTPU_DEBUG — checkify+jit: index checks
        plus the step's explicit invariant checks become raised, located
        errors (the sanitizer-build analogue, CMakeLists.txt:44-55).
        Donation is disabled in debug mode (checkify may replay)."""
        if not self._debug:
            return jax.jit(fn, donate_argnums=donate_argnums)
        from jax.experimental import checkify
        checked = checkify.checkify(
            fn, errors=checkify.index_checks | checkify.user_checks)
        jf = jax.jit(checked)

        def wrapper(*args):
            err, out = jf(*args)
            checkify.check_error(err)
            return out
        return wrapper

    def _multi_step(self, k: int):
        """k fused bounces in ONE device dispatch (lax.scan over the
        dynamic-RR step). The deep-RR tail otherwise pays a full host
        round trip (~70 ms over the tunnel) per bounce for a handful of
        live rays."""
        if k not in self._multi_cache:
            step_dyn = self._make_step("dynamic", checks=True,
                                       nee=self.nee)
            nee = self.nee

            def multi(params, geom, shade, mat_graph, o, d, weight, s,
                      alive, pdepth, final_full, lane):
                # pdepth: PER-LANE path depth — the persistent pool mixes
                # paths at different depths, and Russian roulette must
                # activate at each path's own depth 4 (pathtrace.c:50)
                params = self.cscene.reg.make_ctx(params)  # hoisted
                delta = jnp.zeros_like(weight)

                max_depth = self.max_depth

                def body(carry, _):
                    o, d, w, fin, s, alive, pd = carry
                    if nee:
                        depth = pd & i32(0xFFFF)
                        prev = (pd >> 16) > 0
                        alive = alive & (depth < max_depth)
                        o, d, w, fin, s, alive, prev = step_dyn(
                            params, geom, shade, mat_graph, o, d, w,
                            fin, s, alive, depth >= 4, prev)
                        pd = (depth + 1) | (prev.astype(i32) << 16)
                        return (o, d, w, fin, s, alive, pd), None
                    # per-path bounce cap (prefs.bounces): the persistent
                    # pool has no outer depth loop to enforce it
                    alive = alive & (pd < max_depth)
                    out = step_dyn(params, geom, shade, mat_graph, o, d, w,
                                   fin, s, alive, pd >= 4)
                    return out + (pd + 1,), None

                (o, d, weight, delta, s, alive, pdepth), _ = jax.lax.scan(
                    body, (o, d, weight, delta, s, alive, pdepth),
                    None, length=k)
                # radiance scatter-add + live count fused into the same
                # dispatch (each extra dispatch is ~5-10 ms over the tunnel)
                final_full = final_full.at[lane].add(delta)
                return (o, d, weight, s, alive, pdepth, final_full,
                        jnp.sum(alive, dtype=i32))

            self._multi_cache[k] = self._jit(
                multi, donate_argnums=(4, 5, 6, 7, 8, 9, 10))
        return self._multi_cache[k]

    # ------------------------------------------------------------------
    def _make_init_rays(self):
        kind = self.kind
        width = self.width
        cam_fn = self.cam_fn

        def init_rays(xs, ys, pass_idx, spp):
            B = xs.shape[0]
            pix_idx = ys.astype(u32) * u32(width) + xs.astype(u32)
            s = smp.init_sampler(kind, jnp.broadcast_to(pass_idx, (B,)),
                                 jnp.broadcast_to(spp, (B,)), pix_idx)
            o, d, s = jax.vmap(cam_fn)(xs, ys, s)
            return o, d, s
        return init_rays

    def _make_step(self, rr_phase, diff: bool = False, nee: bool = False,
                   checks: bool = False):
        """Build one wavefront bounce step.

        rr_phase False/True bakes the Russian-roulette phase in statically
        (used by the host bounce loop, two compiled variants); "dynamic"
        makes the step take an extra traced `rr_active` bool so a lax.scan
        can run every depth through ONE compiled body (the differentiable /
        multi-chip path). diff=True builds the vertex-differentiable
        variant (hit records recomputed from geom.tri_packed). nee=True
        adds next-event estimation (ops/nee.py): the step then takes and
        returns an extra prev_nee (B,) flag.
        """
        kind = self.kind
        bg_fn = self.bg_fn
        bsdf_fns = self.bsdf_fns
        if diff:
            if self._isect_diff_fn is None:
                from craytpu.ops.hitrec import make_isect_fn
                self._isect_diff_fn = make_isect_fn(
                    self.cscene, self.traversal_mode, diff=True)
            isect = self._isect_diff_fn
        else:
            isect = self.isect
        nee_fn = None
        lights_mat_mask = None
        if nee:
            from craytpu.ops.nee import make_nee_fn
            nee_fn = make_nee_fn(self.cscene, kind, isect)
            if nee_fn is not None:
                # suppression applies only to emitters the light table can
                # sample; table-excluded emitters (e.g. non-uniformly
                # scaled spheres) keep their BSDF-path emission
                lights_mat_mask = self.cscene.dense_meta["lights_mat_mask"]

        def shade_chunk(params, rec, st, gid):
            """Evaluate every compiled graph on a ray chunk and
            mask-select by graph id — the batched analogue of the per-hit
            node-DAG dispatch. (lax.switch would broadcast captured scene
            constants per lane under batching.) Graphs are evaluated
            UNCONDITIONALLY: XLA:TPU flattens pure conditionals into
            executing both branches (measured: a switch whose untaken
            branch held a 3.8 ms body still cost 3.0-3.5 ms either way),
            so an any-lane lax.cond never skips work — it only added
            ~2.3 ms/graph of conditional machinery (41.5 -> 34.6 ms at
            1M lanes with 3 graphs when removed)."""
            B = rec.distance.shape[0]
            out = jnp.zeros((B, 3), f32)
            col = jnp.zeros((B, 4), f32)
            s_sel = st
            for gi in range(len(bsdf_fns)):
                m = gid == gi
                # rec.active routes inactive lanes' texture gathers to
                # one resident tile (see HitRec.active) — their outputs
                # are discarded by the where-merge below either way
                o_i, c_i, s_i = bsdf_fns[gi](params,
                                             rec._replace(active=m), st)
                out = jnp.where(m[..., None], o_i, out)
                col = jnp.where(m[..., None], c_i, col)
                s_sel = smp.select_state(m, s_i, s_sel)
            return out, col, s_sel

        import os as _os
        # 0 (default) = unchunked: with the quad-gather texture path and
        # identity-skipping select_state, evaluating every graph over the
        # full wavefront beats 64k chunks (55.8 -> ~34 ms at 1M lanes on
        # scene.json) AND cuts the step's HLO ~16x (the chunk unroll made
        # 1M-lane step compiles take tens of minutes on the axon server).
        # Set CRAYTPU_SHADE_CHUNK=65536 to restore chunked shading.
        SHADE_CHUNK = int(_os.environ.get("CRAYTPU_SHADE_CHUNK", "0"))
        def shade_all(params, rec, st, gid):
            """Material-segmented shading: the pool is Morton-sorted, so
            materials cluster into spatial runs; evaluating in chunks lets
            each chunk's any-lane conds skip whole graphs instead of
            paying every graph over the full wavefront."""
            B = rec.distance.shape[0]
            if (len(bsdf_fns) == 1 or SHADE_CHUNK <= 0
                    or B <= SHADE_CHUNK or B % SHADE_CHUNK):
                return shade_chunk(params, rec, st, gid)
            nch = B // SHADE_CHUNK

            # UNROLLED chunk loop (a lax.map's while-loop machinery cost
            # ~28 ms/step at 1M lanes in device traces); each chunk's
            # any-lane conds still skip unused graphs dynamically
            def sl(x, i):
                return jax.lax.slice_in_dim(x, i * SHADE_CHUNK,
                                            (i + 1) * SHADE_CHUNK, axis=0)
            outs = []
            for i in range(nch):
                outs.append(shade_chunk(
                    params, jax.tree.map(lambda x: sl(x, i), rec),
                    jax.tree.map(lambda x: sl(x, i), st), sl(gid, i)))
            out = jnp.concatenate([o[0] for o in outs])
            col = jnp.concatenate([o[1] for o in outs])
            s2 = jax.tree.map(lambda *xs: jnp.concatenate(xs),
                              *[o[2] for o in outs])
            return out, col, s2

        reg = self.cscene.reg

        def step(params, geom, shade, mat_graph, o, d, weight, final, s,
                 alive, rr_active=None, prev_nee=None):
            # derived shading context (bilinear quad-row tables built
            # from params.texels). No-op if the caller already wrapped —
            # scan-based callers hoist this OUTSIDE the bounce loop.
            # Differentiable builds keep f32 quad tables (texel grads
            # flow through them); forward builds byte-pack LDR tables.
            params = reg.make_ctx(params, packed=not diff)
            # Detach the traversal inputs: the discrete BVH walk (a
            # lax.while_loop) must not sit on the reverse-AD path. Gradients
            # w.r.t. material params flow through the throughput/attenuation
            # chain instead (detached-sampling estimator); the forward values
            # are unchanged.
            o_t = jax.lax.stop_gradient(o)
            d_t = jax.lax.stop_gradient(d)
            is_hit, p_w, n_w, uv, mat_id, hit_t = isect(geom, o_t, d_t,
                                                        alive)
            # Name the hit record so a save_only_these_names('isect')
            # remat policy can SAVE it: the closest-hit search feeds
            # nothing else, so the backward-pass recompute dead-code-
            # eliminates the entire traversal kernel (~83% of a bounce's
            # cost) instead of re-running it. Identity outside remat.
            from jax.ad_checkpoint import checkpoint_name
            is_hit, p_w, n_w, uv, mat_id, hit_t = jax.tree.map(
                lambda x: checkpoint_name(x, "isect"),
                (is_hit, p_w, n_w, uv, mat_id, hit_t))
            is_hit = is_hit & alive

            # miss: final += weight * background, terminate
            # (pathtrace.c:39-42)
            bg = bg_fn(params, d)
            take_bg = (alive & ~is_hit)[..., None]
            final = jnp.where(take_bg, final + weight * bg, final)

            # per-material tables via one-hot matmul: narrow per-lane
            # gathers run far below stream bandwidth on TPU, and K is tiny
            K = params.emission.shape[0]
            if K <= 64:
                oh = (mat_id[:, None] == jnp.arange(K, dtype=i32)[None, :]
                      ).astype(f32)
                mat_emission = oh @ params.emission
                mat_ior = oh @ params.ior
            else:
                mat_emission = params.emission[mat_id]
                mat_ior = params.ior[mat_id]
            # sanitize non-hit lanes: their hit data is garbage (t=FLT_MAX
            # -> inf positions), and any NaN intermediate poisons reverse-
            # mode AD even under where-masking (0 * NaN = NaN in the VJP)
            ih = is_hit[..., None]
            n_safe = jnp.where(ih, n_w, jnp.array([0.0, 0.0, 1.0], f32))
            p_safe = jnp.where(ih, p_w, f32(0.0))
            uv_safe = jnp.where(ih, uv, f32(0.0))
            t_safe = jnp.where(is_hit, hit_t, f32(1.0))
            rec = shading.HitRec(incident=d, normal=n_safe, uv=uv_safe,
                                 hit_point=p_safe, distance=t_safe,
                                 emission=mat_emission, ior=mat_ior,
                                 mat_id=mat_id,
                                 mat_oh=oh if K <= 64 else None)
            # hit: final += weight * legacy emission (pathtrace.c:44).
            # With NEE on, hits following an NEE-handled diffuse vertex
            # got their direct light from the shadow ray — suppress the
            # BSDF-path emission so light is not counted twice.
            if nee_fn is None:
                emit_ok = is_hit
            else:
                if K <= 64:
                    in_lt = (oh @ lights_mat_mask.astype(f32)) > f32(0.5)
                else:
                    in_lt = lights_mat_mask[mat_id]
                emit_ok = is_hit & ~(prev_nee & in_lt)
            final = jnp.where(emit_ok[..., None],
                              final + weight * mat_emission, final)

            is_nee_v = None
            if nee_fn is not None:
                delta_nee, s, is_nee_v = nee_fn(params, geom, rec, s,
                                                is_hit, weight)
                final = final + delta_nee

            if K <= 64:
                gid = (oh @ mat_graph.astype(f32)).astype(i32)
            else:
                gid = mat_graph[mat_id]
            # dead/missed lanes match NO graph: with the Morton-sorted
            # pool they cluster, so whole shade chunks skip every program
            gid = jnp.where(is_hit, gid, -1)
            out, attenuation, s2 = shade_all(params, rec, s, gid)
            s = smp.select_state(is_hit, s2, s)

            maxc = jnp.maximum(attenuation[..., 0],
                               jnp.maximum(attenuation[..., 1],
                                           attenuation[..., 2]))
            # the survival probability is a sampling decision, not a value
            # the estimator differentiates through (detached, like the lobe
            # choices inside the bsdfs)
            maxc = jax.lax.stop_gradient(maxc)
            if rr_phase == "dynamic":
                # Russian roulette gated by a traced flag (one compiled body
                # serves every depth under lax.scan)
                rr_dim, s3 = smp.get_dimension(kind, s)
                s = smp.select_state(is_hit & rr_active, s3, s)
                prob = jnp.where(rr_active, maxc,
                                 jnp.ones_like(maxc))
                rr_break = is_hit & rr_active & (rr_dim > prob)
            elif rr_phase:
                # Russian roulette (pathtrace.c:50-55)
                prob = maxc
                rr_dim, s3 = smp.get_dimension(kind, s)
                s = smp.select_state(is_hit, s3, s)
                rr_break = is_hit & (rr_dim > prob)
            else:
                prob = jnp.ones_like(maxc)
                rr_break = jnp.zeros_like(is_hit)

            survive = is_hit & ~rr_break
            # pathtrace.c:57: colorCoef(1/p, att*weight) — reciprocal
            # then multiply, NOT a division (different rounding);
            # exact_div keeps the reciprocal backend-bit-stable
            coef = vm.exact_div(
                f32(1.0), jnp.maximum(prob, f32(1e-30)))[..., None]
            weight = jnp.where(survive[..., None],
                               (attenuation * weight) * coef, weight)
            o = jnp.where(survive[..., None], p_w, o)
            d = jnp.where(survive[..., None], out, d)
            if checks and self._debug:
                # real invariants AFTER masking (transient masked NaNs in
                # the search are by-design and deliberately not checked).
                # Only the renderer's own checkified jits (self._jit) set
                # checks — checkify.check can't trace under a plain jit
                # (make_trace_fn's output is jitted by callers; debug_nans
                # still covers that path)
                from jax.experimental import checkify
                checkify.check(
                    jnp.all(jnp.isfinite(jnp.where(
                        survive[..., None], weight, f32(0.0)))),
                    "non-finite path weight after bounce (bsdf output, "
                    "attenuation, or RR divisor produced NaN/inf)")
                checkify.check(
                    jnp.all(jnp.isfinite(final)),
                    "non-finite accumulated radiance (emission or "
                    "background evaluated to NaN/inf)")
                checkify.check(
                    jnp.all(jnp.isfinite(jnp.where(
                        survive[..., None], d, f32(0.0)))),
                    "non-finite scattered direction out of a bsdf")
            if nee_fn is not None:
                return o, d, weight, final, s, survive, is_nee_v & survive
            if nee:
                # NEE requested but no sampleable light table (e.g. every
                # emitter excluded): plain integrator with the NEE step
                # signature so callers need not special-case
                return (o, d, weight, final, s, survive,
                        jnp.zeros_like(survive))
            return o, d, weight, final, s, survive
        return step

    # ------------------------------------------------------------------
    def census_schedule(self, xs, ys, spp: int = 4,
                        depth: int | None = None, safety: float = 1.3,
                        min_width: int = 1024, passes=None,
                        quant: int | None = None,
                        shrink_ratio: float = 1.0):
        """Measure live-lane counts per bounce depth with the forward
        integrator and derive a conservative compaction schedule
        [(start_depth, width), ...] for make_trace_fn(compaction=...).

        The schedule widths are next-pow2(max live over the probed passes
        x safety); identical sample streams mean the differentiable trace
        sees exactly the same live sets, so no path is ever dropped as
        long as the probed passes bound the rendered ones (they do for
        the same (xs, ys) batch; other pass indices vary only by RNG —
        hence the safety factor).

        VALIDITY OF TIGHT SAFETY FACTORS: Russian-roulette survival
        depends on shaded attenuation and hence on `params`, so an
        exact-pass census (safety near 1.0) is a true bound only when
        the rendered call uses the SAME params and pass set as this
        probe. In an optimization loop where params update every step,
        keep safety >= 1.3 (and probe all passes) for a schedule reused
        across steps. Either way the trace itself guards the contract:
        if live lanes ever exceed a segment width, the whole result is
        poisoned to NaN (loud) instead of paths being silently dropped
        (wrong image AND gradients); under CRAYTPU_DEBUG, jax_debug_nans
        then raises at the poisoning point.

        passes: explicit pass indices to probe (default range(spp)).
        When the caller probes EXACTLY the (pass_idx, spp) pairs it will
        render — the sampler streams are pure functions of (pass, spp,
        pixel) — the measured max is the true bound, so safety can drop
        to a hair above 1.0 and `quant` can replace the pow2 rounding:
        widths round up to a multiple of `quant` (e.g. 1024) instead of
        doubling. Width inflation is pure waste in the differentiable
        trace: shading runs at FULL segment width (dead lanes pay like
        live ones — only the search kernel skips dead blocks), and the
        backward pass recomputes + VJPs exactly that shading chain, so
        pow2 + 1.3x safety (~1.9x the true live width on average) nearly
        doubles fwd+bwd cost vs an exact schedule."""
        depth = depth if depth is not None else self.max_depth
        B = xs.shape[0]
        step = self._step_pre  # compiled; RR handled by _step_rr
        max_live = np.zeros(depth, np.int64)
        for p in (range(spp) if passes is None else passes):
            o, d, s = self._init_rays(xs, ys, i32(p), i32(spp))
            weight = jnp.ones((B, 4), f32)
            final = jnp.zeros((B, 4), f32)
            alive = jnp.ones(B, bool)
            for k in range(depth):
                fn = self._step_pre if k < 4 else self._step_rr
                o, d, weight, final, s, alive = fn(
                    self.cscene.params, self.cscene.geom,
                    self.cscene.shade, self.cscene.mat_graph,
                    o, d, weight, final, s, alive)
                n = int(jnp.sum(alive))
                max_live[k] = max(max_live[k], n)
                if n == 0:
                    break
        sched = [(0, B)]
        for k in range(depth):
            need = max(int(max_live[k] * safety), min_width)
            if quant:
                need = -(-need // quant) * quant
            else:
                need = _next_pow2(need)
            need = min(need, B)
            # a compaction boundary costs a partition + full-pool gather
            # at the CURRENT width — only shrink when it buys >=
            # (1 - shrink_ratio) of the segment cost (probed on TPU:
            # an every-depth exact schedule with 22 boundaries measured
            # 383k fwd+bwd paths/s vs 476k for ~9 gated ones)
            if need < sched[-1][1] * shrink_ratio:
                sched.append((k + 1, need))
        return sched

    def make_trace_fn(self, depth: int | None = None,
                      diff_geometry: bool = False,
                      remat: bool = False, nee: bool = False,
                      compaction=None, sort: bool = False):
        """Pure, jittable, differentiable fixed-depth trace.

        Returns trace(params, xs, ys, pass_idx, spp) -> (B, 4) radiance with
        the bounce loop scanned to `depth` (no host early-exit — terminated
        lanes idle masked). This is the function the multi-chip shard_map and
        the gradient path jit; geometry/shading tables are closed over.

        diff_geometry=True returns trace(params, tri_packed, xs, ys,
        pass_idx, spp) with the packed triangle rows as a differentiable
        input: the closest-hit SEARCH stays detached (its coefficient
        blocks are static — the detached-visibility estimator), while the
        winner's exact (t, u, v), normals and hit points recompute from
        tri_packed, so vertex gradients flow through shading. Requires the
        dense/flash traversal (the SIMT while_loop is not reverse-mode
        differentiable).
        """
        depth = depth if depth is not None else self.max_depth
        kind = self.kind
        width = self.width
        cam_fn = self.cam_fn
        step_dyn = self._make_step("dynamic", diff=diff_geometry, nee=nee)
        cs = self.cscene
        geom, shade, mat_graph = cs.geom, cs.shade, cs.mat_graph
        bg_fn = self.bg_fn
        empty = self.empty_scene
        # built OUTSIDE the traced function: _morton_key reads scene
        # bounds via np.asarray, which must see a concrete array
        sort_key_fn = self._morton_key() if sort else None
        # sort="boundary": Morton/octant re-sort ONLY at compaction
        # boundaries (~9 argsorts per trace instead of 50): the deep
        # segments otherwise run fully decohered rays — the kernel's
        # block-visit count is set by 768-lane bbox unions, and a
        # boundary sort re-tightens them for every bounce of the
        # following segment at a cost the segment amortizes
        boundary_sort = sort == "boundary"
        if boundary_sort:
            sort_key_fn = self._morton_key()
            sort = False

        def _trace(params, g, xs, ys, pass_idx, spp):
            B = xs.shape[0]
            # f32 quad tables: this is the gradient path (texel grads)
            params = cs.reg.make_ctx(params, packed=False)
            pix_idx = ys.astype(u32) * u32(width) + xs.astype(u32)
            s = smp.init_sampler(kind, jnp.broadcast_to(pass_idx, (B,)),
                                 jnp.broadcast_to(spp, (B,)), pix_idx)
            o, d, s = jax.vmap(cam_fn)(xs, ys, s)
            if empty or depth == 0:
                if depth == 0:
                    return jnp.zeros((B, 4), f32)
                return bg_fn(params, d)
            weight = jnp.ones((B, 4), f32)
            final = jnp.zeros((B, 4), f32)
            alive = jnp.ones(B, bool)

            if compaction:
                # ---- compaction-scheduled differentiable trace ----
                # The fixed-depth scan pays every bounce at full width
                # even though the live set shrinks geometrically (misses
                # + Russian roulette): 50 full-width bounces for ~7.4
                # real ones. With a conservative static width schedule
                # [(start_depth, width)...], the wavefront is packed
                # live-first (argsort indices are detached ints; the
                # SAME paths run with the SAME streams, so gradients are
                # identical to the plain trace as long as no width
                # overflows — use census_schedule() to derive safe
                # widths) and later bounces run at a fraction of the
                # cost. Radiance flushes into the full-width buffer by
                # original lane id at each width change (differentiable
                # scatter-add).
                sched = [(ds, min(w, B)) for ds, w in compaction
                         if ds < depth]
                if not sched or sched[0][0] != 0:
                    sched = [(0, B)] + sched
                if boundary_sort:
                    # split long segments with equal-width sort points:
                    # early bounces decohere fastest and the first
                    # segment is the widest — re-tightening the ray
                    # blocks there buys the most kernel time per sort
                    # (CRAYTPU_TRACE_SORT_EVERY bounces, default 2)
                    # swept on the bench config (fwd+bwd kpaths/s):
                    # 2 -> 549, 3 -> 565, 4 -> 559, 5 -> 531, 6 -> 544
                    import os as _os
                    every = int(_os.environ.get(
                        "CRAYTPU_TRACE_SORT_EVERY", "3"))
                    expanded = []
                    for si, (ds, w) in enumerate(sched):
                        de = sched[si + 1][0] if si + 1 < len(sched) \
                            else depth
                        expanded.append((ds, w))
                        k = ds + every
                        while k < de:
                            expanded.append((k, w))
                            k += every
                    sched = expanded
                bounds = [s0 for s0, _ in sched] + [depth]
                lane = jnp.arange(B, dtype=i32)
                delta = jnp.zeros((B, 4), f32)
                prev = jnp.zeros(B, bool) if nee else None
                # sort=True: Morton+octant re-sort of the live wavefront
                # at EVERY bounce (the persistent pool does this at each
                # refill; sortless there was 8x slower — coherence sets
                # the traversal kernel's block-visit count). The
                # permutation is a detached integer computation and the
                # radiance flush scatters by original lane id, so image
                # and gradients are bit-identical to the unsorted trace
                # (asserted in tests/test_trace_compact.py). lane ids
                # ride the scan carry so the flush survives in-body
                # permutes.
                key_fn = sort_key_fn

                def seg_body(carry, k):
                    o, d, w_, dl, s, al, ln = carry[:7]
                    pv = carry[7] if nee else None
                    if sort:
                        order = jnp.argsort(key_fn(o, d, al))
                        o, d, w_, dl = (o[order], d[order], w_[order],
                                        dl[order])
                        s = jax.tree.map(lambda x: x[order], s)
                        al, ln = al[order], ln[order]
                        if nee:
                            pv = pv[order]
                    if nee:
                        o, d, w_, dl, s, al, pv = step_dyn(
                            params, g, shade, mat_graph, o, d, w_, dl,
                            s, al, k >= 4, pv)
                        return (o, d, w_, dl, s, al, ln, pv), None
                    o, d, w_, dl, s, al = step_dyn(
                        params, g, shade, mat_graph, o, d, w_, dl,
                        s, al, k >= 4)
                    return (o, d, w_, dl, s, al, ln), None

                body_fn = (jax.checkpoint(seg_body) if remat is True
                           else seg_body)

                def live_first(al, w):
                    """Stable live-first partition order, O(n) prefix
                    sums instead of argsort (a 1M-lane sort per boundary
                    measured ~10x the cost of two cumsums + a scatter);
                    identical order to jnp.argsort(~al) (stable)."""
                    n = al.shape[0]
                    n_live = jnp.sum(al.astype(i32))
                    c = jnp.cumsum(al.astype(i32))
                    pos = jnp.where(al, c - 1,
                                    n_live + jnp.arange(n, dtype=i32)
                                    - c)
                    # pos is a permutation of arange(n) by construction
                    # (live lanes get 0..n_live-1, dead lanes the rest),
                    # so the mode="drop" scatter can never actually drop
                    return jnp.zeros(n, i32).at[pos].set(
                        jnp.arange(n, dtype=i32), mode="drop")[:w]

                for si, (ds, w) in enumerate(sched):
                    de = bounds[si + 1]
                    if w < alive.shape[0] or (boundary_sort and si > 0):
                        final = final.at[lane].add(delta)
                        # schedule-contract guard: truncating LIVE lanes
                        # would silently drop radiance and corrupt
                        # gradients (census_schedule docstring) — poison
                        # the result instead so violations fail loudly
                        # (and raise under CRAYTPU_DEBUG's debug_nans)
                        overflow = jnp.sum(alive.astype(i32)) > i32(w)
                        final = jnp.where(overflow,
                                          jnp.full_like(final, jnp.nan),
                                          final)
                        if boundary_sort:
                            # dead lanes get the max key, so a stable
                            # argsort is live-first AND Morton-coherent
                            order = jnp.argsort(
                                sort_key_fn(o, d, alive))[:w]
                        else:
                            order = live_first(alive, w)  # live-first
                        o, d, weight = o[order], d[order], weight[order]
                        s = jax.tree.map(lambda x: x[order], s)
                        alive, lane = alive[order], lane[order]
                        delta = jnp.zeros((w, 4), f32)
                        if nee:
                            prev = prev[order]
                    init = (o, d, weight, delta, s, alive, lane) + (
                        (prev,) if nee else ())
                    ks = jnp.arange(ds, de, dtype=i32)
                    if remat == "segment_hits":
                        # segment remat + SAVE the named hit records: the
                        # backward recompute then regenerates only the
                        # shading chain — the detached closest-hit search
                        # (~83% of a bounce) is dead code in the rematted
                        # jaxpr and never re-runs. Memory = hit records
                        # per bounce at the segment's compacted width
                        # (~45 B/lane/bounce; ~0.4 GB at 1080p/50 bounces
                        # under the census schedule) vs a 2x-forward
                        # recompute saved (measured in BENCH fwd_bwd).
                        pol = jax.checkpoint_policies.save_only_these_names(
                            "isect")
                        carry, _ = jax.checkpoint(
                            lambda ini, _ks=ks: jax.lax.scan(
                                seg_body, ini, _ks), policy=pol)(init)
                    elif remat == "segment":
                        # one recompute per SEGMENT in the backward pass
                        # (k x cheaper than per-bounce remat; peak memory
                        # = one segment's residuals at this width)
                        carry, _ = jax.checkpoint(
                            lambda ini, _ks=ks: jax.lax.scan(
                                seg_body, ini, _ks))(init)
                    else:
                        carry, _ = jax.lax.scan(body_fn, init, ks)
                    o, d, weight, delta, s, alive, lane = carry[:7]
                    if nee:
                        prev = carry[7]
                return final.at[lane].add(delta)

            if nee:
                def body(carry, k):
                    o, d, weight, final, s, alive, prev = carry
                    o, d, weight, final, s, alive, prev = step_dyn(
                        params, g, shade, mat_graph, o, d, weight, final,
                        s, alive, k >= 4, prev)
                    return (o, d, weight, final, s, alive, prev), None
                init = (o, d, weight, final, s, alive,
                        jnp.zeros(B, bool))
            else:
                def body(carry, k):
                    o, d, weight, final, s, alive = carry
                    o, d, weight, final, s, alive = step_dyn(
                        params, g, shade, mat_graph, o, d, weight, final,
                        s, alive, k >= 4)
                    return (o, d, weight, final, s, alive), None
                init = (o, d, weight, final, s, alive)

            if remat:
                # rematerialize each bounce in the backward pass: the
                # residuals of a deep scan (hit records, shading temps per
                # bounce) would otherwise exhaust HBM at 1080p batch sizes.
                # "segment_hits" keeps the named hit records resident so
                # the recompute skips the search (see the compaction path).
                if remat == "segment_hits":
                    body = jax.checkpoint(
                        body,
                        policy=jax.checkpoint_policies
                        .save_only_these_names("isect"))
                else:
                    body = jax.checkpoint(body)

            carry, _ = jax.lax.scan(body, init,
                                    jnp.arange(depth, dtype=i32))
            return carry[3]

        if diff_geometry:
            def trace_g(params, tri_packed, xs, ys, pass_idx, spp):
                return _trace(params, geom._replace(tri_packed=tri_packed),
                              xs, ys, pass_idx, spp)
            return trace_g

        def trace(params, xs, ys, pass_idx, spp):
            return _trace(params, geom, xs, ys, pass_idx, spp)
        return trace

    def trace_rays_fn(self, depth: int | None = None):
        """trace_rays(params, o, d, s) -> (B, 4) radiance for explicit
        rays + sampler states (no camera): used by the edge-gradient
        boundary estimator's side evaluations (ops/edge_grad.py)."""
        depth = depth if depth is not None else self.max_depth
        step_dyn = self._make_step("dynamic")
        cs = self.cscene
        geom, shade, mat_graph = cs.geom, cs.shade, cs.mat_graph

        def trace_rays(params, o, d, s):
            B = o.shape[0]
            # f32 quad tables: edge-gradient side evaluations may be
            # differentiated w.r.t. params
            params = cs.reg.make_ctx(params, packed=False)
            weight = jnp.ones((B, 4), f32)
            final = jnp.zeros((B, 4), f32)
            alive = jnp.ones(B, bool)

            def body(carry, k):
                o, d, weight, final, s, alive = carry
                o, d, weight, final, s, alive = step_dyn(
                    params, geom, shade, mat_graph, o, d, weight, final,
                    s, alive, k >= 4)
                return (o, d, weight, final, s, alive), None

            (o, d, weight, final, s, alive), _ = jax.lax.scan(
                body, (o, d, weight, final, s, alive),
                jnp.arange(depth, dtype=i32))
            return final
        return trace_rays

    def _make_compact(self):
        """Sort the wavefront by a spatial key (dead lanes last) and gather
        into Bn slots. Spatially sorted blocks make the flash kernel's
        per-block bbox culling effective on incoherent secondary rays."""
        bb = np.asarray(self.cscene.geom.node_bounds[0])
        lo = jnp.asarray(bb[[0, 2, 4]])
        ext = np.maximum(bb[[1, 3, 5]] - bb[[0, 2, 4]], 1e-6)
        inv_ext = jnp.asarray((127.0 / ext).astype(np.float32))

        def spread3(x):
            # space 7 bits out to every 3rd position (morton component)
            x = (x | (x << 8)) & 0x0100F00F
            x = (x | (x << 4)) & 0x10C30C3
            x = (x | (x << 2)) & 0x9249249
            return x

        def compact(o, d, weight, s, alive, lane, pdepth, Bn):
            q = jnp.clip(((o - lo) * inv_ext), 0.0, 127.0).astype(jnp.uint32)
            octant = ((d[:, 0] < 0) + 2 * (d[:, 1] < 0)
                      + 4 * (d[:, 2] < 0)).astype(jnp.uint32)
            key = (spread3(q[:, 0]) | (spread3(q[:, 1]) << 1)
                   | (spread3(q[:, 2]) << 2)) | (octant << 21)
            key = jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
            order = jnp.argsort(key)[:Bn]
            return (o[order], d[order], weight[order],
                    jax.tree.map(lambda x: x[order], s), lane[order],
                    pdepth[order])

        return {}, compact

    def trace_batch(self, xs, ys, pass_idx: int, spp: int):
        """Trace one pass for a flat batch of pixel coords -> (B, 4).

        Stream compaction + spatial sort: the live wavefront shrinks
        geometrically with depth (background misses + Russian roulette),
        so after each bounce the survivors are sorted by a Morton/octant
        key (making ray blocks coherent for the kernel's bbox culling) and
        packed into a quarter-step power-of-two bucket; radiance deltas
        scatter-add back into the full-size buffer by original lane id.
        """
        B = xs.shape[0]
        o, d, s = self._init_rays(xs, ys, i32(pass_idx), i32(spp))
        if self.empty_scene or self.max_depth == 0:
            if self.max_depth == 0:
                return jnp.zeros((B, 4), f32)
            return self._bg_only(self.cscene.params, d)

        if getattr(self, "_compact", None) is None:
            _, self._compact = self._make_compact()
            self._compact = jax.jit(self._compact, static_argnums=(7,))

        weight = jnp.ones((B, 4), f32)
        final = jnp.zeros((B, 4), f32)
        alive = jnp.ones(B, bool)
        lane = jnp.arange(B, dtype=i32)
        pdepth = jnp.zeros(B, i32)
        cs = self.cscene
        depth = 0
        while depth < self.max_depth:
            Bc = alive.shape[0]
            # fuse more bounces per dispatch as the wavefront shrinks: the
            # dispatch+sync floor dwarfs the compute at small sizes
            k = 1 if Bc > 32768 else (4 if Bc > 4096 else 8)
            k = min(k, self.max_depth - depth)
            o, d, weight, s, alive, pdepth, final, n_live = \
                self._multi_step(k)(
                    cs.params, cs.geom, cs.shade, cs.mat_graph,
                    o, d, weight, s, alive, pdepth, final, lane)
            depth += k
            # Synchronize here: early exit + keeps the dispatch queue
            # shallow (long async queues destabilize the tunnel).
            n_alive = int(n_live)
            if n_alive == 0:
                break
            # quarter-step buckets only (Bc/4, Bc/16, ...): every bucket
            # size is a fresh XLA compile of the whole bounce step, so
            # keep the set small
            need = max(_next_pow2(n_alive), 1024)
            Bn = Bc
            while Bn // 4 >= need:
                Bn //= 4
            o, d, weight, s, lane, pdepth = self._compact(
                o, d, weight, s, alive, lane, pdepth, Bn)
            alive = jnp.arange(Bn, dtype=i32) < n_alive
        return final

    @property
    def _pixel_schedule(self):
        """Tile-ordered pixel permutation (xs, ys, flat_idx), padded to a
        whole number of fixed-size ray batches. Cached."""
        if getattr(self, "_sched", None) is None:
            from craytpu.runtime.tile import pixel_order
            p = self.cscene.prefs
            xs, ys, tiles, offsets = pixel_order(
                self.width, self.height, p.tile_width, p.tile_height,
                p.tile_order)
            npix = self.width * self.height
            T = min(self.tile_rays, _next_pow2(npix))
            if npix % T:
                pad = T - npix % T
                xs = np.concatenate([xs, np.zeros(pad, np.int32)])
                ys = np.concatenate([ys, np.zeros(pad, np.int32)])
            flat = ys.astype(np.int64) * self.width + xs.astype(np.int64)
            self._sched = (jnp.asarray(xs), jnp.asarray(ys),
                           jnp.asarray(flat), T, tiles, offsets)
        return self._sched

    def render_pass(self, accum, pass_idx: int, spp: int, on_batch=None):
        H, W = self.height, self.width
        npix = H * W
        xs, ys, flat, T, _, _ = self._pixel_schedule
        N = xs.shape[0]
        sample = jnp.zeros((npix, 4), f32)
        for t0 in range(0, N, T):
            chunk = self.trace_batch(xs[t0:t0 + T], ys[t0:t0 + T],
                                     pass_idx, spp)
            # padded lanes re-trace pixel (0,0) with the same per-(pixel,
            # pass) stream, so their duplicate scatter writes the identical
            # value the true (0,0) lane writes
            sample = sample.at[flat[t0:t0 + T]].set(chunk)
            if on_batch is not None:
                on_batch(min(t0 + T, npix), npix)
        sample = sample.reshape(H, W, 4)
        n = f32(pass_idx + 1)
        return (accum * (n - f32(1.0)) + sample) / n

    def render(self, spp: int | None = None, progress=None):
        spp = spp if spp is not None else self.cscene.prefs.sample_count
        accum = jnp.zeros((self.height, self.width, 4), f32)
        for p in range(spp):
            accum = self.render_pass(accum, p, spp)
            if progress is not None:
                progress(p + 1, spp, accum)
        return jax.device_get(accum)

    # ------------------------------------------------------------------
    # persistent wavefront: the pool stays full across tiles AND passes
    # ------------------------------------------------------------------
    def _pool_step(self, k: int):
        """k bounces over the persistent pool in ONE dispatch. Radiance
        accumulates into a PER-LANE delta buffer (flushed to the pixel
        framebuffer only at refill boundaries — the 262k->2M scatter-add
        is far too expensive to pay per bounce)."""
        key = ("pool", k)
        if key not in self._multi_cache:
            step_dyn = self._make_step("dynamic", checks=True,
                                       nee=self.nee)
            max_depth = self.max_depth
            nee = self.nee

            def multi(params, geom, shade, mat_graph, o, d, weight, s,
                      alive, pdepth, delta):
                params = self.cscene.reg.make_ctx(params)  # hoisted
                def body(carry, _):
                    o, d, w, dl, s, alive, pd = carry
                    if nee:
                        depth = pd & i32(0xFFFF)
                        prev = (pd >> 16) > 0
                        alive = alive & (depth < max_depth)
                        o, d, w, dl, s, alive, prev = step_dyn(
                            params, geom, shade, mat_graph, o, d, w, dl,
                            s, alive, depth >= 4, prev)
                        return (o, d, w, dl, s, alive,
                                (depth + 1) | (prev.astype(i32) << 16)), \
                            None
                    # per-path bounce cap (prefs.bounces): the persistent
                    # pool has no outer depth loop to enforce it
                    alive = alive & (pd < max_depth)
                    o, d, w, dl, s, alive = step_dyn(
                        params, geom, shade, mat_graph, o, d, w, dl, s,
                        alive, pd >= 4)
                    return (o, d, w, dl, s, alive, pd + 1), None

                (o, d, weight, delta, s, alive, pdepth), _ = jax.lax.scan(
                    body, (o, d, weight, delta, s, alive, pdepth),
                    None, length=k)
                return (o, d, weight, s, alive, pdepth, delta,
                        jnp.sum(alive, dtype=i32))

            self._multi_cache[key] = self._jit(
                multi, donate_argnums=(4, 5, 6, 7, 8, 9, 10))
        return self._multi_cache[key]

    def _prime_dev(self, B: int):
        """Initial pool fill generated ON DEVICE from the queue head (same
        math as _flush_pack_refill's fresh-ray block). The host-id prime
        (take(B)) ships ~16 MB of ray data host->device — measured ~1.2 s
        of device idle at render start over the tunneled chip; this is
        one dispatch with zero H2D payload."""
        key = ("prime_dev", B)
        if key not in self._multi_cache:
            sched = self._sched_dev
            npix = self.width * self.height
            kind = self.kind
            cam_fn = self.cam_fn

            def prime(qpix, qpass, take_n, spp):
                i = jnp.arange(B, dtype=i32)
                px_i = qpix + i
                fpass = qpass + px_i // npix
                px = px_i % npix
                rows = sched[px]
                fxs, fys, flane = rows[:, 0], rows[:, 1], rows[:, 2]
                fs = smp.init_sampler(kind, fpass,
                                      jnp.broadcast_to(spp, (B,)),
                                      flane.astype(u32))
                fo, fd, fs = jax.vmap(cam_fn)(fxs, fys, fs)
                falive = i < take_n
                return fo, fd, fs, flane, fpass, falive

            self._multi_cache[key] = jax.jit(prime)
        return self._multi_cache[key]

    # pools at or below this width drain in ONE device-side while_loop
    # dispatch instead of a host loop (each host drain iteration pays a
    # blocking live-count fetch — ~29 ms RTT over the tunneled chip, ~1 s
    # per render across the whole drain tail). 262144 catches the first
    # quarter-shrink of a 1M pool; the dispatch stays bounded (~20 live
    # while iterations at ~20 ms) well under the TPU watchdog
    DRAIN_DEV_MAX = int(os.environ.get("CRAYTPU_DRAIN_DEV_MAX", "262144"))

    def _drain_all(self):
        """Run the pool to extinction in ONE dispatch: lax.while_loop of
        the dynamic-RR bounce step until every lane is dead. Used for the
        end-of-queue drain tail once the pool has shrunk (bounded work:
        <= DRAIN_DEV_MAX lanes x remaining bounce cap)."""
        key = ("drain_all",)
        if key not in self._multi_cache:
            step_dyn = self._make_step("dynamic", checks=True,
                                       nee=self.nee)
            max_depth = self.max_depth
            nee = self.nee

            def drain(params, geom, shade, mat_graph, o, d, weight, s,
                      alive, pdepth, delta):
                params = self.cscene.reg.make_ctx(params)  # hoisted

                def cond(carry):
                    return jnp.any(carry[5])

                def body(carry):
                    o, d, w, dl, s, alive, pd = carry
                    if nee:
                        depth = pd & i32(0xFFFF)
                        prev = (pd >> 16) > 0
                        alive = alive & (depth < max_depth)
                        o, d, w, dl, s, alive, prev = step_dyn(
                            params, geom, shade, mat_graph, o, d, w, dl,
                            s, alive, depth >= 4, prev)
                        return (o, d, w, dl, s, alive,
                                (depth + 1) | (prev.astype(i32) << 16))
                    alive = alive & (pd < max_depth)
                    o, d, w, dl, s, alive = step_dyn(
                        params, geom, shade, mat_graph, o, d, w, dl, s,
                        alive, pd >= 4)
                    return (o, d, w, dl, s, alive, pd + 1)

                (o, d, weight, delta, s, alive, pdepth) = \
                    jax.lax.while_loop(
                        cond, body,
                        (o, d, weight, delta, s, alive, pdepth))
                return o, d, weight, s, alive, pdepth, delta

            self._multi_cache[key] = self._jit(
                drain, donate_argnums=(4, 5, 6, 7, 8, 9, 10))
        return self._multi_cache[key]

    def _morton_key(self):
        """Spatial+octant sort key (dead lanes -> max key, so a stable
        argsort is simultaneously the alive-first pack)."""
        import os as _os
        bb = np.asarray(self.cscene.geom.node_bounds[0])
        lo = jnp.asarray(bb[[0, 2, 4]])
        ext = np.maximum(bb[[1, 3, 5]] - bb[[0, 2, 4]], 1e-6)
        # spatial resolution: octant-major leaves 29 bits for the morton
        # code -> up to 9 bits/axis (pos-major keys shift by 3, also ok)
        bits = min(int(_os.environ.get("CRAYTPU_SORT_BITS", "9")), 9)
        top = float((1 << bits) - 1)
        inv_ext = jnp.asarray((top / ext).astype(np.float32))

        def spread3(x):
            # 10-bit 3-way bit spread (Morton), classic mask sequence
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x

        mode = _os.environ.get("CRAYTPU_SORT_KEY", "octant")
        if mode == "dirfine":
            # direction-major key: octant + 2x2 sub-octant bits of the
            # normalized |d| simplex, THEN an 8-bit/axis Morton code.
            # Hypothesis (docs/kernel_perf_analysis.md #1): kernel visits
            # are set by the UNION of blocks a ray block needs; rays from
            # nearby origins but spread directions still union many
            # superblocks, so trading 1 bit/axis of position resolution
            # for 4 bits of direction could shrink the union.
            dbits = min(bits, 8)
            dtop = float((1 << dbits) - 1)
            dinv_ext = jnp.asarray((dtop / ext).astype(np.float32))

            def key_fn(o, d, alive):
                q = jnp.clip(((o - lo) * dinv_ext), 0.0, dtop).astype(u32)
                ax, ay, az = (jnp.abs(d[:, 0]), jnp.abs(d[:, 1]),
                              jnp.abs(d[:, 2]))
                asum = jnp.maximum(ax + ay + az, 1e-20)
                qx = jnp.minimum((ax / asum * 4).astype(u32), u32(3))
                qy = jnp.minimum((ay / asum * 4).astype(u32), u32(3))
                octant = ((d[:, 0] < 0) + 2 * (d[:, 1] < 0)
                          + 4 * (d[:, 2] < 0)).astype(u32)
                dirk = (octant << 4) | (qx << 2) | qy
                m = (spread3(q[:, 0]) | (spread3(q[:, 1]) << 1)
                     | (spread3(q[:, 2]) << 2))
                key = (dirk << (3 * dbits)) | m
                return jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
            return key_fn
        pos_major = mode == "pos"

        def key_fn(o, d, alive):
            q = jnp.clip(((o - lo) * inv_ext), 0.0, top).astype(u32)
            octant = ((d[:, 0] < 0) + 2 * (d[:, 1] < 0)
                      + 4 * (d[:, 2] < 0)).astype(u32)
            m = (spread3(q[:, 0]) | (spread3(q[:, 1]) << 1)
                 | (spread3(q[:, 2]) << 2))
            key = ((m << 3) | octant if pos_major
                   else m | (octant << (3 * bits)))
            return jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
        return key_fn

    def _permute_pool(self, order, o, d, weight, delta, s, alive, lane,
                      lpass, pdepth):
        """Apply a lane permutation through TWO wide stacked gathers.
        TPU gathers retire ~1 element/cycle whatever the row width, so
        permuting the 11 pool arrays one by one costs more than the
        bounce step itself; stacked rows amortize the descriptor cost
        AND every dropped column is a real element saved. For the
        RANDOM sampler (the batch default) only pcg_hi/pcg_lo of the
        sampler state are ever read (get_dimension touches nothing
        else; init_sampler rebuilds fresh lanes), so its rnd_offset /
        curr_prime / curr_pass / max_passes columns are reconstructed
        as zeros instead of permuted: 24 -> 19 elements/lane."""
        from craytpu.ops.sampler import SamplerState
        slim = self.kind == smp.RANDOM
        B = o.shape[0]
        if slim:
            F = jnp.concatenate([o, d, weight, delta], axis=1)[order]
            I = jnp.stack(
                [s.pcg_hi.view(i32), s.pcg_lo.view(i32), lane, lpass,
                 pdepth, alive.astype(i32)], axis=1)[order]
            z = jnp.zeros(B, i32)
            s2 = SamplerState(pcg_hi=I[:, 0].view(u32),
                              pcg_lo=I[:, 1].view(u32),
                              rnd_offset=z.astype(f32), curr_prime=z,
                              curr_pass=z, max_passes=z)
            return (F[:, 0:3], F[:, 3:6], F[:, 6:10], F[:, 10:14], s2,
                    I[:, 5].astype(bool), I[:, 2], I[:, 3], I[:, 4])
        F = jnp.concatenate(
            [o, d, weight, delta,
             s.rnd_offset.astype(f32)[:, None]], axis=1)[order]
        I = jnp.stack(
            [s.pcg_hi.view(i32), s.pcg_lo.view(i32),
             s.curr_prime.astype(i32), s.curr_pass.astype(i32),
             s.max_passes.astype(i32), lane, lpass, pdepth,
             alive.astype(i32)], axis=1)[order]
        s2 = SamplerState(pcg_hi=I[:, 0].view(u32), pcg_lo=I[:, 1].view(u32),
                          rnd_offset=F[:, 14], curr_prime=I[:, 2],
                          curr_pass=I[:, 3], max_passes=I[:, 4])
        return (F[:, 0:3], F[:, 3:6], F[:, 6:10], F[:, 10:14], s2,
                I[:, 8].astype(bool), I[:, 5], I[:, 6], I[:, 7])

    @property
    def _sched_dev(self):
        """Device-resident pixel schedule: (npix, 4) i32 rows
        [x, y, flat_pixel_id, 0] in tile order (one wide gather serves a
        whole refill quantum)."""
        if getattr(self, "_sched_dev_arr", None) is None:
            npix = self.width * self.height
            xs, ys, _, _, _, _ = self._pixel_schedule
            xs = np.asarray(xs[:npix], np.int32)
            ys = np.asarray(ys[:npix], np.int32)
            flat = (ys.astype(np.int64) * self.width + xs).astype(np.int32)
            self._sched_dev_arr = jnp.asarray(
                np.stack([xs, ys, flat, np.zeros(npix, np.int32)], axis=1))
        return self._sched_dev_arr

    def _flush_pack_refill(self, B: int, m: int, Q: int):
        """One fused dispatch at a refill boundary:
          1. Morton/octant sort the pool (dead lanes last): spatially
             coherent ray blocks keep the flash kernel's bbox culling
             effective on bounced rays (measured 95 -> 36 ms per step)
          2. scatter-add the radiance deltas of ONLY the dead lanes being
             overwritten by fresh rays (all tail slots are dead:
             n_alive <= B - m*Q via the lagged live count). Live lanes
             keep their partial sums so an interrupt checkpoint can
             re-enqueue them without double counting; other dead lanes
             ride until a later refill overwrites them.
          3. generate m*Q fresh primaries ON DEVICE from the queue
             position (pixel schedule gather + sampler init + camera
             rays — no host round trip, no H2D transfer) and insert them
             at the tail.
        """
        key = ("fpr", B, m, Q)
        if key not in self._multi_cache:
            key_fn = self._morton_key()
            sched = self._sched_dev
            npix = self.width * self.height
            kind = self.kind
            cam_fn = self.cam_fn

            def fpr(final, o, d, weight, s, alive, lane, lpass, pdepth,
                    delta, qpix, qpass, take_n, spp):
                order = jnp.argsort(key_fn(o, d, alive))
                (o, d, weight, delta, s, alive, lane, lpass,
                 pdepth) = self._permute_pool(order, o, d, weight, delta,
                                              s, alive, lane, lpass, pdepth)

                start = B - m * Q
                final = final.at[lane[start:]].add(delta[start:])

                # fresh primaries from the queue [qpos, qpos + m*Q)
                i = jnp.arange(m * Q, dtype=i32)
                px_i = qpix + i
                fpass = qpass + px_i // npix
                px = px_i % npix
                rows = sched[px]                    # one wide gather
                fxs, fys, flane = rows[:, 0], rows[:, 1], rows[:, 2]
                pix_idx = flane.astype(u32)
                fs = smp.init_sampler(kind, fpass,
                                      jnp.broadcast_to(spp, (m * Q,)),
                                      pix_idx)
                fo, fd, fs = jax.vmap(cam_fn)(fxs, fys, fs)
                falive = i < take_n

                def ins(a, f):
                    return jax.lax.dynamic_update_slice_in_dim(
                        a, f, start, axis=0)

                o, d = ins(o, fo), ins(d, fd)
                weight = ins(weight, jnp.ones((m * Q, 4), f32))
                s = jax.tree.map(ins, s, fs)
                lane, lpass = ins(lane, flane), ins(lpass, fpass)
                pdepth = ins(pdepth, jnp.zeros(m * Q, i32))
                alive = ins(alive, falive)
                delta = ins(delta, jnp.zeros((m * Q, 4), f32))
                return (final, o, d, weight, s, alive, lane, lpass,
                        pdepth, delta)

            self._multi_cache[key] = jax.jit(
                fpr, donate_argnums=tuple(range(10)))
        return self._multi_cache[key]

    def _flush_pack_refill_host(self, B: int, m: int, Q: int):
        """Like _flush_pack_refill but takes host-prepared fresh rays —
        used only when resuming with re-enqueued pending paths (whose ids
        are not a contiguous queue range)."""
        key = ("fprh", B, m, Q)
        if key not in self._multi_cache:
            key_fn = self._morton_key()

            def fprh(final, o, d, weight, s, alive, lane, lpass, pdepth,
                     delta, fo, fd, fs, flane, fpass, falive):
                order = jnp.argsort(key_fn(o, d, alive))
                (o, d, weight, delta, s, alive, lane, lpass,
                 pdepth) = self._permute_pool(order, o, d, weight, delta,
                                              s, alive, lane, lpass, pdepth)
                start = B - m * Q
                final = final.at[lane[start:]].add(delta[start:])

                def ins(a, f):
                    return jax.lax.dynamic_update_slice_in_dim(
                        a, f, start, axis=0)

                o, d = ins(o, fo), ins(d, fd)
                weight = ins(weight, jnp.ones((m * Q, 4), f32))
                s = jax.tree.map(ins, s, fs)
                lane, lpass = ins(lane, flane), ins(lpass, fpass)
                pdepth = ins(pdepth, jnp.zeros(m * Q, i32))
                alive = ins(alive, falive)
                delta = ins(delta, jnp.zeros((m * Q, 4), f32))
                return (final, o, d, weight, s, alive, lane, lpass,
                        pdepth, delta)

            self._multi_cache[key] = jax.jit(
                fprh, donate_argnums=tuple(range(10)))
        return self._multi_cache[key]

    def _final_flush(self):
        if ("flush",) not in self._multi_cache:
            def fl(final, lane, delta, alive):
                # flush only DEAD lanes' radiance (live lanes are in-flight
                # paths whose partial sums must not hit the framebuffer —
                # the SIGINT checkpoint path re-enqueues them instead)
                z = jnp.where(alive[..., None], f32(0.0), delta)
                return final.at[lane].add(z)
            self._multi_cache[("flush",)] = jax.jit(fl, donate_argnums=(0,))
        return self._multi_cache[("flush",)]

    def _pack_shrink(self, Bn: int):
        """Flush dead lanes' radiance, Morton-sorted alive-first pack,
        then truncate the pool to Bn lanes (drain phase). The flush must
        happen HERE: truncation drops dead lanes, and their deltas are
        only ever flushed at pack boundaries."""
        key = ("shrink", Bn)
        if key not in self._multi_cache:
            key_fn = self._morton_key()

            def ps(final, o, d, weight, s, alive, lane, lpass, pdepth,
                   delta):
                dead_delta = jnp.where(alive[..., None], f32(0.0), delta)
                final = final.at[lane].add(dead_delta)
                delta = jnp.where(alive[..., None], delta, f32(0.0))
                order = jnp.argsort(key_fn(o, d, alive))[:Bn]
                (o, d, weight, delta, s, alive, lane, lpass,
                 pdepth) = self._permute_pool(order, o, d, weight, delta,
                                              s, alive, lane, lpass, pdepth)
                return (final, o, d, weight, s, alive, lane, lpass,
                        pdepth, delta)
            self._multi_cache[key] = jax.jit(ps, donate_argnums=(0,))
        return self._multi_cache[key]

    def render_persistent(self, spp: int | None = None, progress=None,
                          resume=None, interrupt=None, on_frame=None,
                          fetch=True):
        """Full render as ONE persistent wavefront: a fixed pool of
        tile_rays lanes; dead lanes are replaced by fresh (pixel, pass)
        primaries from the queue, so every dispatch runs near-full
        occupancy across tile and pass boundaries (no per-pass drain).
        Same per-(pixel, pass) streams as render(), same result up to
        float accumulation order.

        The host loop is PIPELINED: the live count of step i is fetched
        asynchronously and consumed one step late, so the device never
        idles on the host round trip (the dominant per-step cost over the
        device tunnel). The lagged count only ever overestimates the live
        set, so refill decisions stay safe.

        resume: optional dict from a persistent checkpoint
        (runtime/checkpoint.py): {final_sum (npix,4), qpos, pending} where
        pending is an (n,) int64 array of in-flight queue ids to re-trace.
        interrupt: optional callable polled once per refill boundary; when
        it returns True the render stops and returns
        (final_sum, qpos, pending_qids) for checkpointing instead of the
        finished frame.
        """
        spp = spp if spp is not None else self.cscene.prefs.sample_count
        H, W = self.height, self.width
        npix = H * W
        if self.empty_scene or self.max_depth == 0:
            acc = jnp.zeros((H, W, 4), f32)
            for p in range(spp):
                acc = self.render_pass(acc, p, spp)
            return jax.device_get(acc)
        # CRAYTPU_POOL_STATS=1: host-loop phase accounting (approximate —
        # the loop runs one step behind the device via the lag-1 count,
        # so per-iteration wall time tracks device time closely)
        import os as _os
        import time as _time
        stats_on = _os.environ.get("CRAYTPU_POOL_STATS")
        # CRAYTPU_POOL_SYNC=1 (profiling only): block after every
        # dispatch so stats attribute WALL time per phase — changes
        # pipelining, so never use for the benchmark number itself
        sync_on = stats_on and _os.environ.get("CRAYTPU_POOL_SYNC")
        stats = {"step": [0, 0.0], "refill": [0, 0.0],
                 "shrink": [0, 0.0], "other": [0, 0.0],
                 "occ_sum": 0.0, "lane_bounces": 0.0}

        def _acct(phase, key, out):
            if sync_on:
                t0 = _time.perf_counter()
                jax.block_until_ready(out)
                dt = _time.perf_counter() - t0
                stats[phase][1] += dt
                hist[key + ("s",)] = hist.get(key + ("s",), 0.0) + dt
        # host pixel schedule, fetched lazily: only the host-id refill
        # path (pending-id resumes) reads it, and the D->H copy costs
        # ~0.4 s over the tunneled chip — never pay it on the fast path
        def sched_host():
            if getattr(self, "_sched_host", None) is None:
                xs_f, ys_f, _, _, _, _ = self._pixel_schedule
                self._sched_host = (np.asarray(xs_f[:npix]),
                                    np.asarray(ys_f[:npix]))
            return self._sched_host
        B = min(self.tile_rays, _next_pow2(npix))
        # refill quantum: swept at 1080p (r3): B//4 -> 810k paths/s,
        # B//8 -> 930k, B//16 -> 993k, B//32 -> 889k. Finer quanta refill
        # sooner after the burn-in deaths and ship less fresh-gen work
        # per dispatch (m still caps the batch at 8 quanta);
        # CRAYTPU_POOL_QDIV overrides for experiments
        Q = B // int(_os.environ.get("CRAYTPU_POOL_QDIV", "16"))
        cs = self.cscene
        # hoist the shading context (quad-row texture tables) out of the
        # per-bounce dispatch: params are constant for the whole render
        # and make_ctx is idempotent inside the step, so building it once
        # here saves the ~2 ms/dispatch table rebuild. The jit WRAPPER is
        # cached too: a fresh jax.jit(...) per render re-traced and
        # re-compiled make_ctx every call (~0.5 s inside the timed render)
        if ("ctx_jit",) not in self._multi_cache:
            self._multi_cache[("ctx_jit",)] = jax.jit(cs.reg.make_ctx)
        params_ctx = self._multi_cache[("ctx_jit",)](cs.params)
        import os
        k_env = os.environ.get("CRAYTPU_POOL_K")
        k = int(k_env) if k_env else 1
        force_k = bool(k_env)   # explicit k disables the drain fusion

        total = npix * spp
        from craytpu.runtime.checkpoint import GidQueue
        final = jnp.zeros((npix, 4), f32)
        if resume is not None:
            final = jnp.asarray(resume["final_sum"], f32).reshape(npix, 4)
            queue = GidQueue(pending=resume["pending"],
                             ranges=resume["ranges"])
        else:
            queue = GidQueue(ranges=[[0, total]])

        def take(n):
            """Next n queue entries as fresh primaries (+ alive mask).
            Entries past the end of the queue are padded dead."""
            ids = queue.take(n)
            took = ids.shape[0]
            ids_pad = np.concatenate(
                [ids, np.zeros(n - took, np.int64)]) if took < n else ids
            px = ids_pad % npix
            xs_f, ys_f = sched_host()
            xs = jnp.asarray(xs_f[px])
            ys = jnp.asarray(ys_f[px])
            passes = jnp.asarray((ids_pad // npix).astype(np.int32))
            o, d, s = self._init_rays(xs, ys, passes, i32(spp))
            lane = jnp.asarray((ys_f[px].astype(np.int64) * W
                                + xs_f[px]).astype(np.int32))
            falive = jnp.asarray(np.arange(n) < took)
            return o, d, s, lane, passes, falive, took

        def queue_left():
            return queue.left()

        # prime the pool — device-generated from the queue head when the
        # head is a contiguous range (always, except pending-id resumes)
        if not queue.pending and queue.ranges:
            lo, hi = queue.ranges[0]
            took = min(B, hi - lo)
            o, d, s, lane, lpass, alive = self._prime_dev(B)(
                np.int32(lo % npix), np.int32(lo // npix),
                np.int32(took), i32(spp))
            queue.ranges[0][0] += took
            if queue.ranges[0][0] >= hi:
                queue.ranges.pop(0)
        else:
            o, d, s, lane, lpass, alive, took = take(B)
        weight = jnp.ones((B, 4), f32)
        pdepth = jnp.zeros(B, i32)
        delta = jnp.zeros((B, 4), f32)
        stale_n = took                 # lagged upper bound on live lanes
        counts: list = []              # in-flight [count_array, adjust]
        hist: dict = {}
        t_start = _time.perf_counter()
        while True:
            Bc = alive.shape[0]
            # drain phase: fuse more bounces per dispatch as the pool
            # shrinks (dispatch+sync floor dwarfs compute at small sizes)
            kc = k if (force_k or Bc > 32768) else (4 if Bc > 4096 else 8)
            if stats_on:
                hkey = ("step", Bc, kc)
                hist[hkey] = hist.get(hkey, 0) + 1
                stats["occ_sum"] += min(stale_n, Bc)
                stats["lane_bounces"] += min(stale_n, Bc) * kc
                stats["step"][0] += 1
            o, d, weight, s, alive, pdepth, delta, n_live = \
                self._pool_step(kc)(
                    params_ctx, cs.geom, cs.shade, cs.mat_graph,
                    o, d, weight, s, alive, pdepth, delta)
            if sync_on:
                _acct("step", ("step", Bc, kc), n_live)
            try:
                n_live.copy_to_host_async()
            except AttributeError:      # pragma: no cover - older jax
                pass
            counts.append([n_live, 0])
            # lag-1 count consumption: pop the step-(i-1) count while the
            # device runs step i. (Polling is_ready() instead measurably
            # SLOWED the render on this host — the readiness query itself
            # round-trips the device tunnel.)
            if len(counts) >= 2:
                arr, adj = counts.pop(0)
                stale_n = int(arr) + adj
            if progress is not None:
                progress(total - queue_left() - min(stale_n, Bc), total)

            # interrupt latency bound: poll once per dispatch, not only at
            # refill boundaries — P/S/X/SIGINT land within ONE pool step
            # at any render phase (ui.c:190-233 responsiveness analogue)
            if interrupt is not None and interrupt():
                return self._persistent_interrupt(
                    final, alive, lane, lpass, delta, npix, queue)

            if queue_left() > 0 and Bc == B and stale_n <= B - Q:
                # fused flush+pack+refill on the LAGGED count: it only
                # overestimates the live set, so the tail slots it clears
                # are guaranteed dead — no blocking sync needed. m rounds
                # down to a power of two to bound the compile-cache size.
                # (Blocking on the exact count here was tried: refill
                # sizing barely changes — real avg path depth is ~7 so
                # per-step deaths are ~14% — and the per-step host RTT
                # over the device tunnel cost ~40 ms, a net 20% LOSS.)
                m = min((B - stale_n) // Q, 8,
                        max((queue_left() + Q - 1) // Q, 1))
                while m & (m - 1):
                    m &= m - 1
                if m >= 1:
                    if stats_on:
                        stats["refill"][0] += 1
                        hist[("refill", m)] = hist.get(("refill", m), 0) + 1
                    if queue.pending:
                        # resume path: non-contiguous re-enqueued ids go
                        # through the host-side fresh-ray builder
                        (fo, fd, fs, flane, fpass, falive,
                         took) = take(m * Q)
                        (final, o, d, weight, s, alive, lane, lpass,
                         pdepth, delta) = self._flush_pack_refill_host(
                            B, m, Q)(
                            final, o, d, weight, s, alive, lane, lpass,
                            pdepth, delta, fo, fd, fs, flane, fpass,
                            falive)
                    else:
                        # device-side refill: fresh primaries generated
                        # inside the same dispatch from the head of the
                        # current contiguous id range
                        lo, hi = queue.ranges[0]
                        took = min(m * Q, hi - lo)
                        (final, o, d, weight, s, alive, lane, lpass,
                         pdepth, delta) = self._flush_pack_refill(
                            B, m, Q)(
                            final, o, d, weight, s, alive, lane, lpass,
                            pdepth, delta, np.int32(lo % npix),
                            np.int32(lo // npix), np.int32(took),
                            i32(spp))
                        queue.ranges[0][0] += took
                        if queue.ranges[0][0] >= hi:
                            queue.ranges.pop(0)
                    if sync_on:
                        _acct("refill", ("refill", m), final)
                    # counts issued before this refill undercount by took
                    for e in counts:
                        e[1] += took
                    stale_n += took
                    if on_frame is not None:
                        # live preview hook: the framebuffer SUM of
                        # completed paths (callee throttles the fetch)
                        on_frame(final, total - queue_left())
            elif queue_left() == 0:
                # drain: exact count, early exit, shrink buckets
                stale_n = int(counts[-1][0]) + counts[-1][1]
                counts.clear()
                if stale_n == 0:
                    break
                need = max(_next_pow2(max(stale_n, 1)), 1024)
                Bn = Bc
                while Bn // 4 >= need:
                    Bn //= 4
                if Bn < Bc:
                    if stats_on:
                        stats["shrink"][0] += 1
                    (final, o, d, weight, s, alive, lane, lpass, pdepth,
                     delta) = self._pack_shrink(Bn)(
                        final, o, d, weight, s, alive, lane, lpass,
                        pdepth, delta)
                    if sync_on:
                        _acct("shrink", ("shrink", Bn), final)
                if alive.shape[0] <= self.DRAIN_DEV_MAX \
                        and interrupt is None:
                    # finish the tail in ONE device-side while_loop — the
                    # host drain pays a blocking count RTT per iteration
                    o, d, weight, s, alive, pdepth, delta = \
                        self._drain_all()(
                            params_ctx, cs.geom, cs.shade, cs.mat_graph,
                            o, d, weight, s, alive, pdepth, delta)
                    if stats_on:
                        stats["step"][0] += 1
                        hist[("drain_all", alive.shape[0])] = \
                            hist.get(("drain_all", alive.shape[0]), 0) + 1
                    break
        final = self._final_flush()(final, lane, delta, alive)
        if stats_on:
            import sys as _sys
            wall = _time.perf_counter() - t_start
            n_steps = max(stats["step"][0], 1)
            print(f"pool stats: {wall:.2f}s wall, "
                  f"{stats['step'][0]} step dispatches "
                  f"(avg occupancy {stats['occ_sum'] / n_steps / B:.2f}), "
                  f"{stats['refill'][0]} refills, "
                  f"{stats['shrink'][0]} shrinks, "
                  f"{stats['lane_bounces'] / 1e6:.1f}M lane-bounces "
                  f"({stats['lane_bounces'] / max(total, 1):.2f}/path)",
                  file=_sys.stderr)
            if sync_on:
                print(f"  phase wall: step {stats['step'][1]:.2f}s  "
                      f"refill {stats['refill'][1]:.2f}s  "
                      f"shrink {stats['shrink'][1]:.2f}s", file=_sys.stderr)
            for hk in sorted(hist, key=str):
                v = hist[hk]
                print(f"  {hk}: "
                      + (f"{v:.3f}s" if isinstance(v, float) else str(v)),
                      file=_sys.stderr)
        final = final / f32(spp)
        if not fetch:
            # steady-state callers (bench.py) keep the frame on device:
            # the 33 MB framebuffer readback runs at ~10 MB/s over the
            # tunneled single-chip link (2-4 s), a harness artifact that
            # is <0.1% of the reference's 1000-spp workload but would
            # dominate a short timed run
            return final.reshape(H, W, 4)
        return jax.device_get(final.reshape(H, W, 4))

    def fetch_partial(self, final) -> np.ndarray:
        """Host copy of the in-progress radiance-sum frame (npix, 4) —
        the preview fetch hook (overridden by the sharded renderer to
        reduce per-device partials first)."""
        return np.asarray(final)

    def _persistent_interrupt(self, final, alive, lane, lpass, delta,
                              npix, queue):
        """Checkpoint state at an interrupt: flush completed (dead) lanes'
        radiance, collect in-flight (pixel, pass) queue ids to re-trace,
        and keep the un-taken queue (any not-yet-consumed re-enqueued ids
        plus the remaining ranges). Returns
        ("interrupted", final_sum (npix,4) np, pending ids, ranges)."""
        final = self._final_flush()(final, lane, delta, alive)
        alive_h = np.asarray(alive)
        lane_h = np.asarray(lane)[alive_h]
        pass_h = np.asarray(lpass)[alive_h]
        # queue ids index the TILE-ORDER pixel schedule; lane is the flat
        # pixel id — invert the schedule permutation
        xs_f, ys_f, _, _, _, _ = self._pixel_schedule
        xs_f, ys_f = np.asarray(xs_f[:npix]), np.asarray(ys_f[:npix])
        inv = np.empty(npix, np.int64)
        inv[ys_f.astype(np.int64) * self.width + xs_f] = np.arange(npix)
        pend = pass_h.astype(np.int64) * npix + inv[lane_h]
        pend = np.concatenate(
            [pend, np.asarray(queue.pending, np.int64)])
        return ("interrupted", np.asarray(final), pend,
                [list(r) for r in queue.ranges])


def render(cscene: CompiledScene, kind: str = smp.RANDOM,
           spp: int | None = None, bounces: int | None = None,
           progress=None):
    """Full render. Returns the float accumulation buffer (H, W, 4), y-up
    like the reference's renderBuffer (row y=0 is the image BOTTOM; the PNG
    writer flips)."""
    return WavefrontRenderer(cscene, kind, bounces).render(spp, progress)


def build_render_pass(cscene: CompiledScene, kind: str = smp.RANDOM,
                      bounces: int | None = None):
    """Compatibility shim: returns render_pass(params, geom, shade,
    mat_graph, accum, pass_idx, spp) for tests; not jitted as a whole."""
    r = WavefrontRenderer(cscene, kind, bounces)

    def render_pass(params, geom, shade, mat_graph, accum, pass_idx, spp):
        return r.render_pass(accum, int(pass_idx), int(spp))
    return render_pass
