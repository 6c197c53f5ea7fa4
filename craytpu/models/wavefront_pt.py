"""Wavefront Monte Carlo path tracer (the integrator).

The TPU-native replacement for the reference's per-pixel megakernel loop
(renderer/pathtrace.c:32-60 + renderThread renderer.c:258-327): the whole
frame is one SoA wavefront of rays; each ray is a scalar-style traced
program vmapped over the batch and jitted; bounces advance in lockstep via
lax.while_loop with per-lane alive masking (the loop exits as soon as every
lane terminated, so shallow scenes don't pay for max bounce depth).

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

from functools import partial

import jax
import jax.numpy as jnp

from craytpu.ops import sampler as smp
from craytpu.ops import shading
from craytpu.ops import traverse as trv
from craytpu.ops import colorops as co
from craytpu.scene.compile import CompiledScene

f32 = jnp.float32
i32 = jnp.int32
u32 = jnp.uint32


def build_pixel_tracer(cscene: CompiledScene, kind: str = smp.RANDOM,
                       bounces: int | None = None):
    """Returns trace(params, geom, shade, mat_graph, x, y, pass_idx, spp)
    -> color (4,), a scalar-pixel function (vmap over pixels)."""
    width = cscene.camera.width
    max_depth = bounces if bounces is not None else cscene.prefs.bounces
    cam_fn = cscene.camera_fn(kind)
    bg_fn = cscene.background_fn()
    bsdf_fns = cscene.bsdf_fns(kind)
    empty_scene = cscene.n_instances == 0
    traverse = trv.make_traverse_fn(cscene.tlas_end, cscene.stack_depth)

    def trace(params, geom, shade, mat_graph, x, y, pass_idx, spp):
        pix_idx = (jnp.asarray(y, u32) * u32(width) + jnp.asarray(x, u32))
        s = smp.init_sampler(kind, pass_idx, spp, pix_idx)
        o, d, s = cam_fn(x, y, s)

        if empty_scene or max_depth == 0:
            # no geometry: every ray samples the background once
            # (pathtrace.c:39-42 with instIndex always -1)
            if max_depth == 0:
                return jnp.zeros(4, f32)
            return bg_fn(params, d)

        def body(carry):
            depth, o, d, weight, final, s, alive = carry
            hit = traverse(geom, o, d)
            is_hit, p_w, n_w, uv, mat_id = trv.hit_info(geom, shade, o, d, hit)

            # miss: final += weight * background, terminate (pathtrace.c:39-42)
            bg = bg_fn(params, d)
            final = jnp.where(is_hit, final, final + weight * bg)

            mat_emission = params.emission[mat_id]
            mat_ior = params.ior[mat_id]
            rec = shading.HitRec(incident=d, normal=n_w, uv=uv,
                                 hit_point=p_w, distance=hit.t,
                                 emission=mat_emission, ior=mat_ior)
            # hit: final += weight * legacy emission (pathtrace.c:44)
            final = jnp.where(is_hit, final + weight * mat_emission, final)

            gid = mat_graph[mat_id]
            out, attenuation, s2 = jax.lax.switch(
                gid, [partial(lambda fn, st: fn(params, rec, st), fn)
                      for fn in bsdf_fns], s)
            s = smp.select_state(is_hit, s2, s)

            # Russian roulette from depth 4 (pathtrace.c:50-55)
            prob = jnp.where(
                depth >= 4,
                jnp.maximum(attenuation[0],
                            jnp.maximum(attenuation[1], attenuation[2])),
                f32(1.0))
            need_rr = is_hit & (depth >= 4)
            rr_dim, s3 = smp.get_dimension(kind, s)
            s = smp.select_state(need_rr, s3, s)
            rr_break = need_rr & (rr_dim > prob)

            survive = is_hit & ~rr_break
            weight = jnp.where(
                survive, co.color_coef(f32(1.0) / prob, attenuation * weight),
                weight)
            o = jnp.where(survive, p_w, o)
            d = jnp.where(survive, out, d)
            alive = alive & survive
            return depth + 1, o, d, weight, final, s, alive

        def cond(carry):
            depth, _, _, _, _, _, alive = carry
            return alive & (depth < max_depth)

        init = (i32(0), o, d, jnp.ones(4, f32), jnp.zeros(4, f32), s,
                jnp.asarray(True))
        out = jax.lax.while_loop(cond, body, init)
        return out[4]

    return trace


def build_render_pass(cscene: CompiledScene, kind: str = smp.RANDOM,
                      bounces: int | None = None):
    """One full-frame pass with running-average accumulation.

    render_pass(params, geom, shade, mat_graph, accum (H,W,4), pass_idx, spp)
    -> accum. pass_idx is 0-based (completedSamples - 1); the running mean
    matches renderer.c:287-294 with completedSamples = pass_idx + 1.
    """
    trace = build_pixel_tracer(cscene, kind, bounces)
    H = cscene.camera.height
    W = cscene.camera.width

    def render_pass(params, geom, shade, mat_graph, accum, pass_idx, spp):
        ys, xs = jnp.meshgrid(jnp.arange(H, dtype=i32),
                              jnp.arange(W, dtype=i32), indexing="ij")
        sample = jax.vmap(
            lambda x, y: trace(params, geom, shade, mat_graph, x, y,
                               pass_idx, spp)
        )(xs.reshape(-1), ys.reshape(-1)).reshape(H, W, 4)
        n = (pass_idx + 1).astype(f32)
        out = (accum * (n - f32(1.0)) + sample) / n
        return out

    return render_pass


def render(cscene: CompiledScene, kind: str = smp.RANDOM,
           spp: int | None = None, bounces: int | None = None,
           progress=None):
    """Full render: host loop over passes, jitted per-pass kernel.

    Returns the float accumulation buffer (H, W, 4), y-up like the
    reference's renderBuffer (row y=0 is the image BOTTOM; the PNG writer
    flips).
    """
    spp = spp if spp is not None else cscene.prefs.sample_count
    H, W = cscene.camera.height, cscene.camera.width
    render_pass = jax.jit(build_render_pass(cscene, kind, bounces),
                          donate_argnums=(4,))
    accum = jnp.zeros((H, W, 4), f32)
    for p in range(spp):
        accum = render_pass(cscene.params, cscene.geom, cscene.shade,
                            cscene.mat_graph, accum, i32(p), i32(spp))
        if progress is not None:
            progress(p + 1, spp, accum)
    return jax.device_get(accum)
