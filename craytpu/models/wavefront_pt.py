"""Wavefront Monte Carlo path tracer (the integrator).

The TPU-native replacement for the reference's per-pixel megakernel loop
(renderer/pathtrace.c:32-60 + renderThread renderer.c:258-327): the whole
frame is one SoA wavefront of rays advancing bounce-by-bounce in lockstep.
The bounce loop and the BVH walk are natively batched lax.while_loops with
SCALAR exit conditions (any-lane-alive), so scene buffers stay loop
invariants instead of being masked per lane; per-lane divergence is handled
with masks. The loop exits as soon as every lane terminated, so shallow
scenes don't pay for the configured bounce depth.

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


import jax
import jax.numpy as jnp

from craytpu.ops import sampler as smp
from craytpu.ops import shading
from craytpu.ops import traverse as trv
from craytpu.scene.compile import CompiledScene

f32 = jnp.float32
i32 = jnp.int32
u32 = jnp.uint32


def build_wavefront_step(cscene: CompiledScene, kind: str = smp.RANDOM,
                         bounces: int | None = None):
    """Returns trace(params, geom, shade, mat_graph, xs, ys, pass_idx, spp)
    -> (B, 4) colors for a flat batch of pixel coordinates."""
    width = cscene.camera.width
    max_depth = bounces if bounces is not None else cscene.prefs.bounces
    cam_fn = cscene.camera_fn(kind)
    bg_fn = cscene.background_fn()
    bsdf_fns = cscene.bsdf_fns(kind)
    empty_scene = cscene.n_instances == 0
    traverse = trv.make_traverse_fn(cscene.tlas_end, cscene.stack_depth,
                                    cscene.max_leaf_tris,
                                    cscene.max_leaf_inst)

    def trace(params, geom, shade, mat_graph, xs, ys, pass_idx, spp):
        B = xs.shape[0]
        pix_idx = ys.astype(u32) * u32(width) + xs.astype(u32)
        s = smp.init_sampler(kind, jnp.full(B, pass_idx, i32),
                             jnp.full(B, spp, i32), pix_idx)
        o, d, s = jax.vmap(cam_fn)(xs, ys, s)

        if empty_scene or max_depth == 0:
            if max_depth == 0:
                return jnp.zeros((B, 4), f32)
            return bg_fn(params, d)

        def shade_all(rec, st, gid):
            """Evaluate every compiled graph on the full wavefront and
            mask-select by graph id — the batched analogue of the per-hit
            node-DAG dispatch. (lax.switch would broadcast captured scene
            constants per lane under batching.)"""
            out, col, s_sel = bsdf_fns[0](params, rec, st)
            for gi in range(1, len(bsdf_fns)):
                o_i, c_i, s_i = bsdf_fns[gi](params, rec, st)
                m = gid == gi
                out = jnp.where(m[..., None], o_i, out)
                col = jnp.where(m[..., None], c_i, col)
                s_sel = smp.select_state(m, s_i, s_sel)
            return out, col, s_sel

        def body(carry):
            depth, o, d, weight, final, s, alive = carry
            hit = traverse(geom, o, d)
            is_hit, p_w, n_w, uv, mat_id = trv.hit_info(geom, shade, o, d,
                                                        hit)
            is_hit = is_hit & alive

            # miss: final += weight * background, terminate
            # (pathtrace.c:39-42)
            bg = bg_fn(params, d)
            take_bg = (alive & ~is_hit)[..., None]
            final = jnp.where(take_bg, final + weight * bg, final)

            mat_emission = params.emission[mat_id]
            mat_ior = params.ior[mat_id]
            rec = shading.HitRec(incident=d, normal=n_w, uv=uv,
                                 hit_point=p_w, distance=hit.t,
                                 emission=mat_emission, ior=mat_ior)
            # hit: final += weight * legacy emission (pathtrace.c:44)
            final = jnp.where(is_hit[..., None],
                              final + weight * mat_emission, final)

            gid = mat_graph[mat_id]
            out, attenuation, s2 = shade_all(rec, s, gid)
            s = smp.select_state(is_hit, s2, s)

            # Russian roulette from depth 4 (pathtrace.c:50-55)
            prob = jnp.where(
                depth >= 4,
                jnp.maximum(attenuation[..., 0],
                            jnp.maximum(attenuation[..., 1],
                                        attenuation[..., 2])),
                f32(1.0))
            need_rr = is_hit & (depth >= 4)
            rr_dim, s3 = smp.get_dimension(kind, s)
            s = smp.select_state(need_rr, s3, s)
            rr_break = need_rr & (rr_dim > prob)

            survive = is_hit & ~rr_break
            weight = jnp.where(survive[..., None],
                               attenuation * weight / prob[..., None],
                               weight)
            o = jnp.where(survive[..., None], p_w, o)
            d = jnp.where(survive[..., None], out, d)
            return depth + 1, o, d, weight, final, s, survive

        def cond(carry):
            depth, _, _, _, _, _, alive = carry
            return (depth < max_depth) & jnp.any(alive)

        init = (i32(0), o, d, jnp.ones((B, 4), f32), jnp.zeros((B, 4), f32),
                s, jnp.ones(B, bool))
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
    trace = build_wavefront_step(cscene, kind, bounces)
    H = cscene.camera.height
    W = cscene.camera.width

    def render_pass(params, geom, shade, mat_graph, accum, pass_idx, spp):
        ys, xs = jnp.meshgrid(jnp.arange(H, dtype=i32),
                              jnp.arange(W, dtype=i32), indexing="ij")
        sample = trace(params, geom, shade, mat_graph,
                       xs.reshape(-1), ys.reshape(-1), pass_idx,
                       spp).reshape(H, W, 4)
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
    flips)."""
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
