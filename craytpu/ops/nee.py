"""Next-event estimation (explicit light sampling) — optional integrator
mode, OFF by default.

The reference integrator is naive unidirectional PT (pathtrace.c:32-60):
emitters contribute only when a BSDF-sampled path happens to hit them.
NEE is the north-star addition (BASELINE.json: "stream-compacted wavefront
with NEE and Russian roulette as stochastic-gradient-safe ops"): at every
DIFFUSE vertex, one emissive entity is sampled explicitly (uniform over
the light table x uniform over its area), a shadow ray tests visibility,
and the direct-lighting estimate

    L += throughput * (albedo/pi) * Le * cos_s * |cos_l| / d^2 * (n*area)

is accumulated. To stay unbiased without MIS, the legacy-emission add is
suppressed at hits whose PREVIOUS vertex was an NEE-handled diffuse
vertex (direct light via NEE only; indirect light via BSDF sampling).

Gradient-safe by construction: the light pick, the sampled point, the
visibility result and all geometry factors are detached (they are
sampling decisions); gradients flow through Le (params.emission) and the
albedo color node, exactly like the detached-sampling estimator of the
base integrator. Parity-safe: with NEE off nothing here runs and no
sampler dimension is consumed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from craytpu.ops import sampler as smp
from craytpu.ops import shading
from craytpu.ops import vecmath as vm

f32 = jnp.float32
i32 = jnp.int32


def make_nee_fn(cscene, kind: str, isect):
    """Returns nee(params, geom, rec, s, is_hit, weight) ->
    (delta (B,4), s', is_nee_vertex (B,)) or None when the scene has no
    emissive entities or no diffuse materials."""
    dm = cscene.dense_meta
    lights = dm.get("lights")
    mat_nee = dm.get("mat_nee")
    color_irs = dm.get("diffuse_color_ir") or {}
    if lights is None or not color_irs:
        return None
    L = lights["count"]
    albedo_fns = {gi: shading.compile_color(ir, cscene.reg)
                  for gi, ir in color_irs.items() if ir is not None}
    mat_graph = cscene.mat_graph
    K = int(mat_nee.shape[0])

    def nee(params, geom, rec, s, is_hit, weight):
        B = rec.mat_id.shape[0]
        oh = (rec.mat_id[:, None] == jnp.arange(K, dtype=i32)[None, :])
        active = is_hit & (oh @ mat_nee.astype(i32)).astype(bool)

        # 3 sampler dimensions, consumed only on NEE vertices
        d0, s1 = smp.get_dimension(kind, s)
        d1, s1 = smp.get_dimension(kind, s1)
        d2, s1 = smp.get_dimension(kind, s1)
        s = smp.select_state(active, s1, s)

        li = jnp.minimum((d0 * f32(L)).astype(i32), L - 1)
        lk = lights["kind"][li]
        p0 = lights["p0"][li]
        e1 = lights["e1"][li]
        e2 = lights["e2"][li]
        n_l = lights["n"][li]
        area = lights["area"][li]
        mat_l = lights["mat"][li]

        # sample a point: triangle via sqrt warp; sphere via uniform area
        su = jnp.sqrt(jnp.maximum(d1, f32(0.0)))
        b1 = f32(1.0) - su
        b2 = d2 * su
        p_tri = p0 + e1 * b1[:, None] + e2 * b2[:, None]
        z = f32(1.0) - f32(2.0) * d1
        r_xy = jnp.sqrt(jnp.maximum(f32(0.0), f32(1.0) - z * z))
        phi = f32(2.0 * 3.14159265) * d2
        sph_dir = jnp.stack([r_xy * jnp.cos(phi), r_xy * jnp.sin(phi), z],
                            axis=-1)
        radius = e1[:, 0]
        p_sph = p0 + sph_dir * radius[:, None]
        is_sph = (lk == 1)[:, None]
        p_l = jnp.where(is_sph, p_sph, p_tri)
        n_light = jnp.where(is_sph, sph_dir, n_l)

        to_l = p_l - rec.hit_point
        dist2 = jnp.maximum(vm.vdot(to_l, to_l), f32(1e-12))
        dist = jnp.sqrt(dist2)
        wi = to_l / dist[:, None]
        cos_s = vm.vdot(rec.normal, wi)
        cos_l = jnp.abs(vm.vdot(n_light, wi))
        shoot = active & (cos_s > f32(0.0))

        # shadow ray (detached; dead lanes cull in the kernel via limit=0)
        eps = dist * f32(1e-4)
        o_sh = rec.hit_point + wi * eps[:, None]
        sh = isect(geom, jax.lax.stop_gradient(o_sh),
                   jax.lax.stop_gradient(wi), shoot)
        sh_hit, sh_t = sh[0], sh[5]
        visible = shoot & (~sh_hit | (sh_t >= dist * f32(0.999)))

        # diffuse albedo: evaluate each diffuse graph's color node masked
        gid = (oh @ mat_graph.astype(f32)).astype(i32)
        albedo = jnp.zeros((B, 4), f32)
        for gi, fn in albedo_fns.items():
            m = (gid == gi) & active

            def do(a, _fn=fn, _m=m):
                return jnp.where(_m[:, None], _fn(params, rec), a)
            albedo = jax.lax.cond(jnp.any(m), do, lambda a: a, albedo)

        oh_l = (mat_l[:, None] == jnp.arange(K, dtype=i32)[None, :]
                ).astype(f32)
        Le = oh_l @ params.emission
        geom_term = jax.lax.stop_gradient(
            jnp.maximum(cos_s, f32(0.0)) * cos_l / dist2
            * area * f32(L))
        delta = (weight * albedo * Le
                 * (geom_term * visible.astype(f32))[:, None]
                 * f32(1.0 / 3.14159265))
        return delta, s, active

    return nee
