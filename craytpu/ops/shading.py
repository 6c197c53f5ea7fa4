"""Material node-graph -> pure-JAX shading program compiler (batched).

The reference evaluates materials by chasing function-pointer node DAGs per
hit (nodes/*). Here each unique bsdf graph compiles once, at scene-compile
time, into a natively batched JAX function

    sample(params, rec, state) -> (out_dir (B,3), color (B,4), state)

evaluated per wavefront with per-lane masks. Every node constant lives in the
differentiable ShadeParams tables, so gradients flow to material colors,
values, and texture texels.

Sampler-dimension consumption matches the reference exactly, including
conditional consumption (metal/glass fuzz only when roughness > 0; mix picks
one side): both paths run on the SAME pre-branch state and the taken path's
post-state is selected per lane — precisely the semantics of the C code's
shared sequential stream. (lax.cond/switch are deliberately avoided: their
batching rules broadcast captured scene constants, e.g. the texel buffer,
to (B, X).)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from craytpu.ops import colorops as co
from craytpu.ops import sampler as smp
from craytpu.ops import texture as tex
from craytpu.ops import vecmath as vm
from craytpu.scene import nodegraph as ng

f32 = jnp.float32


class ShadeParams(NamedTuple):
    """Differentiable material parameter tables."""
    colors: jnp.ndarray    # (C, 4)
    values: jnp.ndarray    # (V,)
    vecs: jnp.ndarray      # (W, 3)
    texels: jnp.ndarray    # (R, 4) RGBA texel rows (all textures packed)
    emission: jnp.ndarray  # (K, 4) legacy material emission
    ior: jnp.ndarray       # (K,) legacy material IOR


class ShadeCtx(NamedTuple):
    """ShadeParams plus per-step derived tables. Duck-types ShadeParams
    for every compiled node; `texq` carries the bilinear quad-row tables
    (one (h*w, 16) array per quad-eligible texture), built ONCE per step
    from params.texels (Registry.make_ctx) so chunked/cond-gated shading
    does not rebuild the 4-rows-per-texel gather at every eval site.
    Differentiable: texq derives from texels inside the traced step."""
    colors: jnp.ndarray
    values: jnp.ndarray
    vecs: jnp.ndarray
    texels: jnp.ndarray
    emission: jnp.ndarray
    ior: jnp.ndarray
    texq: tuple


class HitRec(NamedTuple):
    """hitRecord fields visible to shading (datatypes/hitrecord.h).

    All leaves may carry a leading batch dimension."""
    incident: jnp.ndarray   # (..., 3) ray direction (unnormalized, as in C)
    normal: jnp.ndarray     # (..., 3) surface normal (world)
    uv: jnp.ndarray         # (..., 2)
    hit_point: jnp.ndarray  # (..., 3)
    distance: jnp.ndarray   # (...)
    emission: jnp.ndarray   # (..., 4) legacy material emission for this hit
    ior: jnp.ndarray        # (...) legacy material IOR
    mat_id: jnp.ndarray     # (...) i32 global material id (for param nodes)
    # optional (..., K) f32 one-hot of mat_id, provided by callers that
    # already materialize it (the wavefront step does, K <= 64). param
    # nodes then fetch per-material constants as one exact MXU matmul
    # instead of a per-lane narrow gather: the gather's (B,1) s32 index
    # chains got T(1,128) layouts (minor dim padded 1 -> 128) and cost
    # ~18 ms/step at 1M lanes in device traces.
    mat_oh: jnp.ndarray | None = None
    # optional (...,) bool: lanes whose result this graph evaluation will
    # actually keep (shade_chunk sets gid == gi). Texture nodes clamp the
    # texel index of inactive lanes to row 0: a TPU gather reads a full
    # 4 KB (8,128) tile per row regardless of row width, so a full-width
    # fetch for a material covering ~5% of lanes moved ~4 GB/step; with
    # clamping the inactive reads all hit one resident tile. Inactive
    # lanes' outputs are discarded by the caller's where-merge, so any
    # in-range index is semantically equivalent.
    active: jnp.ndarray | None = None


def dummy_rec(incident):
    shape = incident.shape[:-1]
    z3 = jnp.zeros(shape + (3,), f32)
    return HitRec(incident, z3, jnp.zeros(shape + (2,), f32), z3,
                  jnp.zeros(shape, f32), jnp.zeros(shape + (4,), f32),
                  jnp.ones(shape, f32), jnp.zeros(shape, jnp.int32))


def select_sample(pred, a, b):
    """Per-lane select between two (out, color, state) samples."""
    return (jnp.where(pred[..., None], a[0], b[0]),
            jnp.where(pred[..., None], a[1], b[1]),
            smp.select_state(pred, a[2], b[2]))


class Registry:
    """Assigns parameter-table slots to IR constants (dedup = hash-consing)."""

    def __init__(self, textures):
        self._colors = []
        self._cmap = {}
        self._values = []
        self._vmap = {}
        self._vecs = []
        self._vecmap = {}
        self.tex_meta = []
        offset = 0  # in RGBA rows
        self._tex_bufs = []
        # quad-eligible textures: tex_id -> (slot, global quad index);
        # their (h*w, 16) quad-row tables are derived once per step by
        # make_ctx and reached through ShadeCtx.texq[slot]
        self.quad_slot = {}
        self._quad_idx = []
        self._quad_byte_exact = []
        for t in textures:
            h, w, c = t.data.shape
            self.tex_meta.append((offset, w, h, c))
            rows = tex.pack_rgba_rows(t.data)
            self._tex_bufs.append(rows)
            if h * w <= tex.QUAD_MAX_TEXELS:
                self.quad_slot[len(self.tex_meta) - 1] = \
                    len(self._quad_idx)
                self._quad_idx.append(
                    tex.build_quad_index((offset, w, h, c)))
                # byte-exact = every texel sits on the b/255 f32 grid
                # (true for file-loaded LDR; false for HDR), checked
                # once at registration so make_ctx can byte-pack
                b = np.clip(np.round(rows * 255.0), 0, 255)
                self._quad_byte_exact.append(bool(np.array_equal(
                    rows, (b.astype(np.float32)
                           / np.float32(255.0)).astype(np.float32))))
            offset += h * w

    def make_ctx(self, params: "ShadeParams", packed=True) -> "ShadeCtx":
        """Derive the per-step shading context: build each quad-eligible
        texture's quad-row table from params.texels (one flattened row
        gather per texture, amortized over the whole wavefront — NOT per
        shade chunk/cond). packed=True additionally byte-packs tables of
        byte-exact LDR textures (see below); pass packed=False on
        differentiable traces that need texel gradients."""
        if isinstance(params, ShadeCtx):
            return params
        if not self._quad_idx:
            return ShadeCtx(*params, texq=())
        # TPU gathers run at ~1 element/cycle regardless of row width, so
        # the (B,)-indexed 16-f32-wide quad fetch costs 16 cycles/lane
        # (measured 18 ms/step at 1M lanes — the largest non-kernel op in
        # the bounce step's device trace). Byte-exact LDR textures pack
        # each quad's 16 bytes into FOUR u32 words instead: 4 gathered
        # elements/lane, dequantized in-register as f32(byte)/255 — the
        # reference's own fetch-time math (texture.c:33-64), bit-exact
        # for every byte value (verified exhaustively vs the pre-divided
        # f32 table). packed=False (the differentiable trace) and
        # off-grid textures (HDR) keep the f32 table, through which
        # texel gradients flow.
        texq = []
        for slot, q in enumerate(self._quad_idx):
            q16 = params.texels[jnp.asarray(q.reshape(-1))].reshape(-1, 16)
            if packed and self._quad_byte_exact[slot]:
                b = jnp.round(q16 * f32(255.0)).astype(jnp.uint32)
                words = [(b[:, 4 * t] | (b[:, 4 * t + 1] << 8)
                          | (b[:, 4 * t + 2] << 16)
                          | (b[:, 4 * t + 3] << 24)) for t in range(4)]
                texq.append(jnp.stack(words, axis=1))   # (h*w, 4) u32
            else:
                texq.append(q16)
        return ShadeCtx(*params, texq=tuple(texq))

    def color_idx(self, rgba):
        key = tuple(float(x) for x in rgba)
        if key not in self._cmap:
            self._cmap[key] = len(self._colors)
            self._colors.append(key)
        return self._cmap[key]

    def value_idx(self, x):
        key = float(x)
        if key not in self._vmap:
            self._vmap[key] = len(self._values)
            self._values.append(key)
        return self._vmap[key]

    def vec_idx(self, v):
        key = tuple(float(x) for x in v)
        if key not in self._vecmap:
            self._vecmap[key] = len(self._vecs)
            self._vecs.append(key)
        return self._vecmap[key]

    def finalize(self, emission, ior) -> ShadeParams:
        import numpy as np
        texels = (np.concatenate(self._tex_bufs) if self._tex_bufs
                  else np.zeros((1, 4), np.float32))
        return ShadeParams(
            colors=jnp.asarray(np.asarray(self._colors, np.float32).reshape(
                -1, 4) if self._colors else np.zeros((1, 4), np.float32)),
            values=jnp.asarray(np.asarray(self._values, np.float32)
                               if self._values else np.zeros(1, np.float32)),
            vecs=jnp.asarray(np.asarray(self._vecs, np.float32).reshape(-1, 3)
                             if self._vecs else np.zeros((1, 3), np.float32)),
            texels=jnp.asarray(texels),
            emission=jnp.asarray(emission),
            ior=jnp.asarray(ior),
        )


def _bcast_shape(rec: HitRec):
    return rec.distance.shape


def _ones(rec):
    return jnp.ones(_bcast_shape(rec), f32)


# --------------------------------------------------------------------------
# color / value / vector node compilers
# --------------------------------------------------------------------------

def compile_color(ir, reg: Registry):
    kind = ir[0]
    if kind == "param_color":
        # per-material indirection: structurally identical graphs compile
        # once and read their constants through mat_id (the TPU-native
        # hash-consing — 14 graphs collapse to 3 structures on scene.json)
        tbl = jnp.asarray(ir[1])

        def param_color_fn(p, rec):
            if rec.mat_oh is not None:
                # exact one-hot row fetch on the MXU (matmul precision is
                # "highest": 1.0*row + 0*rest reproduces the row bits)
                return rec.mat_oh @ p.colors[tbl]
            return p.colors[tbl[rec.mat_id]]
        return param_color_fn
    if kind == "const_color":
        idx = reg.color_idx(ir[1])
        return lambda p, rec: (p.colors[idx] * _ones(rec)[..., None])
    if kind == "image":
        tex_id, options = ir[1], ir[2]
        meta = reg.tex_meta[tex_id]
        no_bilinear = bool(options & ng.NO_BILINEAR)
        srgb = bool(options & ng.SRGB_TRANSFORM)
        # small/medium textures: fuse the 4 bilinear reads into one
        # 16-wide row gather against a quad-row table. The table is built
        # once per step from p.texels when the caller provides a ShadeCtx
        # (wavefront step does); plain-ShadeParams callers fall back to
        # the classic 4-gather fetch (identical values either way).
        quad_slot = (None if no_bilinear
                     else reg.quad_slot.get(tex_id))

        def image_fn(p, rec):
            u = rec.uv[..., 0]
            v = rec.uv[..., 1]
            tq = (p.texq[quad_slot]
                  if quad_slot is not None and hasattr(p, "texq")
                  else None)
            if no_bilinear:
                out = tex.fetch_nearest(p.texels, meta, u * meta[1],
                                        v * meta[2], active=rec.active)
            elif tq is not None:
                out = tex.fetch_bilinear_quadtab(tq, meta, u, v,
                                                 active=rec.active)
            else:
                out = tex.fetch_bilinear(p.texels, meta, u, v,
                                         active=rec.active)
            if srgb:
                out = co.color_from_srgb(out)
            return out
        return image_fn
    if kind == "checker":
        a_fn = compile_color(ir[1], reg)
        b_fn = compile_color(ir[2], reg)
        s_fn = compile_value(ir[3], reg)

        def checker_fn(p, rec):
            coef = s_fn(p, rec)
            mapped = (jnp.sin(coef * rec.uv[..., 0])
                      * jnp.sin(coef * rec.uv[..., 1]))
            world = (jnp.sin(coef * rec.hit_point[..., 0])
                     * jnp.sin(coef * rec.hit_point[..., 1])
                     * jnp.sin(coef * rec.hit_point[..., 2]))
            sines = jnp.where(rec.uv[..., 0] >= f32(0.0), mapped, world)
            return jnp.where((sines < f32(0.0))[..., None],
                             a_fn(p, rec), b_fn(p, rec))
        return checker_fn
    if kind == "gradient":
        d_idx = reg.color_idx(ir[1])
        u_idx = reg.color_idx(ir[2])

        def gradient_fn(p, rec):
            unit = vm.vnormalize(rec.incident)
            t = f32(0.5) * (unit[..., 1] + f32(1.0))
            return co.color_lerp(p.colors[d_idx], p.colors[u_idx], t)
        return gradient_fn
    if kind == "combine":
        v_fn = compile_value(ir[1], reg)

        def combine_fn(p, rec):
            v = v_fn(p, rec) * _ones(rec)
            return jnp.stack([v, v, v, jnp.ones_like(v)], axis=-1)
        return combine_fn
    if kind == "combine_rgb":
        r_fn = compile_value(ir[1], reg)
        g_fn = compile_value(ir[2], reg)
        b_fn = compile_value(ir[3], reg)

        def combine_rgb_fn(p, rec):
            one = _ones(rec)
            return jnp.stack([r_fn(p, rec) * one, g_fn(p, rec) * one,
                              b_fn(p, rec) * one, one], axis=-1)
        return combine_rgb_fn
    if kind == "vec_to_color":
        vec_fn = compile_vector(ir[1], reg)

        def v2c(p, rec):
            v, _ = vec_fn(p, rec)
            v = v * _ones(rec)[..., None]
            return jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)
        return v2c
    raise ValueError(f"unknown color node {kind!r}")


def compile_value(ir, reg: Registry):
    kind = ir[0]
    if kind == "param_value":
        tbl = jnp.asarray(ir[1])

        def param_value_fn(p, rec):
            if rec.mat_oh is not None:
                return rec.mat_oh @ p.values[tbl]
            return p.values[tbl[rec.mat_id]]
        return param_value_fn
    if kind == "const_value":
        idx = reg.value_idx(ir[1])
        return lambda p, rec: p.values[idx] * _ones(rec)
    if kind == "grayscale":
        c_fn = compile_color(ir[1], reg)
        return lambda p, rec: co.grayscale_hsp(c_fn(p, rec))
    if kind == "alpha":
        c_fn = compile_color(ir[1], reg)
        return lambda p, rec: c_fn(p, rec)[..., 3]
    if kind == "raylength":
        return lambda p, rec: rec.distance
    if kind == "fresnel":
        ior_fn = compile_value(ir[1], reg)

        def fresnel_fn(p, rec):
            ior = ior_fn(p, rec)
            d = vm.vdot(rec.incident, rec.normal)
            ln = vm.vlength(rec.incident)
            cosine = jnp.where(d > f32(0.0), ior * d / ln, -(d / ln))
            return vm.schlick(cosine, ior)
        return fresnel_fn
    if kind == "math":
        a_fn = compile_value(ir[1], reg)
        b_fn = compile_value(ir[2], reg)
        op = ir[3]

        def math_fn(p, rec):
            return _MATH_IMPL[op](a_fn(p, rec), b_fn(p, rec))
        return math_fn
    if kind == "vec_to_value":
        vec_fn = compile_vector(ir[1], reg)

        def v2v(p, rec):
            _, fval = vec_fn(p, rec)
            return fval * _ones(rec)
        return v2v
    raise ValueError(f"unknown value node {kind!r}")


_MATH_IMPL = {
    "Add": lambda a, b: a + b,
    "Subtract": lambda a, b: a - b,
    "Multiply": lambda a, b: a * b,
    "Divide": lambda a, b: a / b,
    "Power": lambda a, b: jnp.power(a, b),
    "Log": lambda a, b: jnp.log10(a),
    "SquareRoot": lambda a, b: jnp.sqrt(a),
    "Absolute": lambda a, b: jnp.abs(a),
    "Min": lambda a, b: jnp.minimum(a, b),
    "Max": lambda a, b: jnp.maximum(a, b),
    "Sine": lambda a, b: jnp.sin(a),
    "Cosine": lambda a, b: jnp.cos(a),
    "Tangent": lambda a, b: jnp.tan(a),
    "ToRadians": lambda a, b: a * (vm.PI / f32(180.0)),
    "ToDegrees": lambda a, b: a * (f32(180.0) / vm.PI),
}


def compile_vector(ir, reg: Registry):
    """Vector nodes return (vec (..., 3), f scalar) like struct vectorValue."""
    kind = ir[0]
    if kind == "param_vec":
        tbl = jnp.asarray(ir[1])
        return lambda p, rec: (p.vecs[tbl[rec.mat_id]],
                               jnp.zeros(_bcast_shape(rec), f32))
    if kind == "const_vec":
        idx = reg.vec_idx(ir[1])
        return lambda p, rec: (p.vecs[idx] * _ones(rec)[..., None],
                               jnp.zeros(_bcast_shape(rec), f32))
    if kind == "normal":
        return lambda p, rec: (rec.normal, jnp.zeros(_bcast_shape(rec), f32))
    if kind == "vec_math":
        a_fn = compile_vector(ir[1], reg)
        b_fn = compile_vector(ir[2], reg)
        op = ir[3]

        def vecmath_fn(p, rec):
            a, _ = a_fn(p, rec)
            b, _ = b_fn(p, rec)
            zero = jnp.zeros(_bcast_shape(rec), f32)
            z3 = jnp.zeros_like(a)
            if op == "VecAdd":
                return a + b, zero
            if op == "VecSubtract":
                return a - b, zero
            if op == "VecMultiply":
                return a * b, zero
            if op == "VecAverage":
                return (a + b) * f32(0.5), zero
            if op == "VecDot":
                return z3, vm.vdot(a, b)
            if op == "VecCross":
                return vm.vcross(a, b), zero
            if op == "VecNormalize":
                return vm.vnormalize(a), zero
            if op == "VecReflect":
                return vm.vreflect(a, b), zero
            if op == "VecLength":
                return z3, vm.vlength(a)
            if op == "VecAbs":
                return jnp.abs(a), zero
            raise ValueError(op)
        return vecmath_fn
    raise ValueError(f"unknown vector node {kind!r}")


# --------------------------------------------------------------------------
# bsdf compilers (batched, mask-select branching)
# --------------------------------------------------------------------------

def compile_bsdf(ir, reg: Registry, kind: str):
    """Returns sample(params, rec, state) -> (out (..,3), color (..,4), state).

    Branch semantics: both sides evaluate from the same pre-branch sampler
    state; the taken side's post-state is selected per lane (identical to
    the C sequential stream)."""
    node = ir[0]

    if node == "diffuse":
        color_fn = compile_color(ir[1], reg)

        def diffuse_sample(p, rec, s):
            rand, s = vm.random_on_unit_sphere(kind, s)
            out = vm.vnormalize(rec.normal + rand)
            return out, color_fn(p, rec), s
        return diffuse_sample

    if node == "metal":
        color_fn = compile_color(ir[1], reg)
        rough_fn = compile_value(ir[2], reg)

        def metal_sample(p, rec, s):
            refl = vm.vreflect(vm.vnormalize(rec.incident), rec.normal)
            rough = rough_fn(p, rec)
            fz, s_adv = vm.random_on_unit_sphere(kind, s)
            fuzzy = rough > f32(0.0)
            out = jnp.where(fuzzy[..., None],
                            vm.fma_raw(fz, rough[..., None], refl), refl)
            s = smp.select_state(fuzzy, s_adv, s)
            return out, color_fn(p, rec), s
        return metal_sample

    if node == "glass":
        color_fn = compile_color(ir[1], reg)
        rough_fn = compile_value(ir[2], reg)
        ior_fn = compile_value(ir[3], reg)

        def glass_sample(p, rec, s):
            ior = ior_fn(p, rec)
            refl = vm.vreflect(rec.incident, rec.normal)
            d = vm.vdot(rec.incident, rec.normal)
            ln = vm.vlength(rec.incident)
            entering = d > f32(0.0)
            outward = jnp.where(entering[..., None], -rec.normal, rec.normal)
            # exact_div: ni_over_nt steers the refracted DIRECTION, and
            # cosine the reflect/refract branch — both must be
            # backend-bit-stable for golden parity (vm.exact_div)
            ni_over_nt = jnp.where(entering, ior, vm.exact_div(f32(1.0),
                                                               ior))
            cosine = jnp.where(entering, vm.exact_div(ior * d, ln),
                               -vm.exact_div(d, ln))
            ok, refr = vm.refract(rec.incident, outward, ni_over_nt)
            refl_prob = jnp.where(ok, vm.schlick(cosine, ior), f32(1.0))
            rough = rough_fn(p, rec)
            fz, s_adv = vm.random_on_unit_sphere(kind, s)
            fuzzy = rough > f32(0.0)
            refl = jnp.where(fuzzy[..., None],
                             vm.fma_raw(fz, rough[..., None], refl), refl)
            refr = jnp.where(fuzzy[..., None],
                             vm.fma_raw(fz, rough[..., None], refr), refr)
            s = smp.select_state(fuzzy, s_adv, s)
            dim, s = smp.get_dimension(kind, s)
            out = jnp.where((dim < refl_prob)[..., None], refl, refr)
            return out, color_fn(p, rec), s
        return glass_sample

    if node == "plastic":
        color_fn = compile_color(ir[1], reg)
        # plastic's roughness is a constant-black COLOR node (plastic.c:92)
        # and the nested diffuse shares the color node.
        rough_color_fn = compile_color(ng.const_color(ng.BLACK), reg)
        inner_diffuse = compile_bsdf(("diffuse", ir[1]), reg, kind)

        def plastic_sample(p, rec, s):
            d = vm.vdot(rec.incident, rec.normal)
            ln = vm.vlength(rec.incident)
            entering = d > f32(0.0)
            outward = jnp.where(entering[..., None], -rec.normal, rec.normal)
            ni_over_nt = jnp.where(entering, rec.ior,
                                   vm.exact_div(f32(1.0), rec.ior))
            cosine = jnp.where(entering, vm.exact_div(rec.ior * d, ln),
                               -vm.exact_div(d, ln))
            ok, _ = vm.refract(rec.incident, outward, ni_over_nt)
            refl_prob = jnp.where(ok, vm.schlick(cosine, rec.ior), f32(1.0))
            dim, s = smp.get_dimension(kind, s)
            take_shiny = dim < refl_prob
            # sampleShiny (plastic.c:42-55)
            refl = vm.vreflect(rec.incident, rec.normal)
            rough = rough_color_fn(p, rec)[..., 0]
            fz, s_fuzz = vm.random_on_unit_sphere(kind, s)
            fuzzy = rough > f32(0.0)
            shiny_out = jnp.where(fuzzy[..., None],
                                  vm.fma_raw(fz, rough[..., None], refl), refl)
            s_shiny = smp.select_state(fuzzy, s_fuzz, s)
            shiny_col = jnp.ones(_bcast_shape(rec) + (4,), f32)
            diff = inner_diffuse(p, rec, s)
            return select_sample(take_shiny, (shiny_out, shiny_col, s_shiny),
                                 diff)
        return plastic_sample

    if node == "emissive":
        color_fn = compile_color(ir[1], reg)
        strength_fn = compile_value(ir[2], reg)

        def emissive_sample(p, rec, s):
            rand, s = vm.random_on_unit_sphere(kind, s)
            out = vm.vnormalize(rec.normal + rand)
            c = co.color_coef(strength_fn(p, rec), color_fn(p, rec))
            return out, c, s
        return emissive_sample

    if node == "mix":
        a_fn = compile_bsdf(ir[1], reg, kind)
        b_fn = compile_bsdf(ir[2], reg, kind)
        factor_fn = compile_value(ir[3], reg)

        def mix_sample(p, rec, s):
            lerp = factor_fn(p, rec)
            dim, s = smp.get_dimension(kind, s)
            return select_sample(dim > lerp, a_fn(p, rec, s),
                                 b_fn(p, rec, s))
        return mix_sample

    if node == "add":
        a_fn = compile_bsdf(ir[1], reg, kind)
        b_fn = compile_bsdf(ir[2], reg, kind)

        def add_sample(p, rec, s):
            out_a, col_a, s = a_fn(p, rec, s)
            out_b, col_b, s = b_fn(p, rec, s)
            return out_a + out_b, col_a + col_b, s
        return add_sample

    if node == "transparent":
        color_fn = compile_color(ir[1], reg)

        def transparent_sample(p, rec, s):
            return rec.incident, color_fn(p, rec), s
        return transparent_sample

    if node == "isotropic":
        color_fn = compile_color(ir[1], reg)

        def isotropic_sample(p, rec, s):
            rand, s = vm.random_on_unit_sphere(kind, s)
            return vm.vnormalize(rand), color_fn(p, rec), s
        return isotropic_sample

    if node == "background":
        raise ValueError("background graphs compile via compile_background")

    raise ValueError(f"unknown bsdf node {node!r}")


def compile_background(ir, reg: Registry):
    """background.c:39-66: equirect env lookup from the escaped ray dir.

    Returns bg(params, incident_dir (..., 3)) -> color (..., 4).
    Consumes no dims.
    """
    assert ir[0] == "background"
    color_fn = compile_color(ir[1], reg)
    strength_fn = compile_value(ir[2], reg)
    offset_fn = compile_value(ir[3], reg)

    def bg(p, incident):
        rec0 = dummy_rec(incident)
        ud = vm.vnormalize(incident)
        phi = (jnp.arctan2(ud[..., 2], ud[..., 0]) / f32(4.0)
               + offset_fn(p, rec0))
        theta = jnp.arccos(jnp.clip(-ud[..., 1], f32(-1.0), f32(1.0)))
        u = theta / vm.PI
        v = phi / (vm.PI / f32(2.0))
        u = vm.wrap_min_max(u, f32(0.0), f32(1.0))
        v = vm.wrap_min_max(v, f32(0.0), f32(1.0))
        rec = rec0._replace(uv=jnp.stack([v, u], axis=-1))  # background.c:58
        return co.color_coef(strength_fn(p, rec), color_fn(p, rec))
    return bg
