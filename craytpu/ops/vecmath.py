"""Vector math device ops (float3 as shape-(3,) arrays, scalar-ray style).

Semantics mirror datatypes/vector.h; written to be vmapped over a wavefront
of rays. Sampler-consuming helpers thread SamplerState explicitly and consume
dimensions in exactly the reference's order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from craytpu.ops import sampler as smp

f32 = jnp.float32
PI = f32(3.14159265358979323846)  # includes.h PI


# --------------------------------------------------------------------------
# Deterministic float primitives.
#
# XLA:TPU implements f32 divide and sqrt with hardware reciprocal /
# rsqrt approximations plus Newton steps; in fused graphs they land up
# to 2 ulp away from XLA:CPU's correctly-rounded results (measured:
# even x/|x| returns 0.9999999 on TPU for 15% of inputs —
# scripts/diag_tridist.py). Ray geometry runs through dozens of such
# ops per bounce, and 50-bounce glass chains amplify the ulp noise
# chaotically: refraction.json scored 0.98485 within-1-LSB on TPU vs
# 0.9994 on CPU (VERDICT r4 #1). The fix is one Newton step computed
# with an EXACT residual (Dekker two-product, which needs only exact
# mul/add — bit-identical across backends per scripts/diag_opparity.py):
# that turns the <=2-ulp hardware result into the correctly-rounded one
# on both backends, 0/58212 mismatched bits on the tent-filter corpus.
# The optimization_barriers pin the hardware op and the split constant
# against algebraic rewrites (XLA:TPU otherwise turns a/sqrt(x) into
# a*rsqrt(x), ~110 ulp off on camera directions).
# --------------------------------------------------------------------------

_SPLIT = 4097.0  # 2^12 + 1: Dekker split point for f32 (24-bit).
# Python float, not a jnp array: these primitives are reused inside
# Pallas kernels, which reject captured array constants.

# CRAYTPU_FASTMATH=1 (profiling only): every deterministic primitive
# degrades to its plain hardware form so the cost of the exactness layer
# is directly measurable (scripts/profile_step.py). NOT for production —
# golden parity rides on the exact forms.
import os as _os
_FASTMATH = _os.environ.get("CRAYTPU_FASTMATH", "") == "1"


def _two_prod(x, y):
    """Exact product: returns (p, e) with p + e == x*y exactly
    (Dekker/Veltkamp; valid while 4097*x and x*y stay finite).

    No optimization_barriers: XLA does not reassociate floats by
    default, so c - (c - x) survives on both backends (validated
    bit-level by tests/test_detmath.py and scripts/diag_vs_c.py —
    barriers here are fusion boundaries that materialize 4 MB
    intermediates per op at 1M lanes and cost ~10% end-to-end).
    """
    p = x * y
    c = _SPLIT * x
    hx = c - (c - x)
    lx = x - hx
    c2 = _SPLIT * y
    hy = c2 - (c2 - y)
    ly = y - hy
    e = ((hx * hy - p) + hx * ly + lx * hy) + ly * lx
    return p, e


@jax.custom_jvp
def exact_div(a, b):
    """Correctly-rounded f32 division, bit-identical on CPU and TPU.

    One exact-residual Newton step over the hardware divide: q = a/b
    (<=2 ulp on TPU), r = a - q*b computed exactly via _two_prod, then
    q + r/b. Falls back to the raw q when the correction is non-finite
    (b == 0, infs, or Dekker-split overflow at |x| > ~8e34 — outside
    scene-scale magnitudes), so edge cases keep plain-division
    semantics. NaN lanes stay NaN. AD note: the fallback select keeps a
    non-finite corr out of the forward value, but like every masked
    non-finite it would poison reverse-mode grads — degenerate (b=0)
    lanes must be sanitized upstream exactly as with plain division.
    """
    # No barriers: exact_div's divisors are never a bare sqrt(x) value
    # (exact_sqrt returns s + corr, an add), so XLA:TPU's
    # divide-by-sqrt -> rsqrt rewrite cannot match here; the raw
    # hardware divides are the ops being refined.
    if _FASTMATH:
        return a / b
    q = a / b
    p, e = _two_prod(q, b)
    r = (a - p) - e
    corr = r / b
    return jnp.where(jnp.isfinite(corr), q + corr, q)


@jax.custom_jvp
def exact_sqrt(x):
    """Correctly-rounded f32 sqrt, bit-identical on CPU and TPU.

    Same exact-residual refinement as exact_div: s = sqrt(x) (<=2 ulp
    on TPU), r = x - s*s exact, then s + r/(2s). The barrier also stops
    XLA:TPU's a/sqrt(x) -> a*rsqrt(x) rewrite at call sites that divide
    by the result (scripts/diag_camera.py). s==0 / inf / NaN fall back
    to the hardware result (corr is non-finite there).
    """
    # The only divide that sees the raw hardware sqrt is the refinement
    # correction r/(s+s) — divide-by-add, which the divide-by-sqrt ->
    # rsqrt rewrite cannot match; callers divide by the REFINED s + corr
    # (an add) so they are pattern-safe too. No barriers needed
    # (validated: scripts/diag_camera.py len/dir rows stay 0-ulp).
    if _FASTMATH:
        return jnp.sqrt(x)
    s = jnp.sqrt(x)
    p, e = _two_prod(s, s)
    r = (x - p) - e
    corr = r / (s + s)
    return jnp.where(jnp.isfinite(corr), s + corr, s)


def _split(x):
    """Veltkamp split: x == h + l with h, l each <=12 mantissa bits."""
    c = _SPLIT * x
    h = c - (c - x)
    return h, x - h


def _fma_pre(a, ha, la, b, hb, lb, c):
    """fma(a, b, c) with the operands' splits precomputed (shared
    across several products of the same operand — transforms, crosses).
    UNGUARDED: callers must have scene-scale (finite, |x| < ~8e34)
    operands; det_fma is the guarded public entry."""
    if _FASTMATH:
        return a * b + c
    p = a * b
    e = ((ha * hb - p) + ha * lb + la * hb) + lb * la
    s = p + c
    z = s - p
    t = (p - (s - z)) + (c - z)
    return s + (t + e)


@jax.custom_jvp
def fma_raw(a, b, c):
    """Unguarded det_fma for bounded intermediates (see _fma_pre)."""
    ha, la = _split(a)
    hb, lb = _split(b)
    return _fma_pre(a, ha, la, b, hb, lb, c)


@jax.custom_jvp
def det_fma(a, b, c):
    """Software fused multiply-add: round-once a*b + c, bit-identical on
    CPU and TPU.

    The reference binary is built with -march=native (CMakeLists.txt:41)
    and gcc's default -ffp-contract=fast, so its float chains are full
    of vfmadd instructions; matching its images bit-for-bit requires
    reproducing the SAME single-rounding contractions, and XLA exposes
    no fma op. Emulation: exact product via _two_prod, exact sum via
    Knuth 2Sum, one final rounding. (The final s + (t + e) can double-
    round in rare boundary cases — Boldo/Muller — far below the golden
    comparison's quantization.) Non-finite corrections fall back to the
    plain two-rounding chain.
    """
    if _FASTMATH:
        return a * b + c
    p, e = _two_prod(a, b)
    s = p + c
    z = s - p
    t = (p - (s - z)) + (c - z)
    corr = t + e
    return jnp.where(jnp.isfinite(corr), s + corr, a * b + c)


# ---- plain-math derivative rules for the deterministic primitives.
# The exact forward forms exist for golden BIT parity; their derivatives
# need no such exactness, and AD tracing through the Dekker/2Sum
# internals multiplies the backward graph ~10x (and reintroduces the
# masked-non-finite VJP hazards). Each rule is the textbook derivative
# computed with plain ops; tangents are linear, so reverse mode comes
# free via jvp transposition. ----

@exact_div.defjvp
def _exact_div_jvp(primals, tangents):
    a, b = primals
    da, db = tangents
    q = exact_div(a, b)
    return q, (da - q * db) / b


@exact_sqrt.defjvp
def _exact_sqrt_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    s = exact_sqrt(x)
    return s, dx / (s + s)


@fma_raw.defjvp
def _fma_raw_jvp(primals, tangents):
    a, b, c = primals
    da, db, dc = tangents
    return fma_raw(a, b, c), da * b + a * db + dc


@det_fma.defjvp
def _det_fma_jvp(primals, tangents):
    a, b, c = primals
    da, db, dc = tangents
    return det_fma(a, b, c), da * b + a * db + dc


def dot3_cray(ax, ay, az, bx, by, bz):
    """vecDot exactly as the reference BINARY computes it: the (x, y)
    struct pair + scalar z make gcc emit y*y as the one uncontracted
    product, then fma the x and z terms (disassembly of getCameraRay /
    transformPoint / intersectSphere, scripts/diag_vs_c.py):
        fma(az, bz, fma(ax, bx, ay*by))
    Unguarded (scene-scale operands only — see _fma_pre).
    """
    return fma_raw(az, bz, fma_raw(ax, bx, ay * by))


def vdot_cray(a, b):
    return dot3_cray(a[..., 0], a[..., 1], a[..., 2],
                     b[..., 0], b[..., 1], b[..., 2])


def vec(x, y, z):
    return jnp.stack([jnp.asarray(x, f32), jnp.asarray(y, f32),
                      jnp.asarray(z, f32)])


def vdot(a, b):
    # component-wise, NOT jnp.sum(a*b, axis=-1): the axis reduce pads the
    # minor dim 3 -> 128 on TPU (T(8,128) layout) and a single fused loop
    # of these norms measured 18 ms/step at 1M lanes in device traces.
    # Rounded exactly like the reference binary's contracted vecDot
    # (vdot_cray): fma(az,bz, fma(ax,bx, ay*by)).
    return dot3_cray(a[..., 0], a[..., 1], a[..., 2],
                     b[..., 0], b[..., 1], b[..., 2])


def vcross(a, b):
    # reference-binary rounding: sub(mul, mul) contracts the FIRST
    # product into an fms — cross_i = fma(a_j, b_k, -(a_k * b_j)).
    # Each component appears in two products: split once, reuse.
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    hax, lax = _split(ax)
    hay, lay = _split(ay)
    haz, laz = _split(az)
    hbx, lbx = _split(bx)
    hby, lby = _split(by)
    hbz, lbz = _split(bz)
    return jnp.stack([
        _fma_pre(ay, hay, lay, bz, hbz, lbz, -(az * by)),
        _fma_pre(az, haz, laz, bx, hbx, lbx, -(ax * bz)),
        _fma_pre(ax, hax, lax, by, hby, lby, -(ay * bx)),
    ], axis=-1)


def vlength(a):
    # exact_sqrt, not jnp.sqrt: every caller that divides by a length
    # (vnormalize, hit-record normal/sphere scaling) must get the true
    # sqrt+divide sequence on the TPU backend too — see exact_sqrt
    return exact_sqrt(vdot(a, a))


def vnormalize(a):
    # vector.h:173-176 divides by length (no epsilon guard); exact_div
    # keeps the quotient bit-identical across backends (see exact_div)
    return exact_div(a, vlength(a)[..., None])


def vreflect(incident, n):
    """vecReflect (vector.h:211-213): I - N*(2 dot) contracts to an
    fnma — reflect_i = fma(-N_i, 2dot, I_i)."""
    dot2 = (vdot(n, incident) * f32(2.0))[..., None]
    return fma_raw(-n, dot2, incident)


def refract(in_dir, normal, ni_over_nt):
    """refract (vector.h:252-266). Returns (ok, refracted).

    Reference-binary rounding: 1 - dt*dt, 1 - nn*inner, uv - N*dt and
    C - N*sq all contract to single-rounding fnmas.
    """
    uv = vnormalize(in_dir)
    dt = vdot(uv, normal)
    inner = fma_raw(-dt, dt, f32(1.0))
    nn = ni_over_nt * ni_over_nt
    discriminant = fma_raw(-nn, inner, f32(1.0))
    ok = discriminant > f32(0.0)
    safe_disc = jnp.maximum(discriminant, f32(0.0))
    B = fma_raw(-normal, dt[..., None], uv)
    C = B * ni_over_nt[..., None]
    refracted = fma_raw(-normal, exact_sqrt(safe_disc)[..., None], C)
    return ok, refracted


def schlick(cosine, ior):
    """schlick (vector.h:268-272). powf(x, 5) is expanded to an exact
    multiply chain: jnp.power differs by 1 ulp between backends
    (scripts/diag_opparity.py) while muls are bit-identical; the chain
    is within 1-2 ulp of powf, invisible at image level."""
    r0 = exact_div(f32(1.0) - ior, f32(1.0) + ior)
    r0 = r0 * r0
    x = f32(1.0) - cosine
    x2 = x * x
    return r0 + (f32(1.0) - r0) * (x2 * x2 * x)


def random_on_unit_sphere(kind: str, s: smp.SamplerState):
    """randomOnUnitSphere (vector.h:243-249). Consumes 2 dims."""
    sx, s = smp.get_dimension(kind, s)
    sy, s = smp.get_dimension(kind, s)
    a = sx * (f32(2.0) * PI)
    t = jnp.maximum(f32(0.0), sy * (f32(1.0) - sy))
    r = f32(2.0) * exact_sqrt(t)
    # z = 1 - 2*sy contracts to fnma in the reference binary
    return jnp.stack([jnp.cos(a) * r, jnp.sin(a) * r,
                      fma_raw(f32(-2.0), sy, f32(1.0))], axis=-1), s


def random_coord_on_unit_disc(kind: str, s: smp.SamplerState):
    """randomCoordOnUnitDisc (vector.h:194-198). Consumes 2 dims."""
    d1, s = smp.get_dimension(kind, s)
    r = exact_sqrt(d1)
    d2, s = smp.get_dimension(kind, s)
    theta = d2 * (f32(2.0) * PI)
    return r * jnp.cos(theta), r * jnp.sin(theta), s


def triangle_distribution(v):
    """Tent-filter reshaping of a uniform sample (camera.c:50-56)."""
    orig = v * f32(2.0) - f32(1.0)
    out = exact_div(orig, exact_sqrt(jnp.abs(orig)))
    out = jnp.clip(out, f32(-1.0), f32(1.0))
    sign = jnp.where(orig >= f32(0.0), f32(1.0), f32(-1.0))
    out = out - sign
    # C computes orig/sqrt(|orig|) which is NaN at orig==0; clamp handles
    # +-inf but NaN propagates in C too (probability-zero event for PCG
    # floats, but guard anyway to keep XLA numerics clean).
    return jnp.where(orig == f32(0.0), f32(-1.0), out)


def ortho_basis(i):
    """baseWithVec (vector.h:225-237): PBRT orthonormal basis."""
    cond = jnp.abs(i[..., 0]) > jnp.abs(i[..., 1])
    len_a = exact_sqrt(i[..., 0] ** 2 + i[..., 2] ** 2)
    j_a = jnp.stack([exact_div(-i[..., 2], len_a), jnp.zeros_like(len_a),
                     exact_div(i[..., 0], len_a)], axis=-1)
    len_b = exact_sqrt(i[..., 1] ** 2 + i[..., 2] ** 2)
    j_b = jnp.stack([jnp.zeros_like(len_b), exact_div(i[..., 2], len_b),
                     exact_div(-i[..., 1], len_b)], axis=-1)
    j = jnp.where(cond[..., None], j_a, j_b)
    return i, j, vcross(i, j)


def mat34_point(A, p):
    """Affine transform of a point: A (..., 3, 4) @ [p, 1].

    Rounded exactly like the reference BINARY's transformPoint
    (disassembly: one uncontracted y product, fma x, fma z, plain
    translation add): out_i = fma(z, Ai2, fma(x, Ai0, y*Ai1)) + Ai3.
    NOT einsum/@: matmul lowering differs between backends (MXU 6-pass
    emulation vs AVX loops, ~2 ulp apart — scripts/diag_camera.py
    w_dir row), and a 3x4 matvec is too small for the MXU anyway.
    """
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    hx, lx = _split(x)
    hz, lz = _split(z)

    def row(i):
        m0, m2 = A[..., i, 0], A[..., i, 2]
        h0, l0 = _split(m0)
        h2, l2 = _split(m2)
        inner = _fma_pre(x, hx, lx, m0, h0, l0, y * A[..., i, 1])
        return _fma_pre(z, hz, lz, m2, h2, l2, inner) + A[..., i, 3]

    return jnp.stack([row(0), row(1), row(2)], axis=-1)


def mat33_vec(A, v):
    """Linear transform: A (..., 3, >=3)'s 3x3 part @ v (..., 3), with
    the reference binary's transformVector rounding (see mat34_point)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    hx, lx = _split(x)
    hz, lz = _split(z)

    def row(i):
        m0, m2 = A[..., i, 0], A[..., i, 2]
        h0, l0 = _split(m0)
        h2, l2 = _split(m2)
        inner = _fma_pre(x, hx, lx, m0, h0, l0, y * A[..., i, 1])
        return _fma_pre(z, hz, lz, m2, h2, l2, inner)

    return jnp.stack([row(0), row(1), row(2)], axis=-1)


def mat33_vec_T(A, v):
    """Transpose transform: (A^T) @ v — transformVectorWithTranspose,
    same per-component rounding pattern as mat33_vec."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    hx, lx = _split(x)
    hz, lz = _split(z)

    def col(i):
        m0, m2 = A[..., 0, i], A[..., 2, i]
        h0, l0 = _split(m0)
        h2, l2 = _split(m2)
        inner = _fma_pre(x, hx, lx, m0, h0, l0, y * A[..., 1, i])
        return _fma_pre(z, hz, lz, m2, h2, l2, inner)

    return jnp.stack([col(0), col(1), col(2)], axis=-1)


def wrap_min_max(x, lo, hi):
    """wrapMinMax (vector.h:215-221)."""
    rng = hi - lo
    return lo + jnp.mod(rng + jnp.mod(x - lo, rng), rng)


def along_ray(start, direction, t):
    """alongRay (lightray.h): start + dir*t contracts to an fma."""
    return det_fma(direction, jnp.asarray(t, f32)[..., None], start)
