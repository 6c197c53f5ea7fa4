"""Math/vecmath node parity tests — mirrors the reference's node suites
(tests/test_math.h: 15 ops, tests/test_vecmath.h: 10 ops) against our
compiled node graphs (nodes/converter/math.c:42-95, vecmath.c:41-81)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from craytpu.ops import shading
from craytpu.scene import nodegraph as ng


def _eval_value(ir, rec=None):
    reg = shading.Registry([])
    fn = shading.compile_value(ir, reg)
    params = reg.finalize(np.zeros((1, 4), np.float32),
                          np.ones(1, np.float32))
    rec = rec or shading.dummy_rec(jnp.zeros((1, 3), jnp.float32))
    return float(np.asarray(fn(params, rec))[0])


def _eval_vec(ir):
    reg = shading.Registry([])
    fn = shading.compile_vector(ir, reg)
    params = reg.finalize(np.zeros((1, 4), np.float32),
                          np.ones(1, np.float32))
    rec = shading.dummy_rec(jnp.zeros((1, 3), jnp.float32))
    v, f = fn(params, rec)
    return np.asarray(v)[0], float(np.asarray(f)[0])


def _math(a, b, op):
    return _eval_value(ng.math(ng.const_value(a), ng.const_value(b), op))


@pytest.mark.parametrize("a,b,op,want", [
    (2.0, 3.0, "Add", 5.0),
    (5.0, 3.0, "Subtract", 2.0),
    (2.0, 3.0, "Multiply", 6.0),
    (6.0, 3.0, "Divide", 2.0),
    (2.0, 10.0, "Power", 1024.0),
    (100.0, 0.0, "Log", 2.0),
    (9.0, 0.0, "SquareRoot", 3.0),
    (-4.5, 0.0, "Absolute", 4.5),
    (2.0, 5.0, "Min", 2.0),
    (2.0, 5.0, "Max", 5.0),
    (0.0, 0.0, "Sine", 0.0),
    (0.0, 0.0, "Cosine", 1.0),
    (0.0, 0.0, "Tangent", 0.0),
    (180.0, 0.0, "ToRadians", math.pi),
    (math.pi, 0.0, "ToDegrees", 180.0),
])
def test_math_ops(a, b, op, want):
    assert _math(a, b, op) == pytest.approx(want, rel=1e-5, abs=1e-6)


def test_math_nested():
    # sqrt(abs(-(2+2)*4)) = 4, like the composed graphs in test_math.h
    ir = ng.math(
        ng.math(
            ng.math(ng.math(ng.const_value(2), ng.const_value(2), "Add"),
                    ng.const_value(4), "Multiply"),
            ng.const_value(0), "Absolute"),
        ng.const_value(0), "SquareRoot")
    assert _eval_value(ir) == pytest.approx(4.0)


A = (1.0, 2.0, 3.0)
B = (4.0, 5.0, 6.0)


@pytest.mark.parametrize("op,wantv,wantf", [
    ("VecAdd", (5.0, 7.0, 9.0), 0.0),
    ("VecSubtract", (-3.0, -3.0, -3.0), 0.0),
    ("VecMultiply", (4.0, 10.0, 18.0), 0.0),
    ("VecAverage", (2.5, 3.5, 4.5), 0.0),
    ("VecDot", None, 32.0),
    ("VecCross", (-3.0, 6.0, -3.0), 0.0),
    ("VecLength", None, math.sqrt(14.0)),
    ("VecAbs", (1.0, 2.0, 3.0), 0.0),
])
def test_vecmath_ops(op, wantv, wantf):
    v, f = _eval_vec(ng.vec_math(ng.const_vec(A), ng.const_vec(B), op))
    if wantv is not None:
        np.testing.assert_allclose(v, wantv, rtol=1e-6)
    assert f == pytest.approx(wantf, rel=1e-6)


def test_vec_normalize_reflect():
    v, _ = _eval_vec(ng.vec_math(ng.const_vec((3.0, 0.0, 0.0)),
                                 ng.const_vec((0.0, 0.0, 0.0)),
                                 "VecNormalize"))
    np.testing.assert_allclose(v, (1.0, 0.0, 0.0), rtol=1e-6)
    # reflect((1,-1,0) incident, (0,1,0) normal) = (1,1,0)
    v, _ = _eval_vec(ng.vec_math(ng.const_vec((1.0, -1.0, 0.0)),
                                 ng.const_vec((0.0, 1.0, 0.0)),
                                 "VecReflect"))
    np.testing.assert_allclose(v, (1.0, 1.0, 0.0), rtol=1e-6)


def test_grayscale_and_blackbody():
    # HSP luminance of pure red
    ir = ng.grayscale(ng.const_color((1.0, 0.0, 0.0, 1.0)))
    assert _eval_value(ir) == pytest.approx(math.sqrt(0.299), rel=1e-4)
    # blackbody 6600K is near-white (colorForKelvin crossover point)
    rgba = ng.color_for_kelvin(6600.0)
    assert rgba[0] == pytest.approx(1.0, abs=2e-2)
    assert rgba[2] == pytest.approx(1.0, abs=0.1)


def test_fresnel_schlick():
    # normal incidence on ior=1.5: R0 = ((1-1.5)/(2.5))^2 = 0.04
    rec = shading.HitRec(
        incident=jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
        normal=jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32),
        uv=jnp.zeros((1, 2), jnp.float32),
        hit_point=jnp.zeros((1, 3), jnp.float32),
        distance=jnp.ones(1, jnp.float32),
        emission=jnp.zeros((1, 4), jnp.float32),
        ior=jnp.ones(1, jnp.float32),
        mat_id=jnp.zeros(1, jnp.int32))
    val = _eval_value(ng.fresnel(ng.const_value(1.5), None), rec)
    assert val == pytest.approx(0.04, rel=1e-3)
