"""Deterministic float layer (vecmath.exact_div/exact_sqrt/det_fma).

These primitives carry the cross-backend golden-parity story (VERDICT
r4 #1): they must be (a) correctly rounded vs f64 references and (b)
composed into the reference binary's contraction patterns. Runs on the
CPU mesh like the rest of the suite; the TPU side was validated against
the same dumps (scripts/diag_opparity.py, diag_vs_c.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from craytpu.ops import vecmath as vm

f32 = np.float32


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1234)


def test_exact_div_correctly_rounded(rng):
    a = rng.uniform(-2000, 2000, 1 << 14).astype(f32)
    b = rng.uniform(-4, 4, 1 << 14).astype(f32)
    b[np.abs(b) < 1e-6] = 1.0
    got = np.asarray(jax.jit(vm.exact_div)(jnp.asarray(a),
                                           jnp.asarray(b)))
    want = (a.astype(np.float64) / b.astype(np.float64)).astype(f32)
    np.testing.assert_array_equal(got, want)


def test_exact_div_edge_cases():
    a = np.array([1.0, -1.0, 0.0, 1.0, np.inf, 1e38], f32)
    b = np.array([0.0, 0.0, 0.0, np.inf, 1.0, 1e-38], f32)
    got = np.asarray(jax.jit(vm.exact_div)(jnp.asarray(a),
                                           jnp.asarray(b)))
    # falls back to the hardware quotient: inf/-inf/NaN/0/inf pass through
    assert np.isposinf(got[0]) and np.isneginf(got[1])
    assert np.isnan(got[2])
    assert got[3] == 0.0 and np.isposinf(got[4])


def test_exact_sqrt_correctly_rounded(rng):
    x = np.concatenate([
        rng.uniform(0, 4e6, 1 << 14).astype(f32),
        np.array([0.0, 1.0, 2.0, np.inf], f32)])
    got = np.asarray(jax.jit(vm.exact_sqrt)(jnp.asarray(x)))
    want = np.sqrt(x.astype(np.float64)).astype(f32)
    np.testing.assert_array_equal(got, want)


def test_det_fma_single_rounding(rng):
    a = rng.uniform(-100, 100, 1 << 14).astype(f32)
    b = rng.uniform(-100, 100, 1 << 14).astype(f32)
    # c near -a*b exercises the cancellation where fma vs mul+add differ
    c = (-(a * b) * rng.uniform(0.99, 1.01, a.shape)).astype(f32)
    got = np.asarray(jax.jit(vm.det_fma)(*map(jnp.asarray, (a, b, c))))
    want = (a.astype(np.float64) * b.astype(np.float64)
            + c.astype(np.float64)).astype(f32)
    # f64 emulation of f32 fma is exact up to ~2^-29-probability
    # double-rounding ties; on 16k samples demand exactness
    np.testing.assert_array_equal(got, want)


def test_det_fma_differs_from_two_roundings():
    # a case where fl(fl(a*b) + c) != fma(a, b, c): the single rounding
    # must win (this is the bit the golden parity rides on)
    a = np.float32(1.4376432)
    b = np.float32(1.8458207)
    c = np.float32(-2.6536329)
    two_step = np.float32(np.float32(a * b) + c)
    fused = (np.float64(a) * np.float64(b) + np.float64(c)).astype(f32)
    assert two_step != fused, "test vector no longer discriminates"
    got = np.asarray(jax.jit(vm.det_fma)(jnp.asarray([a]),
                                         jnp.asarray([b]),
                                         jnp.asarray([c])))[0]
    assert got == fused


def test_vdot_reference_pattern(rng):
    av = rng.uniform(-10, 10, (1 << 12, 3)).astype(f32)
    bv = rng.uniform(-10, 10, (1 << 12, 3)).astype(f32)
    got = np.asarray(jax.jit(vm.vdot)(jnp.asarray(av), jnp.asarray(bv)))
    a64 = av.astype(np.float64)
    b64 = bv.astype(np.float64)
    # fma(az,bz, fma(ax,bx, ay*by)) with f32 roundings at each fma
    inner = (a64[:, 0] * b64[:, 0]
             + (av[:, 1] * bv[:, 1]).astype(f32)).astype(f32)
    want = (a64[:, 2] * b64[:, 2] + inner.astype(np.float64)).astype(f32)
    np.testing.assert_array_equal(got, want)


def test_vnormalize_unit_length(rng):
    v = rng.uniform(-5, 5, (1 << 10, 3)).astype(f32)
    n = np.asarray(jax.jit(vm.vnormalize)(jnp.asarray(v)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0,
                               atol=4e-7)


def test_exact_ops_grads_finite(rng):
    # the differentiable render path runs through these; grads must be
    # clean where inputs are non-degenerate
    def f(x):
        return jnp.sum(vm.exact_div(x, x + 2.0)
                       + vm.exact_sqrt(x + 3.0)
                       + vm.det_fma(x, x, x))
    g = jax.grad(f)(jnp.asarray([0.5, 1.5], jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
