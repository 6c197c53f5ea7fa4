"""Bit-exact parity of the JAX PCG32/hash/Halton vs the pure-Python model."""

import numpy as np
import jax
import jax.numpy as jnp

from craytpu.ops import pcg, sampler
from tests import reference_models as ref


def split64(x):
    return np.uint32(x >> 32), np.uint32(x & 0xFFFFFFFF)


def join64(hi, lo):
    return (int(hi) << 32) | int(lo)


def test_mul64():
    rng = np.random.default_rng(0)
    for _ in range(200):
        a = int(rng.integers(0, 1 << 64, dtype=np.uint64))
        b = int(rng.integers(0, 1 << 64, dtype=np.uint64))
        ah, al = split64(a)
        bh, bl = split64(b)
        h, l = jax.jit(pcg.mul64)(ah, al, bh, bl)
        assert join64(h, l) == (a * b) & ref.M64


def test_hash32():
    xs = np.array([0, 1, 17, 123456, 0xFFFFFFFF, 2654435769], dtype=np.uint32)
    got = jax.jit(jax.vmap(pcg.hash32))(xs)
    want = [ref.hash32(int(x)) for x in xs]
    assert [int(g) for g in got] == want


def test_hash64():
    rng = np.random.default_rng(1)
    for _ in range(100):
        x = int(rng.integers(0, 1 << 64, dtype=np.uint64))
        xh, xl = split64(x)
        h, l = jax.jit(pcg.hash64)(xh, xl)
        assert join64(h, l) == ref.hash64(x)


def test_pcg32_stream():
    rng = np.random.default_rng(2)
    for _ in range(20):
        seed = int(rng.integers(0, 1 << 64, dtype=np.uint64))
        state = ref.pcg32_seed(seed)
        sh, sl = jax.jit(pcg.pcg32_seed)(*split64(seed))
        assert join64(sh, sl) == state
        for _ in range(16):
            out_ref, state = ref.pcg32_next(state)
            out, sh, sl = jax.jit(pcg.pcg32_next)(sh, sl)
            assert int(out) == out_ref
            assert join64(sh, sl) == state


def test_pcg32_float_exact():
    seed = 42
    state = ref.pcg32_seed(seed)
    sh, sl = pcg.pcg32_seed(*split64(seed))
    for _ in range(10):
        v_ref, state = ref.pcg32_float(state)
        v, sh, sl = jax.jit(pcg.pcg32_float)(sh, sl)
        assert np.float32(v) == np.float32(v_ref)


def test_uint_to_unit_real():
    xs = np.array([0, 1, 0xFFFFFFFF, 0x80000000, 12345], dtype=np.uint32)
    got = jax.jit(jax.vmap(pcg.uint_to_unit_real))(xs)
    for g, x in zip(got, xs):
        assert np.float32(g) == np.float32(ref.uint_to_unit_real(int(x)))


def test_radical_inverse():
    f = jax.jit(lambda p: pcg.radical_inverse(p, 3))
    for p in [0, 1, 2, 5, 9, 27, 100, 12345]:
        assert np.float32(f(p)) == np.float32(ref.radical_inverse(p, 3))


def test_random_sampler_stream_parity():
    """The exact stream consumed per (pixel, pass) in batch mode."""
    for pix, spp, p in [(0, 25, 0), (12345, 25, 7), (1023 * 799, 100, 99)]:
        want = ref.random_stream(pix, spp, p, 12)
        s = sampler.init_sampler(sampler.RANDOM, p, spp, pix)
        got = []
        for _ in range(12):
            v, s = jax.jit(
                lambda st: sampler.get_dimension(sampler.RANDOM, st))(s)
            got.append(np.float32(v))
        assert got == [np.float32(w) for w in want]


def test_halton_sampler_stream_parity():
    for pix, p in [(0, 1), (77, 3), (5000, 250)]:
        want = ref.halton_stream(pix, p, 9)
        s = sampler.init_sampler(sampler.HALTON, p, 100, pix)
        got = []
        for _ in range(9):
            v, s = jax.jit(
                lambda st: sampler.get_dimension(sampler.HALTON, st))(s)
            got.append(np.float32(v))
        np.testing.assert_allclose(got, [np.float32(w) for w in want],
                                   rtol=0, atol=0)


def test_vmapped_streams_independent():
    pix = jnp.arange(64, dtype=jnp.uint32)
    s = jax.vmap(lambda px: sampler.init_sampler(sampler.RANDOM, 3, 25, px))(pix)
    v, _ = jax.jit(jax.vmap(
        lambda st: sampler.get_dimension(sampler.RANDOM, st)))(s)
    want = [ref.random_stream(int(p), 25, 3, 1)[0] for p in pix]
    np.testing.assert_array_equal(np.asarray(v), np.float32(want))


def test_halton_dimension_batched_matches_scalar():
    """The wavefront advances each lane's Halton dimension counter
    independently (conditional sampler consumption), so halton_dimension
    must accept PER-LANE prime indices and match the scalar path
    bit-exactly (the --iterative product tier runs this batched)."""
    import jax.numpy as jnp
    from craytpu.ops import pcg

    passes = np.array([0, 1, 2, 3, 7, 100, 12345, 1 << 20], np.int32)
    primes = np.array([0, 1, 2, 3, 4, 5, 6, 13], np.int32)
    offs = np.linspace(0.0, 0.9, passes.size).astype(np.float32)
    vb, nb = pcg.halton_dimension(jnp.asarray(passes), jnp.asarray(primes),
                                  jnp.asarray(offs))
    for k in range(passes.size):
        vs, ns = pcg.halton_dimension(jnp.int32(passes[k]),
                                      jnp.int32(primes[k]),
                                      jnp.float32(offs[k]))
        assert float(vs) == float(vb[k]), (k, float(vs), float(vb[k]))
        assert int(ns) == int(nb[k])
