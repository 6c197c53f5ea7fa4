"""PCG32 RNG and hash functions with bit parity to the reference renderer.

TPUs have no native 64-bit integers, so all 64-bit arithmetic is emulated on
(hi, lo) uint32 pairs. Semantics mirror:
  - pcg32 generator        libraries/pcg_basic.c:42-67
  - Thomas Wang hash       renderer/samplers/common.h:14-20
  - splitmix-style hash64  renderer/samplers/common.h:22-27
  - uintToUnitReal         renderer/samplers/common.h:48-56
  - radicalInverse (PBRT)  renderer/samplers/common.h:34-46

All functions are scalar-style and jit/vmap-friendly: pass uint32 scalars (or
identically-shaped arrays) in, get uint32 out. Bit-exactness against a pure
Python model is enforced by tests/test_pcg.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

u32 = jnp.uint32
i32 = jnp.int32
f32 = jnp.float32

# 6364136223846793005 = 0x5851F42D4C957F2D (pcg_basic.c:63)
_PCG_MUL_HI = 0x5851F42D
_PCG_MUL_LO = 0x4C957F2D


def _c(x):
    return jnp.asarray(x, dtype=u32)


def mul32_hi_lo(a, b):
    """Full 32x32 -> 64 multiply, returns (hi, lo) uint32."""
    a = _c(a)
    b = _c(b)
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    a0b0 = a0 * b0
    a1b0 = a1 * b0
    a0b1 = a0 * b1
    a1b1 = a1 * b1
    carry = ((a0b0 >> 16) + (a1b0 & 0xFFFF) + (a0b1 & 0xFFFF)) >> 16
    lo = a0b0 + ((a1b0 + a0b1) << 16)
    hi = a1b1 + (a1b0 >> 16) + (a0b1 >> 16) + carry
    return hi, lo


def add64(ah, al, bh, bl):
    lo = _c(al) + _c(bl)
    carry = (lo < _c(al)).astype(u32)
    hi = _c(ah) + _c(bh) + carry
    return hi, lo


def mul64(ah, al, bh, bl):
    """(a * b) mod 2^64 on uint32 pairs."""
    p_hi, p_lo = mul32_hi_lo(al, bl)
    hi = p_hi + _c(al) * _c(bh) + _c(ah) * _c(bl)
    return hi, p_lo


def shr64(ah, al, n: int):
    """Logical right shift of a u64 pair by a static 0<n<32."""
    assert 0 < n < 32
    lo = (_c(al) >> n) | (_c(ah) << (32 - n))
    hi = _c(ah) >> n
    return hi, lo


def xor64(ah, al, bh, bl):
    return _c(ah) ^ _c(bh), _c(al) ^ _c(bl)


def hash32(x):
    """Thomas Wang integer hash (samplers/common.h:14-20)."""
    x = _c(x)
    x = (x ^ _c(12345391)) * _c(2654435769)
    x = x ^ ((x << 6) ^ (x >> 26))
    x = x * _c(2654435769)
    x = x + ((x << 5) ^ (x >> 12))
    return x


def hash64(xh, xl):
    """Stafford/splitmix-style 64-bit hash (samplers/common.h:22-27)."""
    xh, xl = _c(xh), _c(xl)
    h, l = shr64(xh, xl, 30)
    xh, xl = xor64(xh, xl, h, l)
    xh, xl = mul64(xh, xl, _c(0xBF58476D), _c(0x1CE4E5B9))
    h, l = shr64(xh, xl, 27)
    xh, xl = xor64(xh, xl, h, l)
    xh, xl = mul64(xh, xl, _c(0x94D049BB), _c(0x133111EB))
    h, l = shr64(xh, xl, 31)
    xh, xl = xor64(xh, xl, h, l)
    return xh, xl


def pcg32_seed(seed_hi, seed_lo):
    """State after pcg32_srandom_r(rng, seed, 0) (pcg_basic.c:42-49).

    With initseq=0: inc=1; state = (seed + 1) * MUL + 1 (mod 2^64).
    """
    sh, sl = add64(seed_hi, seed_lo, _c(0), _c(1))
    sh, sl = mul64(sh, sl, _c(_PCG_MUL_HI), _c(_PCG_MUL_LO))
    return add64(sh, sl, _c(0), _c(1))


def pcg32_next(state_hi, state_lo):
    """One pcg32_random_r step (pcg_basic.c:60-68).

    Returns (out_u32, new_state_hi, new_state_lo).
    """
    oh, ol = _c(state_hi), _c(state_lo)
    nh, nl = mul64(oh, ol, _c(_PCG_MUL_HI), _c(_PCG_MUL_LO))
    nh, nl = add64(nh, nl, _c(0), _c(1))  # inc = 1
    # xorshifted = (uint32)(((old >> 18) ^ old) >> 27)
    sh, sl = shr64(oh, ol, 18)
    xh, xl = xor64(oh, ol, sh, sl)
    _, xorshifted = shr64(xh, xl, 27)
    rot = oh >> 27  # old >> 59
    out = (xorshifted >> rot) | (xorshifted << ((_c(32) - rot) & 31))
    # rot == 0 needs out == xorshifted; (32-0)&31 == 0 so the | keeps it exact.
    return out, nh, nl


def pcg32_float(state_hi, state_lo):
    """getRandom (samplers/random.c:16-21): u32 * 2^-32 as float32."""
    out, nh, nl = pcg32_next(state_hi, state_lo)
    v = out.astype(f32) * f32(1.0 / 4294967296.0)
    return v, nh, nl


def uint_to_unit_real(v):
    """[1,2) bit trick minus 1 (samplers/common.h:48-56)."""
    bits = (_c(v) >> 9) | _c(0x3F800000)
    return jax.lax.bitcast_convert_type(bits, f32) - f32(1.0)


# Halton prime bases (samplers/halton.c:16)
HALTON_PRIMES = (2, 3, 5, 7, 11, 13)


def radical_inverse(pass_idx, base: int):
    """PBRT radical inverse in a static base (samplers/common.h:34-46)."""
    inv_base = f32(1.0 / base)

    def cond(c):
        p, _, _ = c
        return p > 0

    def body(c):
        p, rev, inv_n = c
        nxt = p // base
        digit = p - base * nxt
        return nxt, rev * base + digit, inv_n * inv_base

    p0 = jnp.asarray(pass_idx, i32)
    _, reversed_digits, inv_base_n = jax.lax.while_loop(
        cond, body, (p0, jnp.asarray(0, i32), f32(1.0))
    )
    return jnp.minimum(reversed_digits.astype(f32) * inv_base_n, f32(0.99999994))


def wrap_add(u, v):
    """(u + v) mod 1 without fmod (samplers/common.h:29-31)."""
    s = u + v
    return jnp.where(s < f32(1.0), s, s - f32(1.0))


def radical_inverse_dyn(pass_idx, base):
    """radical_inverse with a TRACED (possibly per-lane) base.

    Bit-identical to the static version: inv_base = 1/base is a correctly
    rounded f32 division, equal to f32(1.0/b) for every Halton prime, and
    the digit loop performs the same f32 multiplies in the same order.
    The while_loop runs until EVERY lane's digits are exhausted; finished
    lanes hold their values (where-guarded), so per-lane results match
    the scalar loop exactly."""
    base = jnp.asarray(base, i32)
    inv_base = f32(1.0) / base.astype(f32)

    def cond(c):
        p, _, _ = c
        return jnp.any(p > 0)

    def body(c):
        p, rev, inv_n = c
        nxt = p // base
        digit = p - base * nxt
        active = p > 0
        rev = jnp.where(active, rev * base + digit, rev)
        inv_n = jnp.where(active, inv_n * inv_base, inv_n)
        return jnp.where(active, nxt, p), rev, inv_n

    p0 = jnp.asarray(pass_idx, i32)
    _, reversed_digits, inv_base_n = jax.lax.while_loop(
        cond, body, (p0, jnp.zeros_like(p0),
                     jnp.full(jnp.shape(p0), 1.0, f32)))
    return jnp.minimum(reversed_digits.astype(f32) * inv_base_n,
                       f32(0.99999994))


def halton_dimension(pass_idx, prime_idx, rnd_offset):
    """One Halton sample with Cranley-Patterson rotation (halton.c:25-31).

    prime_idx is the running dimension counter; base cycles through the 6
    primes. Works on scalars AND per-lane arrays (the wavefront advances
    each lane's dimension counter independently), so the base is fetched
    from a table and the radical inverse runs with a traced base.
    Returns (value, next_prime_idx).
    """
    prime_idx = jnp.asarray(prime_idx, i32)
    base = jnp.asarray(HALTON_PRIMES, i32)[prime_idx % len(HALTON_PRIMES)]
    ri = radical_inverse_dyn(pass_idx, base)
    return wrap_add(ri, rnd_offset), prime_idx + 1
