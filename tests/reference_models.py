"""Pure-Python bit-exact models of the reference's RNG/hash primitives.

These mirror the C sources (pcg_basic.c, samplers/common.h) using Python
integers masked to 32/64 bits; the JAX implementations are validated against
them bit-for-bit.
"""

import math
import struct

M64 = (1 << 64) - 1
M32 = (1 << 32) - 1
PCG_MUL = 6364136223846793005


def pcg32_seed(seed):
    """pcg32_srandom_r(rng, seed, 0) -> state (pcg_basic.c:42-49)."""
    state = 0
    inc = 1
    state = (state * PCG_MUL + inc) & M64
    state = (state + seed) & M64
    state = (state * PCG_MUL + inc) & M64
    return state


def pcg32_next(state):
    """pcg32_random_r (pcg_basic.c:60-68) -> (out, new_state)."""
    old = state
    state = (old * PCG_MUL + 1) & M64
    xorshifted = (((old >> 18) ^ old) >> 27) & M32
    rot = old >> 59
    out = ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & M32
    return out, state


def f32(x):
    return struct.unpack("f", struct.pack("f", x))[0]


def pcg32_float(state):
    out, state = pcg32_next(state)
    return f32(f32(out) * f32(1.0 / (1 << 32))), state


def hash32(x):
    x &= M32
    x = ((x ^ 12345391) * 2654435769) & M32
    x ^= ((x << 6) ^ (x >> 26)) & M32
    x &= M32
    x = (x * 2654435769) & M32
    x = (x + ((x << 5) ^ (x >> 12))) & M32
    return x


def hash64(x):
    x &= M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M64
    x = x ^ (x >> 31)
    return x


def uint_to_unit_real(v):
    bits = ((v & M32) >> 9) | 0x3F800000
    return f32(struct.unpack("f", struct.pack("I", bits))[0] - 1.0)


def radical_inverse(p, base):
    inv_base = f32(1.0 / base)
    reversed_digits = 0
    inv_base_n = 1.0
    while p:
        nxt = p // base
        digit = p - base * nxt
        reversed_digits = reversed_digits * base + digit
        inv_base_n = f32(inv_base_n * inv_base)
        p = nxt
    return min(f32(reversed_digits * inv_base_n), f32(0.99999994))


def wrap_add(u, v):
    s = f32(u + v)
    return s if s < 1.0 else f32(s - 1.0)


HALTON_PRIMES = (2, 3, 5, 7, 11, 13)


def random_stream(pixel_index, max_passes, pass_idx, n):
    """The reference's batch-mode per-(pixel,pass) stream (renderer.c:281)."""
    seed = hash64((pixel_index * max_passes + pass_idx) & M32)
    state = pcg32_seed(seed)
    out = []
    for _ in range(n):
        v, state = pcg32_float(state)
        out.append(v)
    return out


def halton_stream(pixel_index, pass_idx, n):
    offset = uint_to_unit_real(hash32(pixel_index))
    out = []
    for i in range(n):
        ri = radical_inverse(pass_idx, HALTON_PRIMES[i % 6])
        out.append(wrap_add(ri, offset))
    return out
