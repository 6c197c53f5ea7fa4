"""Per-pixel sample-stream samplers with reference parity.

Mirrors renderer/samplers/sampler.c: a sampler is (re)initialised per
(pixel, pass) and hands out one float dimension at a time. Three types:

  RANDOM     — PCG32 seeded with hash64(pixelIndex * maxPasses + pass)
               (sampler.c:41-43); used by the batch renderer (renderer.c:281).
  HALTON     — radical-inverse sequence over primes {2,3,5,7,11,13} with a
               per-pixel Cranley-Patterson rotation seeded by
               hash(pixelIndex) (sampler.c:33-35, halton.c); used by the
               progressive/interactive renderer (renderer.c:206).
  HAMMERSLEY — kept for completeness; reference marks it "Wrong"
               (hammersley.c:25) and never selects it.

State is a flat NamedTuple of scalars so that a whole wavefront of rays can
carry a state each (via vmap) and advance *conditionally*: use
`select_state(cond, advanced, original)` to preserve per-ray stream parity
when only some lanes consume a dimension.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from craytpu.ops import pcg

u32 = jnp.uint32
i32 = jnp.int32
f32 = jnp.float32

RANDOM = "random"
HALTON = "halton"
HAMMERSLEY = "hammersley"


class SamplerState(NamedTuple):
    # PCG32 state for RANDOM
    pcg_hi: jnp.ndarray
    pcg_lo: jnp.ndarray
    # Halton/Hammersley state
    rnd_offset: jnp.ndarray
    curr_prime: jnp.ndarray
    curr_pass: jnp.ndarray
    max_passes: jnp.ndarray


def init_sampler(kind: str, pass_idx, max_passes, pixel_index) -> SamplerState:
    """initSampler (sampler.c:31-46). kind is static."""
    pixel_index = jnp.asarray(pixel_index, u32)
    pass_idx = jnp.asarray(pass_idx, i32)
    max_passes = jnp.asarray(max_passes, i32)
    if kind == RANDOM:
        # seed = hash64(pixelIndex * maxPasses + pass): uint32 arithmetic
        # (C usual conversions), then zero-extended to 64 bits.
        seed_lo = pixel_index * max_passes.astype(u32) + pass_idx.astype(u32)
        sh, sl = pcg.hash64(jnp.zeros_like(seed_lo), seed_lo)
        ph, plo = pcg.pcg32_seed(sh, sl)
        z32 = jnp.zeros_like(pass_idx)
        return SamplerState(ph, plo, jnp.zeros_like(plo, dtype=f32), z32,
                            pass_idx, max_passes)
    elif kind in (HALTON, HAMMERSLEY):
        offset = pcg.uint_to_unit_real(pcg.hash32(pixel_index))
        z = jnp.zeros_like(pixel_index)
        return SamplerState(z, z, offset, jnp.zeros_like(pass_idx),
                            pass_idx, max_passes)
    raise ValueError(f"unknown sampler kind {kind!r}")


def get_dimension(kind: str, s: SamplerState):
    """getDimension (sampler.c:48-58). Returns (value, new_state)."""
    if kind == RANDOM:
        v, nh, nl = pcg.pcg32_float(s.pcg_hi, s.pcg_lo)
        return v, s._replace(pcg_hi=nh, pcg_lo=nl)
    if kind == HALTON:
        v, nxt = pcg.halton_dimension(s.curr_pass, s.curr_prime, s.rnd_offset)
        return v, s._replace(curr_prime=nxt)
    if kind == HAMMERSLEY:
        base = jnp.asarray(pcg.HALTON_PRIMES, i32)[
            s.curr_prime % len(pcg.HALTON_PRIMES)]
        ri = pcg.radical_inverse_dyn(s.curr_pass, base)
        # reference: currPrime only advances when currPass > 0
        taken = s.curr_pass > 0
        u = jnp.where(taken, ri,
                      (s.curr_pass // s.max_passes).astype(f32))
        v = pcg.wrap_add(u, s.rnd_offset)
        return v, s._replace(curr_prime=s.curr_prime + taken.astype(i32))
    raise ValueError(f"unknown sampler kind {kind!r}")


def select_state(cond, a: SamplerState, b: SamplerState) -> SamplerState:
    """Per-lane select between two sampler states (masked advance).

    Fields the advance did not touch are the SAME array object on both
    sides (e.g. RANDOM only moves pcg_hi/pcg_lo) — skip their where:
    the narrow (B,) selects are measurably expensive at 1M lanes."""
    return jax.tree.map(
        lambda x, y: x if x is y else jnp.where(cond, x, y), a, b)
