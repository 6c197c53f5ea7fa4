"""Compaction-scheduled differentiable trace: identical image and
identical gradients to the plain fixed-depth trace (the same paths run
with the same sample streams; compaction only packs live lanes), at a
fraction of the bounce-step cost."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from craytpu.scene.sceneloader import load_scene_from_file
from craytpu.scene.compile import compile_scene
from craytpu.models.wavefront_pt import WavefrontRenderer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENE = os.path.join(REPO, "assets", "entry_scene.json")
DEPTH = 10


def _setup():
    cs = compile_scene(load_scene_from_file(SCENE))
    r = WavefrontRenderer(cs)
    W, H = r.width, r.height
    xs = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    ys = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    return cs, r, xs, ys


def test_census_schedule_shrinks():
    cs, r, xs, ys = _setup()
    sched = r.census_schedule(xs, ys, spp=2, depth=DEPTH, min_width=64)
    assert sched[0] == (0, xs.shape[0])
    widths = [w for _, w in sched]
    assert widths == sorted(widths, reverse=True)
    assert len(sched) >= 2          # the live set does shrink
    # derived widths are pow2 (the initial width is the batch size B)
    assert all(w & (w - 1) == 0 for _, w in sched[1:])


def test_compacted_trace_matches_plain_forward_and_grad():
    cs, r, xs, ys = _setup()
    sched = r.census_schedule(xs, ys, spp=3, depth=DEPTH, min_width=64)
    plain = jax.jit(r.make_trace_fn(depth=DEPTH))
    for remat in (False, True, "segment"):
        comp = jax.jit(r.make_trace_fn(depth=DEPTH, remat=remat,
                                       compaction=sched))
        a = plain(cs.params, xs, ys, jnp.int32(1), jnp.int32(3))
        b = comp(cs.params, xs, ys, jnp.int32(1), jnp.int32(3))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)

    def loss(trace):
        def f(params):
            img = trace(params, xs, ys, jnp.int32(1), jnp.int32(3))
            return jnp.mean(img[..., :3] * jnp.cos(
                jnp.arange(img.shape[0], dtype=jnp.float32))[:, None])
        return f

    comp = jax.jit(r.make_trace_fn(depth=DEPTH, remat="segment",
                                   compaction=sched))
    g_a = jax.grad(loss(plain))(cs.params)
    g_b = jax.grad(loss(comp))(cs.params)
    for la, lb, name in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b),
                            jax.tree.leaves(
                                jax.tree.map(lambda *_: 0, g_a))):
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=2e-4, atol=1e-7)


def test_exact_census_bench_config_bit_exact():
    """The bench's exact-census configuration (passes=[pass], tight
    safety, quant widths, shrink-gated boundaries, remat='segment_hits')
    must reproduce the plain trace for the probed (pass_idx, spp) with
    NO dropped paths. The claim rests on two subtle identities —
    packed-LDR vs f32 texture-fetch bit-exactness and static
    _step_pre/_step_rr vs dynamic-rr trace-step sampler-stream identity
    — this locks both in (ADVICE r4). Tolerance is 1-ulp: the only
    permitted difference is the per-segment radiance-flush
    reassociation ((a+b)+(c+d) vs sequential); a dropped path would be
    an O(sample-weight) error, far above it — and would now also NaN
    the image (the schedule-overflow guard)."""
    cs, r, xs, ys = _setup()
    sched = r.census_schedule(xs, ys, spp=3, depth=DEPTH, passes=[1],
                              safety=1.01, min_width=64, quant=64,
                              shrink_ratio=0.5)
    assert len(sched) >= 2      # tight widths actually engaged
    plain = jax.jit(r.make_trace_fn(depth=DEPTH))
    comp = jax.jit(r.make_trace_fn(depth=DEPTH, remat="segment_hits",
                                   compaction=sched))
    a = np.asarray(plain(cs.params, xs, ys, jnp.int32(1), jnp.int32(3)))
    b = np.asarray(comp(cs.params, xs, ys, jnp.int32(1), jnp.int32(3)))
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, rtol=3e-7, atol=1e-6)


def test_schedule_overflow_poisons_not_truncates():
    """A schedule whose width is EXCEEDED by live lanes must fail loudly
    (NaN-poisoned result), not silently drop paths (ADVICE r4 medium)."""
    cs, r, xs, ys = _setup()
    honest = r.census_schedule(xs, ys, spp=3, depth=DEPTH, min_width=64)
    # sabotage: force a width far below the true live count at depth 1
    lying = [(0, xs.shape[0]), (1, 64)]
    assert any(w > 64 for d, w in honest if d >= 1) or \
        int(xs.shape[0]) > 64
    comp = jax.jit(r.make_trace_fn(depth=DEPTH, compaction=lying))
    out = np.asarray(comp(cs.params, xs, ys, jnp.int32(1), jnp.int32(3)))
    assert np.isnan(out).all()


def test_sorted_segment_hits_trace_matches_plain():
    """remat='segment_hits' (hit records saved, search never recomputed
    in the backward) + sort=True (detached per-bounce Morton re-sort):
    image bit-identical to the plain compacted trace; parameter grads
    equal up to float reassociation (the per-lane cotangents are
    identical — only the cross-lane reduction ORDER changes with the
    permutation)."""
    cs, r, xs, ys = _setup()
    sched = r.census_schedule(xs, ys, spp=3, depth=DEPTH, min_width=64)
    base = jax.jit(r.make_trace_fn(depth=DEPTH, remat="segment",
                                   compaction=sched))
    fast = jax.jit(r.make_trace_fn(depth=DEPTH, remat="segment_hits",
                                   compaction=sched, sort=True))
    a = base(cs.params, xs, ys, jnp.int32(1), jnp.int32(3))
    b = fast(cs.params, xs, ys, jnp.int32(1), jnp.int32(3))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    def loss(trace):
        def f(params):
            img = trace(params, xs, ys, jnp.int32(1), jnp.int32(3))
            return jnp.mean(img[..., :3] * jnp.cos(
                jnp.arange(img.shape[0], dtype=jnp.float32))[:, None])
        return f

    g_a = jax.grad(loss(base))(cs.params)
    g_b = jax.grad(loss(fast))(cs.params)
    for la, lb in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=2e-5, atol=1e-7)


def test_boundary_sorted_trace_matches_plain():
    """sort='boundary' (Morton re-sort only at compaction boundaries +
    equal-width sort points every CRAYTPU_TRACE_SORT_EVERY bounces):
    image bit-identical, grads equal up to cross-lane reduction order.
    This is the bench's fwd+bwd configuration (497k -> 565k paths/s on
    the TPU; the permutation is detached ints)."""
    cs, r, xs, ys = _setup()
    sched = r.census_schedule(xs, ys, spp=3, depth=DEPTH, min_width=64)
    base = jax.jit(r.make_trace_fn(depth=DEPTH, remat="segment",
                                   compaction=sched))
    fast = jax.jit(r.make_trace_fn(depth=DEPTH, remat="segment_hits",
                                   compaction=sched, sort="boundary"))
    a = base(cs.params, xs, ys, jnp.int32(1), jnp.int32(3))
    b = fast(cs.params, xs, ys, jnp.int32(1), jnp.int32(3))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    def loss(trace):
        def f(params):
            img = trace(params, xs, ys, jnp.int32(1), jnp.int32(3))
            return jnp.mean(img[..., :3] * jnp.cos(
                jnp.arange(img.shape[0], dtype=jnp.float32))[:, None])
        return f

    g_a = jax.grad(loss(base))(cs.params)
    g_b = jax.grad(loss(fast))(cs.params)
    for la, lb in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=2e-5, atol=1e-7)
