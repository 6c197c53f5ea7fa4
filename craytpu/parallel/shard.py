"""Multi-chip execution: rays and samples sharded over a jax device Mesh.

This is the TPU-native replacement for BOTH of the reference's scale-out
mechanisms (SURVEY.md §2.3):

  P1 pthread tile pool (renderer.c:96-117 + tile.c:22-45)  -> the "rays"
     mesh axis: the flat pixel/ray wavefront is statically sharded across
     chips; there is no mutex-guarded work queue because the partition is
     static and every chip is identical.
  P3 TCP/JSON master-worker cluster (utils/protocol/*)     -> the same mesh
     spanning hosts via jax.distributed: the scene pytree is replicated per
     host (the analogue of loadAssets/loadScene shipping), the framebuffer
     lives sharded, and "submitWork" is an all-gather / host-0 device_get.
     Accumulation and gradient reductions ride ICI collectives (psum),
     not base64-over-TCP.

A second mesh axis "sample" shards Monte-Carlo passes (the analogue of the
reference's per-pass loop renderer.c:275): each sample-row of the mesh
traces the same pixels with a different pass index and the results are
pmean-ed. Both axes are embarrassingly parallel by construction, matching
the path-tracing scaling model (there is no tensor/pipeline axis in a path
tracer — the flat ray axis is the whole story, SURVEY.md §5).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map_raw
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map_raw

import inspect as _inspect

# Disable the static varying-axes checker (check_vma in new jax, check_rep in
# old): the wavefront scan carries sampler state whose varying-ness along the
# sample axis the checker can't prove; the collectives themselves are still
# checked at run time.
_SM_EXTRA = {}
_sm_params = _inspect.signature(_shard_map_raw).parameters
if "check_vma" in _sm_params:
    _SM_EXTRA = {"check_vma": False}
elif "check_rep" in _sm_params:
    _SM_EXTRA = {"check_rep": False}


def shard_map(f, **kw):
    return _shard_map_raw(f, **kw, **_SM_EXTRA)

from craytpu.models.wavefront_pt import WavefrontRenderer

f32 = jnp.float32
i32 = jnp.int32

RAY_AXIS = "rays"
SAMPLE_AXIS = "sample"


# re-export: must be CALLED before any jax backend use; lives in the
# import-light craytpu.parallel.dist so callers can initialize before
# importing the rest of the package
from craytpu.parallel.dist import init_distributed  # noqa: F401


def make_mesh(n_devices: int | None = None, n_sample: int | None = None,
              devices=None) -> Mesh:
    """Build a (sample, rays) mesh over the available devices.

    n_sample defaults to 2 when the device count is even and > 2 (so both
    axes are exercised), else 1.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_sample is None:
        n_sample = 2 if (n_devices % 2 == 0 and n_devices > 2) else 1
    assert n_devices % n_sample == 0
    grid = devices.reshape(n_sample, n_devices // n_sample)
    return Mesh(grid, (SAMPLE_AXIS, RAY_AXIS))


def pad_to(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def make_sharded_render_fn(r: WavefrontRenderer, mesh: Mesh,
                           depth: int | None = None):
    """render(params, xs, ys, base_pass) -> (B, 4) radiance, averaged over
    the sample axis, with pixels sharded over the ray axis.

    xs/ys must be padded to a multiple of the ray-axis size; each sample row
    traces pass `base_pass + axis_index(sample)`.
    """
    trace = r.make_trace_fn(depth)
    n_sample = mesh.shape[SAMPLE_AXIS]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P()),
             out_specs=P(RAY_AXIS, None))
    def render_shard(params, xs, ys, base_pass):
        pass_idx = base_pass + jax.lax.axis_index(SAMPLE_AXIS).astype(i32)
        rad = trace(params, xs, ys, pass_idx, i32(n_sample))
        return jax.lax.pmean(rad, SAMPLE_AXIS)

    return render_shard


def make_loss_fn(r: WavefrontRenderer, mesh: Mesh, depth: int | None = None):
    """Scalar image loss: mean squared error of the (sample-averaged)
    radiance against a target image, fully reduced over the mesh."""
    trace = r.make_trace_fn(depth)
    n_sample = mesh.shape[SAMPLE_AXIS]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS, None), P()),
             out_specs=P())
    def loss_shard(params, xs, ys, target, base_pass):
        pass_idx = base_pass + jax.lax.axis_index(SAMPLE_AXIS).astype(i32)
        rad = trace(params, xs, ys, pass_idx, i32(n_sample))
        rad = jax.lax.pmean(rad, SAMPLE_AXIS)
        err = (rad[..., :3] - target) ** 2
        # local partial sum -> global sum over the ray axis (ICI psum)
        total = jax.lax.psum(jnp.sum(err), RAY_AXIS)
        n = jax.lax.psum(jnp.float32(err.size), RAY_AXIS)
        return total / n

    return loss_shard


def make_geom_loss_fn(r: WavefrontRenderer, mesh: Mesh, scene,
                      depth: int | None = None, edge_samples: int = 32):
    """Like make_loss_fn but ALSO differentiable w.r.t. geometry:

      loss(params, tri_packed, xs, ys, target, base_pass) -> scalar

    The interior term uses the vertex-differentiable trace
    (diff_geometry=True: hit records recomputed from tri_packed) and the
    silhouette discontinuity enters through the edge-aware boundary
    estimator (ops/edge_grad.py), composed per shard: the boundary
    custom-VJP is linear in the image cotangent, so each ray shard feeds
    it only its own pixels' cotangent rows and the psum of the resulting
    tri_packed grads is exactly the full-frame boundary gradient. (Each
    shard re-evaluates all E edges' side rays in its backward — edge
    work is tiny next to the trace; noted, not sharded.)
    """
    from craytpu.ops.edge_grad import make_edge_grad_fn
    d = depth if depth is not None else r.max_depth
    trace_g = r.make_trace_fn(d, diff_geometry=True)
    boundary = make_edge_grad_fn(r.cscene, scene, r, depth=d,
                                 samples_per_edge=edge_samples)
    n_sample = mesh.shape[SAMPLE_AXIS]
    width = r.width

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS),
                       P(RAY_AXIS, None), P()),
             out_specs=P())
    def loss_shard(params, tri_packed, xs, ys, target, base_pass):
        pass_idx = base_pass + jax.lax.axis_index(SAMPLE_AXIS).astype(i32)
        rad = trace_g(params, tri_packed, xs, ys, pass_idx, i32(n_sample))
        # boundary term: zero forward, full-frame raster-order VJP —
        # gather this shard's pixel rows (the gather's transpose scatters
        # the shard's cotangent into the frame-sized buffer the edge
        # estimator expects)
        flat = ys.astype(i32) * i32(width) + xs.astype(i32)
        rad = rad + boundary(params, tri_packed, pass_idx,
                             i32(n_sample))[flat]
        rad = jax.lax.pmean(rad, SAMPLE_AXIS)
        err = (rad[..., :3] - target) ** 2
        total = jax.lax.psum(jnp.sum(err), RAY_AXIS)
        n = jax.lax.psum(jnp.float32(err.size), RAY_AXIS)
        return total / n

    return loss_shard


def make_train_step(r: WavefrontRenderer, mesh: Mesh,
                    depth: int | None = None, learning_rate: float = 1e-2,
                    geometry: bool = False, scene=None,
                    edge_samples: int = 32):
    """Full inverse-rendering training step, jitted over the mesh.

    step(theta, opt_state, xs, ys, target, base_pass)
      -> (theta', opt_state', loss)

    theta is ShadeParams, or (ShadeParams, tri_packed) with geometry=True.

    Differentiates the wavefront path trace w.r.t. every ShadeParams leaf
    (material colors, scalar values, vectors, texture texels, legacy
    emission/IOR) with the detached-sampling estimator; gradients reduce
    over the mesh inside the loss's psum (the AD transpose of psum is the
    broadcast, so every device applies the identical update — the analogue
    of the all-reduced gradient step in BASELINE.md's north star).

    geometry=True (requires the loaded `scene` for the mesh edge table)
    additionally optimizes the packed triangle rows: interior vertex
    gradients through the differentiable hit records PLUS the
    edge-aware silhouette boundary term (make_geom_loss_fn). The BVH and
    the MXU search coefficients stay frozen at their compile-time values —
    recompile the scene every K steps if vertices move far.
    """
    import optax
    if geometry:
        if scene is None:
            raise ValueError("geometry=True needs the loaded scene "
                             "(edge table source)")
        geom_loss = make_geom_loss_fn(r, mesh, scene, depth, edge_samples)

        def loss_fn(theta, xs, ys, target, base_pass):
            params, tri_packed = theta
            return geom_loss(params, tri_packed, xs, ys, target,
                             base_pass)
    else:
        shade_loss = make_loss_fn(r, mesh, depth)

        def loss_fn(theta, xs, ys, target, base_pass):
            return shade_loss(theta, xs, ys, target, base_pass)
    opt = optax.adam(learning_rate)

    @jax.jit
    def step(theta, opt_state, xs, ys, target, base_pass):
        loss, grads = jax.value_and_grad(loss_fn)(theta, xs, ys, target,
                                                  base_pass)
        updates, opt_state = opt.update(grads, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return theta, opt_state, loss

    def init(theta):
        return opt.init(theta)

    return step, init
