"""Multi-device persistent-pool rendering — the CLI's mesh scale-out path.

This is what `python -m craytpu scene.json` runs when more than one
device is visible: the TPU-native replacement for BOTH reference
scale-out tiers in the PRODUCT render path (not just tests):

  P1 pthread tile pool (renderer.c:96-117 + tile.c:22-45)
  P3 TCP master/worker cluster (utils/protocol/server.c:369)

Design: one persistent wavefront pool PER DEVICE, sharded over a 1-axis
jax Mesh; the Monte-Carlo pass range is statically partitioned across
devices (device i renders passes [i*P, (i+1)*P), the analogue of the
reference's per-pass loop renderer.c:275 handed to different workers).
Every (pixel, pass) path is deterministic given its sampler stream
(streams are keyed by pixel/pass only), so the sharded image equals the
single-device image up to float accumulation order.

Cross-chip traffic per dispatch is ONE tiny collective (the per-device
live-count vector the host loop steers by) plus ONE final framebuffer
reduction — everything else is lane-local under shard_map, so the
collectives ride ICI and scaling is limited only by per-chip pool
occupancy, matching the path-tracer scaling model (SURVEY.md §2.3:
tiles -> static shards, submitWork -> gather).

The host loop mirrors WavefrontRenderer.render_persistent: lag-1
pipelined live counts (the max over devices steers refills; it only
overestimates, so tail-slot overwrites stay safe on every device),
fused flush+sort+refill dispatches, quarter-step drain shrinking.
Interrupt checkpointing is not supported in sharded mode (the queue
position is per-device); the CLI falls back to abort-and-save.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from craytpu.models.wavefront_pt import WavefrontRenderer, _next_pow2
from craytpu.parallel.shard import shard_map
from craytpu.ops import sampler as smp

f32 = jnp.float32
i32 = jnp.int32
u32 = jnp.uint32

POOL_AXIS = "pool"


def default_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (POOL_AXIS,))


class ShardedPoolRenderer(WavefrontRenderer):
    """WavefrontRenderer whose persistent render runs one pool per device
    of a 1-axis mesh. `tile_rays` is the PER-DEVICE pool size."""

    def __init__(self, cscene, kind: str = smp.RANDOM,
                 bounces: int | None = None, tile_rays: int | None = None,
                 mesh: Mesh | None = None, nee: bool = False):
        self.mesh = mesh if mesh is not None else default_mesh()
        self.D = int(self.mesh.shape[POOL_AXIS])
        super().__init__(cscene, kind=kind, bounces=bounces,
                         tile_rays=tile_rays, nee=nee)

    # -- sharding helpers ------------------------------------------------
    def _ns(self, *spec):
        return NamedSharding(self.mesh, P(*spec))

    def _smap(self, fn, in_specs, out_specs):
        return shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                         out_specs=out_specs)

    # -- sharded jitted stages -------------------------------------------
    def _pool_step_sh(self, k: int):
        """k bounces over every device's pool shard in ONE dispatch;
        returns the per-device live-count vector (D,)."""
        key = ("pool_sh", k)
        if key not in self._multi_cache:
            step_dyn = self._make_step("dynamic", checks=True,
                                       nee=self.nee)
            max_depth = self.max_depth
            nee = self.nee
            pool = P(POOL_AXIS)
            rep = P()

            def body_local(params, geom, shade, mat_graph, o, d, weight,
                           s, alive, pdepth, delta):
                params = self.cscene.reg.make_ctx(params)  # hoisted
                def body(carry, _):
                    o, d, w, dl, s, alive, pd = carry
                    if nee:
                        # NEE prev flag rides in bit 16 of pdepth (see
                        # WavefrontRenderer.__init__)
                        depth = pd & jnp.int32(0xFFFF)
                        prev = (pd >> 16) > 0
                        alive = alive & (depth < max_depth)
                        o, d, w, dl, s, alive, prev = step_dyn(
                            params, geom, shade, mat_graph, o, d, w, dl,
                            s, alive, depth >= 4, prev)
                        return (o, d, w, dl, s, alive,
                                (depth + 1) | (prev.astype(i32) << 16)), \
                            None
                    alive = alive & (pd < max_depth)
                    o, d, w, dl, s, alive = step_dyn(
                        params, geom, shade, mat_graph, o, d, w, dl, s,
                        alive, pd >= 4)
                    return (o, d, w, dl, s, alive, pd + 1), None

                (o, d, weight, delta, s, alive, pdepth), _ = jax.lax.scan(
                    body, (o, d, weight, delta, s, alive, pdepth),
                    None, length=k)
                return (o, d, weight, s, alive, pdepth, delta,
                        jnp.sum(alive, dtype=i32)[None])

            sm = self._smap(
                body_local,
                in_specs=(rep, rep, rep, rep, pool, pool, pool, pool,
                          pool, pool, pool),
                out_specs=(pool, pool, pool, pool, pool, pool, pool, pool))
            self._multi_cache[key] = self._jit(
                sm, donate_argnums=(4, 5, 6, 7, 8, 9, 10))
        return self._multi_cache[key]

    def _fpr_sh(self, B: int, m: int, Q: int, P_dev: int, spp: int):
        """Sharded flush+sort+refill: each device sorts ITS pool shard,
        flushes the refill tail's radiance into ITS framebuffer partial,
        and generates fresh primaries from ITS pass range [dev*P_dev,
        dev*P_dev + P_dev) at the shared queue position."""
        key = ("fpr_sh", B, m, Q, P_dev, spp)
        if key not in self._multi_cache:
            key_fn = self._morton_key()
            sched = self._sched_dev
            npix = self.width * self.height
            kind = self.kind
            cam_fn = self.cam_fn
            pool = P(POOL_AXIS)
            rep = P()

            def fpr_local(final, o, d, weight, s, alive, lane, lpass,
                          pdepth, delta, qpos, take_n):
                dev = jax.lax.axis_index(POOL_AXIS).astype(i32)
                final = final[0]                       # (npix, 4) local
                order = jnp.argsort(key_fn(o, d, alive))
                (o, d, weight, delta, s, alive, lane, lpass,
                 pdepth) = self._permute_pool(order, o, d, weight, delta,
                                              s, alive, lane, lpass,
                                              pdepth)
                start = B - m * Q
                final = final.at[lane[start:]].add(delta[start:])

                # fresh primaries from this device's pass range
                i = jnp.arange(m * Q, dtype=i32)
                l_i = qpos + i                         # local queue id
                fpass = dev * i32(P_dev) + l_i // npix
                px = l_i % npix
                rows = sched[px]
                fxs, fys, flane = rows[:, 0], rows[:, 1], rows[:, 2]
                fs = smp.init_sampler(kind, fpass,
                                      jnp.full((m * Q,), spp, i32),
                                      flane.astype(u32))
                fo, fd, fs = jax.vmap(cam_fn)(fxs, fys, fs)
                falive = (i < take_n) & (fpass < i32(spp))

                def ins(a, f):
                    return jax.lax.dynamic_update_slice_in_dim(
                        a, f, start, axis=0)

                o, d = ins(o, fo), ins(d, fd)
                weight = ins(weight, jnp.ones((m * Q, 4), f32))
                s = jax.tree.map(ins, s, fs)
                lane, lpass = ins(lane, flane), ins(lpass, fpass)
                pdepth = ins(pdepth, jnp.zeros(m * Q, i32))
                alive = ins(alive, falive)
                delta = ins(delta, jnp.zeros((m * Q, 4), f32))
                return (final[None], o, d, weight, s, alive, lane, lpass,
                        pdepth, delta)

            sm = self._smap(
                fpr_local,
                in_specs=(pool, pool, pool, pool, pool, pool, pool, pool,
                          pool, pool, rep, rep),
                out_specs=(pool,) * 10)
            self._multi_cache[key] = self._jit(
                sm, donate_argnums=tuple(range(10)))
        return self._multi_cache[key]

    def _pack_shrink_sh(self, Bn: int):
        key = ("shrink_sh", Bn)
        if key not in self._multi_cache:
            key_fn = self._morton_key()
            pool = P(POOL_AXIS)

            def ps_local(final, o, d, weight, s, alive, lane, lpass,
                         pdepth, delta):
                final = final[0]
                dead_delta = jnp.where(alive[..., None], f32(0.0), delta)
                final = final.at[lane].add(dead_delta)
                delta = jnp.where(alive[..., None], delta, f32(0.0))
                order = jnp.argsort(key_fn(o, d, alive))[:Bn]
                (o, d, weight, delta, s, alive, lane, lpass,
                 pdepth) = self._permute_pool(order, o, d, weight, delta,
                                              s, alive, lane, lpass,
                                              pdepth)
                return (final[None], o, d, weight, s, alive, lane, lpass,
                        pdepth, delta)

            sm = self._smap(ps_local, in_specs=(pool,) * 10,
                            out_specs=(pool,) * 10)
            self._multi_cache[key] = self._jit(sm, donate_argnums=(0,))
        return self._multi_cache[key]

    def _final_flush_sh(self):
        key = ("flush_sh",)
        if key not in self._multi_cache:
            pool = P(POOL_AXIS)

            def fl_local(final, lane, delta, alive):
                z = jnp.where(alive[..., None], f32(0.0), delta)
                return final[0].at[lane].add(z)[None]

            sm = self._smap(fl_local, in_specs=(pool,) * 4,
                            out_specs=pool)
            self._multi_cache[key] = self._jit(sm, donate_argnums=(0,))
        return self._multi_cache[key]

    def _prime_sh(self, B: int, P_dev: int, spp: int):
        """Initial pool fill: B fresh primaries per device from each
        device's own pass range (queue position 0)."""
        key = ("prime_sh", B, P_dev, spp)
        if key not in self._multi_cache:
            sched = self._sched_dev
            npix = self.width * self.height
            kind = self.kind
            cam_fn = self.cam_fn

            def prime_local():
                dev = jax.lax.axis_index(POOL_AXIS).astype(i32)
                i = jnp.arange(B, dtype=i32)
                fpass = dev * i32(P_dev) + i // npix
                px = i % npix
                rows = sched[px]
                fxs, fys, flane = rows[:, 0], rows[:, 1], rows[:, 2]
                fs = smp.init_sampler(kind, fpass,
                                      jnp.full((B,), spp, i32),
                                      flane.astype(u32))
                fo, fd, fs = jax.vmap(cam_fn)(fxs, fys, fs)
                falive = (i < i32(P_dev * npix)) & (fpass < i32(spp))
                return fo, fd, fs, flane, fpass, falive

            sm = self._smap(prime_local, in_specs=(),
                            out_specs=(P(POOL_AXIS),) * 6)
            self._multi_cache[key] = jax.jit(sm)
        return self._multi_cache[key]

    # -- the sharded persistent render -----------------------------------
    def render_persistent(self, spp: int | None = None, progress=None,
                          resume=None, interrupt=None, on_frame=None):
        """Persistent render across every device of the mesh. Same
        per-(pixel, pass) sample streams as the single-device path ->
        same image up to float accumulation order. `resume` is not
        supported here (per-device queue positions); `interrupt` aborts
        the render and returns ("aborted",) — the CLI then saves the
        partial frame like the reference's S key (ui.c:206-212)."""
        if resume is not None:
            raise NotImplementedError(
                "persistent checkpoints resume on a single device; "
                "re-run without multi-device sharding")
        spp = spp if spp is not None else self.cscene.prefs.sample_count
        H, W = self.height, self.width
        npix = H * W
        D = self.D
        if self.empty_scene or self.max_depth == 0 or spp < 1:
            return super().render_persistent(spp=spp, progress=progress)
        B = min(self.tile_rays, _next_pow2(npix))
        Q = B // 4
        P_dev = (spp + D - 1) // D          # passes per device
        total_dev = P_dev * npix            # per-device queue length
        total_real = npix * spp
        cs = self.cscene
        import os
        k_env = os.environ.get("CRAYTPU_POOL_K")
        k = int(k_env) if k_env else 1
        force_k = bool(k_env)

        # prime every pool from queue position 0
        o, d, s, lane, lpass, alive = self._prime_sh(B, P_dev, spp)()
        qpos = min(B, total_dev)
        weight = jax.device_put(
            jnp.ones((D * B, 4), f32), self._ns(POOL_AXIS))
        pdepth = jax.device_put(
            jnp.zeros(D * B, i32), self._ns(POOL_AXIS))
        delta = jax.device_put(
            jnp.zeros((D * B, 4), f32), self._ns(POOL_AXIS))
        final = jax.device_put(
            jnp.zeros((D, npix, 4), f32), self._ns(POOL_AXIS))

        stale_n = B                  # lagged upper bound, PER-DEVICE max
        counts: list = []

        def queue_left():
            return total_dev - qpos

        while True:
            Bc = alive.shape[0] // D
            kc = k if (force_k or Bc > 32768) else (4 if Bc > 4096 else 8)
            o, d, weight, s, alive, pdepth, delta, n_live = \
                self._pool_step_sh(kc)(
                    cs.params, cs.geom, cs.shade, cs.mat_graph,
                    o, d, weight, s, alive, pdepth, delta)
            try:
                n_live.copy_to_host_async()
            except AttributeError:          # pragma: no cover
                pass
            counts.append([n_live, 0])
            if len(counts) >= 2:
                arr, adj = counts.pop(0)
                stale_n = int(np.max(np.asarray(arr))) + adj
            if progress is not None:
                done = max(total_real - D * queue_left()
                           - D * min(stale_n, Bc), 0)
                progress(done, total_real)

            if interrupt is not None and interrupt():
                return ("aborted",)

            if queue_left() > 0 and Bc == B and stale_n <= B - Q:
                m = min((B - stale_n) // Q, 8,
                        max((queue_left() + Q - 1) // Q, 1))
                while m & (m - 1):
                    m &= m - 1
                if m >= 1:
                    take_n = min(m * Q, queue_left())
                    (final, o, d, weight, s, alive, lane, lpass, pdepth,
                     delta) = self._fpr_sh(B, m, Q, P_dev, spp)(
                        final, o, d, weight, s, alive, lane, lpass,
                        pdepth, delta, i32(qpos), i32(take_n))
                    qpos += take_n
                    for e in counts:
                        e[1] += take_n
                    stale_n += take_n
                    if on_frame is not None:
                        # (D, npix, 4) per-device partials; the preview
                        # callback sums over axis 0 after fetching
                        on_frame(final, total_real - D * queue_left())
            elif queue_left() == 0:
                stale_n = int(np.max(np.asarray(counts[-1][0]))) \
                    + counts[-1][1]
                counts.clear()
                if stale_n == 0:
                    break
                need = max(_next_pow2(max(stale_n, 1)), 1024)
                Bn = Bc
                while Bn // 4 >= need:
                    Bn //= 4
                if Bn < Bc:
                    (final, o, d, weight, s, alive, lane, lpass, pdepth,
                     delta) = self._pack_shrink_sh(Bn)(
                        final, o, d, weight, s, alive, lane, lpass,
                        pdepth, delta)
        final = self._final_flush_sh()(final, lane, delta, alive)
        # one cross-chip reduction: sum the per-device framebuffer
        # partials (the "submitWork" gather, server.c:159-174 analogue)
        img = jnp.sum(final, axis=0) / f32(spp)
        return jax.device_get(img.reshape(H, W, 4))


def make_renderer(cscene, kind: str = smp.RANDOM,
                  bounces: int | None = None,
                  tile_rays: int | None = None, nee: bool = False):
    """The product's renderer factory: sharded over all local devices
    when more than one is visible, plain single-device otherwise."""
    if len(jax.devices()) > 1:
        return ShardedPoolRenderer(cscene, kind=kind, bounces=bounces,
                                   tile_rays=tile_rays, nee=nee)
    return WavefrontRenderer(cscene, kind=kind, bounces=bounces,
                             tile_rays=tile_rays, nee=nee)
