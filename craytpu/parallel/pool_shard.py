"""Multi-device persistent-pool rendering — the CLI's mesh scale-out path.

This is what `python -m craytpu scene.json` runs when more than one
device is visible: the TPU-native replacement for BOTH reference
scale-out tiers in the PRODUCT render path (not just tests):

  P1 pthread tile pool (renderer.c:96-117 + tile.c:22-45)
  P3 TCP master/worker cluster (utils/protocol/server.c:369)

Design: one persistent wavefront pool PER DEVICE, sharded over a 1-axis
jax Mesh; the Monte-Carlo work queue (the flat (pixel, pass) id space,
tile-ordered like tile.c:66-117) is statically partitioned across
devices. Two partitions are used:

  * full render: device d owns passes [d*P_dev, (d+1)*P_dev) — the
    analogue of the reference's per-pass loop (renderer.c:275) handed to
    different workers;
  * single-pass progressive render (render_pass, the interactive tier,
    renderer.c:184-250): device d owns pixels [d*pix_dev, (d+1)*pix_dev)
    of ONE pass, so --iterative/--preview refine on every device.

Every (pixel, pass) path is deterministic given its sampler stream
(streams are keyed by pixel/pass only), so any partition yields the
single-device image up to float accumulation order.

Cross-chip traffic per dispatch is ONE tiny collective (a pmax of the
per-device live counts, replicated so every PROCESS of a multi-host run
can read it — the host loop steers refills by it) plus ONE final
framebuffer psum — everything else is lane-local under shard_map, so
the collectives ride ICI and scaling is limited only by per-chip pool
occupancy, matching the path-tracer scaling model (SURVEY.md §2.3:
tiles -> static shards, submitWork -> psum/gather).

Multi-HOST correctness rules this module follows (jax.distributed, one
process per host): the host loop only ever converts FULLY-REPLICATED
arrays to numpy (live-count pmax, final-frame psum, checkpoint gathers);
pool state is created inside jit/shard_map (never device_put from host
shards); every host runs the identical deterministic control flow, and
the interrupt flag is broadcast from process 0 so all hosts take the
same branch. Verified by the 2-process product-renderer test
(tests/test_distributed.py).

Interrupts checkpoint losslessly (like the single-device path): the
per-device queue tails become id RANGES in the checkpoint and in-flight
lanes re-enqueue as explicit ids; resume feeds the generalized queue
back through host-id refills on any device count.
"""

from __future__ import annotations

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


from craytpu.runtime.checkpoint import GidQueue  # noqa: E402


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

    def _put_pool(self, arr: np.ndarray):
        """Host numpy -> pool-sharded global array; each process supplies
        only its addressable shards (multi-host safe)."""
        return jax.make_array_from_callback(
            arr.shape, self._ns(POOL_AXIS), lambda idx: arr[idx])

    # -- sharded jitted stages -------------------------------------------
    def _pool_step_sh(self, k: int):
        """k bounces over every device's pool shard in ONE dispatch;
        returns the pmax of the per-device live counts as a REPLICATED
        scalar (readable by every process of a multi-host run)."""
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
                n_max = jax.lax.pmax(jnp.sum(alive, dtype=i32), POOL_AXIS)
                return (o, d, weight, s, alive, pdepth, delta, n_max)

            sm = self._smap(
                body_local,
                in_specs=(rep, rep, rep, rep, pool, pool, pool, pool,
                          pool, pool, pool),
                out_specs=(pool,) * 7 + (rep,))
            self._multi_cache[key] = self._jit(
                sm, donate_argnums=(4, 5, 6, 7, 8, 9, 10))
        return self._multi_cache[key]

    def _fpr_sh(self, B: int, m: int, Q: int):
        """Sharded flush+sort+refill: each device sorts ITS pool shard,
        flushes the refill tail's radiance into ITS framebuffer partial,
        and generates fresh primaries from ITS queue partition.

        Device d's partition is gid = (d*pass_stride + qpass + carry)*npix
        + (d*px_stride + qpix + i) where exactly one of pass_stride /
        px_stride is nonzero (pass split for the full render, pixel split
        for single-pass progressive). All queue coordinates are dynamic
        i32 scalars decomposed as (pass, pixel) so no device integer ever
        exceeds ~3*npix — exact at any spp (the reference's published
        workloads overflow i32 as flat ids)."""
        key = ("fpr_sh", B, m, Q)
        if key not in self._multi_cache:
            key_fn = self._morton_key()
            sched = self._sched_dev
            npix = self.width * self.height
            kind = self.kind
            cam_fn = self.cam_fn
            pool = P(POOL_AXIS)
            rep = P()

            def fpr_local(final, o, d, weight, s, alive, lane, lpass,
                          pdepth, delta, pass_stride, px_stride, qpass,
                          qpix, take_n, pass_max, spp):
                dev = jax.lax.axis_index(POOL_AXIS).astype(i32)
                final = final[0]                       # (npix, 4) local
                order = jnp.argsort(key_fn(o, d, alive))
                (o, d, weight, delta, s, alive, lane, lpass,
                 pdepth) = self._permute_pool(order, o, d, weight, delta,
                                              s, alive, lane, lpass,
                                              pdepth)
                start = B - m * Q
                final = final.at[lane[start:]].add(delta[start:])

                # fresh primaries from this device's queue partition
                i = jnp.arange(m * Q, dtype=i32)
                t = dev * px_stride + qpix + i
                fpass = dev * pass_stride + qpass + t // npix
                px = t % npix
                rows = sched[px]
                fxs, fys, flane = rows[:, 0], rows[:, 1], rows[:, 2]
                fs = smp.init_sampler(kind, fpass,
                                      jnp.broadcast_to(spp, (m * Q,)),
                                      flane.astype(u32))
                fo, fd, fs = jax.vmap(cam_fn)(fxs, fys, fs)
                falive = (i < take_n) & (fpass < pass_max)

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
                in_specs=(pool,) * 10 + (rep,) * 7,
                out_specs=(pool,) * 10)
            self._multi_cache[key] = self._jit(
                sm, donate_argnums=tuple(range(10)))
        return self._multi_cache[key]

    def _fpr_ids_sh(self, B: int, m: int, Q: int):
        """Flush+sort+refill from HOST-SUPPLIED ids (resume path: the
        generalized queue's pending ids are not a contiguous range). The
        host ships only (pass, sched-pixel, valid) per fresh lane; rays
        are still generated on device."""
        key = ("fpr_ids_sh", B, m, Q)
        if key not in self._multi_cache:
            key_fn = self._morton_key()
            sched = self._sched_dev
            kind = self.kind
            cam_fn = self.cam_fn
            pool = P(POOL_AXIS)
            rep = P()

            def fpr_local(final, o, d, weight, s, alive, lane, lpass,
                          pdepth, delta, fpass, px, fvalid, spp):
                final = final[0]
                order = jnp.argsort(key_fn(o, d, alive))
                (o, d, weight, delta, s, alive, lane, lpass,
                 pdepth) = self._permute_pool(order, o, d, weight, delta,
                                              s, alive, lane, lpass,
                                              pdepth)
                start = B - m * Q
                final = final.at[lane[start:]].add(delta[start:])

                rows = sched[px]
                fxs, fys, flane = rows[:, 0], rows[:, 1], rows[:, 2]
                fs = smp.init_sampler(kind, fpass,
                                      jnp.broadcast_to(spp, (m * Q,)),
                                      flane.astype(u32))
                fo, fd, fs = jax.vmap(cam_fn)(fxs, fys, fs)

                def ins(a, f):
                    return jax.lax.dynamic_update_slice_in_dim(
                        a, f, start, axis=0)

                o, d = ins(o, fo), ins(d, fd)
                weight = ins(weight, jnp.ones((m * Q, 4), f32))
                s = jax.tree.map(ins, s, fs)
                lane, lpass = ins(lane, flane), ins(lpass, fpass)
                pdepth = ins(pdepth, jnp.zeros(m * Q, i32))
                alive = ins(alive, fvalid)
                delta = ins(delta, jnp.zeros((m * Q, 4), f32))
                return (final[None], o, d, weight, s, alive, lane, lpass,
                        pdepth, delta)

            sm = self._smap(
                fpr_local,
                in_specs=(pool,) * 10 + (pool, pool, pool, rep),
                out_specs=(pool,) * 10)
            self._multi_cache[key] = self._jit(
                sm, donate_argnums=tuple(range(10)))
        return self._multi_cache[key]

    def _drain_all_sh(self):
        """End-of-queue drain in ONE dispatch: each device runs its own
        lax.while_loop of the bounce step until its pool is extinct
        (trip counts may differ per device — the body is collective-free
        so divergence is fine). Replaces a host loop that paid a blocking
        live-count fetch per iteration."""
        key = ("drain_all_sh",)
        if key not in self._multi_cache:
            step_dyn = self._make_step("dynamic", checks=True,
                                       nee=self.nee)
            max_depth = self.max_depth
            nee = self.nee
            pool = P(POOL_AXIS)
            rep = P()

            def drain_local(params, geom, shade, mat_graph, o, d, weight,
                            s, alive, pdepth, delta):
                params = self.cscene.reg.make_ctx(params)

                def cond(carry):
                    return jnp.any(carry[5])

                def body(carry):
                    o, d, w, dl, s, alive, pd = carry
                    if nee:
                        depth = pd & jnp.int32(0xFFFF)
                        prev = (pd >> 16) > 0
                        alive = alive & (depth < max_depth)
                        o, d, w, dl, s, alive, prev = step_dyn(
                            params, geom, shade, mat_graph, o, d, w, dl,
                            s, alive, depth >= 4, prev)
                        return (o, d, w, dl, s, alive,
                                (depth + 1) | (prev.astype(i32) << 16))
                    alive = alive & (pd < max_depth)
                    o, d, w, dl, s, alive = step_dyn(
                        params, geom, shade, mat_graph, o, d, w, dl, s,
                        alive, pd >= 4)
                    return (o, d, w, dl, s, alive, pd + 1)

                (o, d, weight, delta, s, alive, pdepth) = \
                    jax.lax.while_loop(
                        cond, body,
                        (o, d, weight, delta, s, alive, pdepth))
                return o, d, weight, s, alive, pdepth, delta

            sm = self._smap(
                drain_local,
                in_specs=(rep, rep, rep, rep, pool, pool, pool, pool,
                          pool, pool, pool),
                out_specs=(pool,) * 7)
            self._multi_cache[key] = self._jit(
                sm, donate_argnums=(4, 5, 6, 7, 8, 9, 10))
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

    def _reduce_frame_sh(self):
        """Sum the per-device framebuffer partials to a REPLICATED
        (npix, 4) array — the one cross-chip frame reduction (the
        "submitWork" gather, server.c:159-174 analogue). Replicated
        output so host code on EVERY process may fetch it."""
        key = ("reduce_sh",)
        if key not in self._multi_cache:
            def red_local(final):
                return jax.lax.psum(final[0], POOL_AXIS)

            sm = self._smap(red_local, in_specs=P(POOL_AXIS),
                            out_specs=P())
            self._multi_cache[key] = jax.jit(sm)
        return self._multi_cache[key]

    def _replicate(self):
        """Resharding gather: pool-sharded -> replicated (for checkpoint
        state the host must read on every process)."""
        key = ("replicate",)
        if key not in self._multi_cache:
            self._multi_cache[key] = jax.jit(
                lambda x: x, out_shardings=self._ns())
        return self._multi_cache[key]

    def _init_final_sh(self):
        """Seed the per-device framebuffer partials with a resumed
        radiance sum: device 0 carries it whole (the partials are only
        ever summed, so placing it once preserves the total exactly)."""
        key = ("init_final_sh",)
        if key not in self._multi_cache:
            D = self.D
            npix = self.width * self.height

            def mk(final0):
                z = jnp.zeros((D - 1, npix, 4), f32)
                return jnp.concatenate([final0[None], z], axis=0)

            self._multi_cache[key] = jax.jit(
                mk, out_shardings=self._ns(POOL_AXIS))
        return self._multi_cache[key]

    def _init_pool_sh(self, B: int):
        """weight/pdepth/delta/final created ON DEVICE with the pool
        sharding (a host device_put of global arrays would not be
        addressable across processes)."""
        key = ("init_sh", B)
        if key not in self._multi_cache:
            D = self.D
            npix = self.width * self.height

            def mk():
                return (jnp.ones((D * B, 4), f32),
                        jnp.zeros(D * B, i32),
                        jnp.zeros((D * B, 4), f32),
                        jnp.zeros((D, npix, 4), f32))

            self._multi_cache[key] = jax.jit(
                mk, out_shardings=(self._ns(POOL_AXIS),) * 4)
        return self._multi_cache[key]

    def _prime_sh(self, B: int):
        """Initial pool fill: B fresh primaries per device from each
        device's own queue partition (queue position 0)."""
        key = ("prime_sh", B)
        if key not in self._multi_cache:
            sched = self._sched_dev
            npix = self.width * self.height
            kind = self.kind
            cam_fn = self.cam_fn

            def prime_local(pass_stride, px_stride, qpass, qpix, take_n,
                            pass_max, spp):
                dev = jax.lax.axis_index(POOL_AXIS).astype(i32)
                i = jnp.arange(B, dtype=i32)
                t = dev * px_stride + qpix + i
                fpass = dev * pass_stride + qpass + t // npix
                px = t % npix
                rows = sched[px]
                fxs, fys, flane = rows[:, 0], rows[:, 1], rows[:, 2]
                fs = smp.init_sampler(kind, fpass,
                                      jnp.broadcast_to(spp, (B,)),
                                      flane.astype(u32))
                fo, fd, fs = jax.vmap(cam_fn)(fxs, fys, fs)
                falive = (i < take_n) & (fpass < pass_max)
                return fo, fd, fs, flane, fpass, falive

            sm = self._smap(prime_local, in_specs=(P(),) * 7,
                            out_specs=(P(POOL_AXIS),) * 6)
            self._multi_cache[key] = jax.jit(sm)
        return self._multi_cache[key]

    def _prime_ids_sh(self, B: int):
        key = ("prime_ids_sh", B)
        if key not in self._multi_cache:
            sched = self._sched_dev
            kind = self.kind
            cam_fn = self.cam_fn
            pool = P(POOL_AXIS)

            def prime_local(fpass, px, fvalid, spp):
                rows = sched[px]
                fxs, fys, flane = rows[:, 0], rows[:, 1], rows[:, 2]
                fs = smp.init_sampler(kind, fpass,
                                      jnp.broadcast_to(spp, px.shape),
                                      flane.astype(u32))
                fo, fd, fs = jax.vmap(cam_fn)(fxs, fys, fs)
                return fo, fd, fs, flane, fpass, fvalid

            sm = self._smap(prime_local, in_specs=(pool, pool, pool, P()),
                            out_specs=(P(POOL_AXIS),) * 6)
            self._multi_cache[key] = jax.jit(sm)
        return self._multi_cache[key]

    # -- host-side helpers -------------------------------------------------
    def _ids_to_dev(self, ids: np.ndarray, n: int):
        """Pad a host id batch to D*n and split into the (pass, sched-px,
        valid) arrays _fpr_ids_sh consumes, pool-sharded."""
        npix = self.width * self.height
        took = ids.shape[0]
        pad = np.zeros(self.D * n - took, np.int64)
        idp = np.concatenate([ids, pad])
        fpass = (idp // npix).astype(np.int32)
        px = (idp % npix).astype(np.int32)
        valid = np.arange(self.D * n) < took
        return (self._put_pool(fpass), self._put_pool(px),
                self._put_pool(valid))

    def fetch_partial(self, final) -> np.ndarray:
        """Host copy of the in-progress radiance-sum frame (npix, 4) —
        the preview fetch. Reduces the per-device partials first
        (replicated, so safe on every process)."""
        return np.asarray(self._reduce_frame_sh()(final))

    def _interrupt_flag(self, interrupt) -> bool:
        """Evaluate the interrupt callable so every PROCESS agrees:
        process 0 decides, the flag is broadcast (one tiny collective —
        only paid in multi-host runs)."""
        flag = bool(interrupt()) if jax.process_index() == 0 else False
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            flag = bool(multihost_utils.broadcast_one_to_all(
                np.int32(flag)))
        return flag

    # -- the sharded persistent loop ---------------------------------------
    def _run_pool_sh(self, B: int, spp: int, pass_stride: int,
                     px_stride: int, pass_max: int, stride: int,
                     total_real: int, progress=None, interrupt=None,
                     on_frame=None, queue: GidQueue | None = None,
                     qpass0: int = 0, final0=None):
        """One persistent multi-pool render over a device-partitioned
        queue. Returns the per-device framebuffer partials (D, npix, 4),
        or ("interrupted", final_sum, pending_gids, ranges) when the
        interrupt callable fires.

        Fast path (queue=None): device d consumes gids
        (d*pass_stride + qpass')*npix + d*px_stride + qpix' on-device from
        the shared host position qpos in [0, stride). Resume path
        (queue=GidQueue): ids are fed from the host per refill.
        """
        npix = self.width * self.height
        D = self.D
        cs = self.cscene
        import os
        Q = max(B // int(os.environ.get("CRAYTPU_POOL_QDIV", "4")), 1)
        k_env = os.environ.get("CRAYTPU_POOL_K")
        k = int(k_env) if k_env else 1
        force_k = bool(k_env)
        qpos = 0

        def queue_left():
            if queue is not None:
                return queue.left()
            return stride - qpos

        weight, pdepth, delta, final = self._init_pool_sh(B)()
        if final0 is not None:
            final = self._init_final_sh()(
                jnp.asarray(final0, f32).reshape(npix, 4))
        if queue is None:
            take0 = min(B, stride)
            o, d, s, lane, lpass, alive = self._prime_sh(B)(
                i32(pass_stride), i32(px_stride), i32(qpass0), i32(0),
                i32(take0), i32(pass_max), i32(spp))
            qpos = take0
        else:
            ids = queue.take(D * B)
            fpass, px, valid = self._ids_to_dev(ids, B)
            o, d, s, lane, lpass, alive = self._prime_ids_sh(B)(
                fpass, px, valid, i32(spp))

        stale_n = B                  # lagged upper bound, per-device max
        counts: list = []

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
                stale_n = int(np.asarray(arr)) + adj
            if progress is not None:
                done = max(total_real - D * queue_left()
                           - D * min(stale_n, Bc), 0)
                progress(done, total_real)

            if interrupt is not None and self._interrupt_flag(interrupt):
                return self._persistent_interrupt_sh(
                    final, alive, lane, lpass, delta, qpos, stride,
                    pass_stride, px_stride, pass_max, queue, qpass0)

            if queue_left() > 0 and Bc == B and stale_n <= B - Q:
                m = min((B - stale_n) // Q, 8,
                        max((queue_left() + Q - 1) // Q, 1))
                while m & (m - 1):
                    m &= m - 1
                if m >= 1:
                    if queue is None:
                        take_n = min(m * Q, stride - qpos)
                        (final, o, d, weight, s, alive, lane, lpass,
                         pdepth, delta) = self._fpr_sh(B, m, Q)(
                            final, o, d, weight, s, alive, lane, lpass,
                            pdepth, delta, i32(pass_stride),
                            i32(px_stride), i32(qpass0 + qpos // npix),
                            i32(qpos % npix), i32(take_n), i32(pass_max),
                            i32(spp))
                        qpos += take_n
                        took_all = D * take_n
                    else:
                        ids = queue.take(D * m * Q)
                        fpass, px, valid = self._ids_to_dev(ids, m * Q)
                        (final, o, d, weight, s, alive, lane, lpass,
                         pdepth, delta) = self._fpr_ids_sh(B, m, Q)(
                            final, o, d, weight, s, alive, lane, lpass,
                            pdepth, delta, fpass, px, valid, i32(spp))
                        take_n = (ids.shape[0] + D - 1) // D
                        took_all = ids.shape[0]
                    for e in counts:
                        e[1] += take_n
                    stale_n += take_n
                    if on_frame is not None:
                        on_frame(final, total_real - D * queue_left())
            elif queue_left() == 0:
                stale_n = int(np.asarray(counts[-1][0])) + counts[-1][1]
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
                if alive.shape[0] // D <= self.DRAIN_DEV_MAX \
                        and interrupt is None:
                    o, d, weight, s, alive, pdepth, delta = \
                        self._drain_all_sh()(
                            cs.params, cs.geom, cs.shade, cs.mat_graph,
                            o, d, weight, s, alive, pdepth, delta)
                    break
        return self._final_flush_sh()(final, lane, delta, alive)

    # -- the product entry points ------------------------------------------
    def render_persistent(self, spp: int | None = None, progress=None,
                          resume=None, interrupt=None, on_frame=None,
                          fetch=True):
        """Persistent render across every device of the mesh (and every
        process of a multi-host run). Same per-(pixel, pass) sample
        streams as the single-device path -> same image up to float
        accumulation order. `resume` accepts any persistent checkpoint
        (single- or multi-device, any device count); `interrupt` yields a
        lossless ("interrupted", final_sum, pending, ranges) checkpoint
        tuple exactly like the single-device renderer."""
        spp = spp if spp is not None else self.cscene.prefs.sample_count
        H, W = self.height, self.width
        npix = H * W
        D = self.D
        if self.empty_scene or self.max_depth == 0 or spp < 1:
            return super().render_persistent(spp=spp, progress=progress)
        B = min(self.tile_rays, _next_pow2(npix))
        P_dev = (spp + D - 1) // D          # passes per device
        total_real = npix * spp

        queue = None
        final0 = None
        if resume is not None:
            queue = GidQueue(pending=np.asarray(resume["pending"]),
                             ranges=resume["ranges"])
            final0 = resume["final_sum"]
        out = self._run_pool_sh(
            B, spp, pass_stride=P_dev, px_stride=0, pass_max=spp,
            stride=P_dev * npix, total_real=total_real, progress=progress,
            interrupt=interrupt, on_frame=on_frame, queue=queue,
            final0=final0)
        if isinstance(out, tuple) and out[0] == "interrupted":
            return out
        img = self._reduce_frame_sh()(out) / f32(spp)
        img = img.reshape(H, W, 4)
        if not fetch:
            return img
        return np.asarray(img)

    def render_ids(self, ranges, spp: int) -> np.ndarray:
        """Render an arbitrary set of queue-id ranges (gid = pass * npix
        + sched_index) across every device, returning the (npix, 4)
        radiance SUM those paths contribute. This is the cluster-worker
        tile path (parallel/cluster.py): a master tile × all its passes
        is a set of contiguous gid ranges, so a multi-chip worker host
        renders each tile with ALL its local devices — the analogue of
        the reference worker spawning its full thread pool per tile job
        (worker.c:221-289)."""
        queue = GidQueue(ranges=ranges)
        n = queue.left()
        if n == 0:
            return np.zeros((self.width * self.height, 4), np.float32)
        per_dev = (n + self.D - 1) // self.D
        B = min(self.tile_rays, max(_next_pow2(per_dev), 1024))
        out = self._run_pool_sh(
            B, spp, pass_stride=0, px_stride=0, pass_max=spp, stride=0,
            total_real=n, queue=queue)
        return self.fetch_partial(out)

    def render_pass(self, accum, pass_idx: int, spp: int, on_batch=None):
        """One whole-frame Monte-Carlo pass on EVERY device: the pixel
        axis of the pass is statically split across the mesh (device d
        renders pixels [d*pix_dev, (d+1)*pix_dev) of the tile-order
        schedule). This is the interactive/progressive tier
        (--iterative, --preview, progressive --resume) — the reference
        runs it on the full thread pool (renderer.c:184-250); we run it
        on the full mesh."""
        H, W = self.height, self.width
        npix = H * W
        D = self.D
        if self.empty_scene or self.max_depth == 0:
            return super().render_pass(accum, pass_idx, spp,
                                       on_batch=on_batch)
        pix_dev = (npix + D - 1) // D
        B = min(self.tile_rays, _next_pow2(pix_dev))
        out = self._run_pool_sh(
            B, spp, pass_stride=0, px_stride=pix_dev,
            pass_max=pass_idx + 1, stride=pix_dev, total_real=npix,
            qpass0=pass_idx)
        sample = self._reduce_frame_sh()(out).reshape(H, W, 4)
        if on_batch is not None:
            on_batch(npix, npix)
        n = f32(pass_idx + 1)
        return (accum * (n - f32(1.0)) + sample) / n

    def _persistent_interrupt_sh(self, final, alive, lane, lpass, delta,
                                 qpos, stride, pass_stride, px_stride,
                                 pass_max, queue: GidQueue | None,
                                 qpass0: int = 0):
        """Lossless sharded checkpoint at an interrupt: flush completed
        lanes, gather in-flight (lane, pass) pairs to every process,
        convert to global queue ids, and record the untaken per-device
        queue tails as id ranges. The result resumes on ANY device
        count."""
        npix = self.width * self.height
        final = self._final_flush_sh()(final, lane, delta, alive)
        final_sum = self.fetch_partial(final)
        rep = self._replicate()
        alive_h = np.asarray(rep(alive))
        lane_h = np.asarray(rep(lane))[alive_h]
        pass_h = np.asarray(rep(lpass))[alive_h]
        xs_f, ys_f, _, _, _, _ = self._pixel_schedule
        xs_f = np.asarray(xs_f[:npix])
        ys_f = np.asarray(ys_f[:npix])
        inv = np.empty(npix, np.int64)
        inv[ys_f.astype(np.int64) * self.width + xs_f] = np.arange(npix)
        pend = pass_h.astype(np.int64) * npix + inv[lane_h]
        if queue is not None:
            pend = np.concatenate(
                [pend, np.asarray(queue.pending, np.int64)])
            ranges = [list(r) for r in queue.ranges]
        else:
            gid_cap = pass_max * npix
            ranges = []
            for dev in range(self.D):
                lo = ((dev * pass_stride + qpass0) * npix
                      + dev * px_stride + qpos)
                hi = min(lo + (stride - qpos), gid_cap)
                if hi > lo:
                    ranges.append([lo, hi])
        return ("interrupted", final_sum, pend, ranges)


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
