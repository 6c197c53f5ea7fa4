"""CLI entry point — the equivalent of src/main.c.

Flow mirrors main.c:14-42: initialize -> parse args -> (worker mode |
load scene from file/stdin -> render -> write image). Adds what the
wavefront design gives for free: live progress stats, SIGINT
checkpoint-and-save, and --resume.
"""

from __future__ import annotations

import os
import sys
import time

from craytpu import args as cliargs
from craytpu.utils import logging
from craytpu.version import REFERENCE_VERSION, __version__


def _status(pass_done: int, spp: int, t_start: float, width: int,
            height: int) -> None:
    """The reference's live stats line (renderer.c:137-155): completion %,
    us/path (approximated per pixel-sample), ETA, Msamples/s."""
    elapsed = time.perf_counter() - t_start
    frac = pass_done / spp
    samples = width * height * pass_done
    rate = samples / elapsed if elapsed > 0 else 0.0
    us_per = 1e6 / rate if rate > 0 else 0.0
    eta_ms = (elapsed / frac * (1 - frac)) * 1e3 if frac > 0 else 0.0
    sys.stderr.write(
        f"\r[{int(frac * 100):3d}%] μs/path: {us_per:.2f}, "
        f"ETA: {logging.smart_time(eta_ms)}, {rate / 1e6:.2f}Ms/s "
        f"(pass {pass_done}/{spp})")
    sys.stderr.flush()
    if pass_done == spp:
        sys.stderr.write("\n")


class _KeyPoller:
    """Non-blocking single-key reads from a TTY (the headless analogue of
    the reference's SDL key handler, ui.c:190-233: S=abort+save, X=abort,
    P=pause). No-ops when stdin is not an interactive terminal."""

    def __init__(self):
        self.enabled = False
        self._old = None

    def __enter__(self):
        try:
            import termios
            import tty
            if sys.stdin.isatty():
                self._fd = sys.stdin.fileno()
                self._old = termios.tcgetattr(self._fd)
                tty.setcbreak(self._fd)
                self.enabled = True
        except Exception:
            self.enabled = False
        return self

    def __exit__(self, *exc):
        if self._old is not None:
            import termios
            termios.tcsetattr(self._fd, termios.TCSADRAIN, self._old)

    def poll(self) -> str | None:
        if not self.enabled:
            return None
        import select
        r, _, _ = select.select([sys.stdin], [], [], 0)
        if r:
            return sys.stdin.read(1).lower()
        return None

    def wait_key(self) -> str:
        import select
        select.select([sys.stdin], [], [])
        return sys.stdin.read(1).lower()


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    opts = cliargs.parse_args(argv)
    # multi-HOST bring-up must precede any JAX backend touch: after this,
    # jax.devices() spans every process's chips and the mesh render below
    # covers the whole slice (the analogue of syncWithClients,
    # server.c:369 — but over ICI/DCN collectives, not TCP/base64)
    from craytpu.parallel.dist import init_distributed
    init_distributed()
    logging.set_verbose(bool(opts.get("v")))
    logging.info("craytpu v%s (c-ray %s capability surface)",
                 __version__, REFERENCE_VERSION)

    if opts.get("help"):
        print(cliargs.USAGE.format(prog="craytpu"))
        return 0

    if opts.get("runPerfTests"):
        # perf table (tests/perf/tests.h + testrunner.c:127-148 analogue)
        from craytpu.utils.perftest import run_perf_tests
        return run_perf_tests(opts.get("test_suite"))

    if opts.get("runTests"):
        # test dispatch lives in the CLI exactly like args.c:224-249; we
        # delegate to pytest (the testrunner equivalent)
        import subprocess
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        suite = opts.get("test_suite")
        sel = ["-k", suite] if suite else []
        if opts["test_idx"] in (-2, -3):
            out = subprocess.run(
                [sys.executable, "-m", "pytest", "--collect-only", "-q",
                 os.path.join(repo, "tests")] + sel,
                capture_output=True, text=True)
            n = sum(1 for line in out.stdout.splitlines() if "::" in line)
            print(n)
            return 0
        return subprocess.call(
            [sys.executable, "-m", "pytest", "-q",
             os.path.join(repo, "tests")] + sel)

    if opts.get("shutdown") and opts.get("nodes_list"):
        from craytpu.parallel import cluster
        cluster.shutdown_workers(opts["nodes_list"])
        return 0

    if opts.get("is_worker"):
        from craytpu.parallel import cluster
        return cluster.start_worker(port=opts.get("worker_port", 2222))

    # ---- load scene (main.c:21-27) ----
    overrides = cliargs.scene_overrides(opts)
    clustering = bool(opts.get("use_clustering") and opts.get("nodes_list"))
    from craytpu.utils import fileio
    from craytpu.scene.sceneloader import load_scene_from_buf
    assets = fileio.start_recording() if clustering else None
    input_file = opts.get("inputFile")
    if input_file:
        scene_text = fileio.load_file(input_file, text=True)
        asset_path = os.path.dirname(os.path.abspath(input_file)) + "/"
        scene = load_scene_from_buf(scene_text, asset_path, overrides)
    else:
        logging.info("Reading scene JSON from stdin")
        scene_text = sys.stdin.read()
        asset_path = ""
        scene = load_scene_from_buf(scene_text, asset_path, overrides)
    if clustering:
        fileio.stop_recording()

    from craytpu.scene.compile import compile_scene
    from craytpu.ops import sampler as smp
    from craytpu.runtime import checkpoint

    cscene = compile_scene(scene)
    kind = smp.HALTON if opts.get("interactive") else smp.RANDOM
    # the product's default render spans EVERY visible device (mesh-
    # sharded persistent pools, parallel/pool_shard.py) — the in-product
    # counterpart of the reference using all compute units for one frame
    # (renderer.c:96-117 threads + server.c:369 cluster)
    from craytpu.parallel.pool_shard import (ShardedPoolRenderer,
                                             make_renderer)
    # --nee: next-event estimation (explicit light sampling, ops/nee.py) —
    # a lower-variance estimator the reference does not have; renders
    # differ from the BSDF-sampling goldens by design (unbiased, tested
    # in tests/test_nee.py)
    nee = bool(opts.get("nee"))
    if nee:
        logging.info("Next-event estimation enabled (--nee)")
    # one factory for every role: the TCP master renders its share of
    # tiles over all ITS local devices too (renderer.c:96-117 — the
    # reference master's full local thread pool runs alongside its
    # network threads); cluster.render_tile routes sharded renderers
    # through the render_ids persistent-pool path
    r = make_renderer(cscene, kind=kind, nee=nee)
    sharded = isinstance(r, ShardedPoolRenderer)

    import jax.numpy as jnp
    import numpy as np
    spp = scene.prefs.sample_count
    start_pass = 0
    persist_resume = None
    accum = jnp.zeros((r.height, r.width, 4), jnp.float32)
    if opts.get("resume"):
        if checkpoint.kind(opts["resume"]) == "persistent":
            persist_resume, total, shape = checkpoint.load_persistent(
                opts["resume"])
            if shape != (r.height, r.width) or total != spp:
                # logging.error raises FatalError -> nonzero process exit
                logging.error(
                    "Checkpoint %s does not match this render "
                    "(shape %s vs %s, spp %d vs %d)", opts["resume"],
                    shape, (r.height, r.width), total, spp)
            left = (len(persist_resume["pending"])
                    + sum(b - a for a, b in persist_resume["ranges"]))
            logging.info("Resuming persistent render: %d/%d queue entries "
                         "left (%d in-flight paths re-traced)",
                         left, r.width * r.height * spp,
                         len(persist_resume["pending"]))
        else:
            acc_np, start_pass, total = checkpoint.load(opts["resume"])
            if acc_np.shape != (r.height, r.width, 4) or total != spp:
                # logging.error raises FatalError -> nonzero process exit
                logging.error(
                    "Checkpoint %s does not match this render "
                    "(shape %s vs %s, spp %d vs %d)", opts["resume"],
                    acc_np.shape, (r.height, r.width, 4), total, spp)
            accum = jnp.asarray(acc_np)
            logging.info("Resuming at pass %d/%d", start_pass, spp)

    ckpt_path = os.path.join(scene.prefs.img_file_path or ".",
                             scene.prefs.img_file_name + ".ckpt.npz")

    logging.info("Rendering at %dx%d", r.width, r.height)
    logging.info("Rendering %d samples with %d bounces", spp, r.max_depth)
    if sharded:
        logging.info("Pathtracing on %d %s devices (mesh-sharded "
                     "persistent pools)...", r.D, _backend_name())
    else:
        logging.info("Pathtracing on %s...", _backend_name())

    if clustering:
        from craytpu.parallel import cluster
        t0 = time.perf_counter()
        clients = cluster.sync_with_clients(
            opts["nodes_list"], scene_text, asset_path, assets, overrides)
        if not clients:
            logging.warning("No network render workers, rendering locally")

        worker_stats: dict = {}

        def tile_progress(done, total):
            ws = "  ".join(f"{n.split(':')[0]}:{c}t/{a:.0f}ms"
                           for n, (c, a) in sorted(worker_stats.items()))
            sys.stderr.write(f"\r[{int(done / total * 100):3d}%] "
                             f"tile {done}/{total}  {ws}")
            sys.stderr.flush()

        def on_stats(name, completed, avg_ms):
            # per-worker progress from the ~1 Hz stats stream
            # (server.c:240-244 analogue)
            worker_stats[name] = (completed, avg_ms)
        fb = cluster.render_clustered(scene, r, clients, spp,
                                      progress=tile_progress,
                                      on_stats=on_stats)
        sys.stderr.write("\n")
        render_ms = (time.perf_counter() - t0) * 1e3
        logging.info("Finished render in %s", logging.smart_time(render_ms))
        from craytpu.api import Renderer
        api = Renderer(scene=scene, compiled=cscene, framebuffer=fb,
                       render_time_ms=render_ms)
        api.write_image()
        return 0

    # --preview-http: live localhost view of the accumulating frame +
    # progress counters (ui.c:88-160/:236-320 analogue for headless hosts)
    preview_srv = None
    if opts.get("preview_http") is not None:
        from craytpu.runtime.preview import PreviewServer
        preview_srv = PreviewServer(r.width, r.height,
                                    port=opts["preview_http"] or 8650)
        url = preview_srv.start()
        logging.info("Live preview at %s", url)

    # progressive preview (the SDL window analogue on headless TPU hosts):
    # --preview [N] writes <name>_preview.png every N passes
    preview_every = opts.get("preview")
    if preview_every is True:
        preview_every = 1
    preview_path = os.path.join(scene.prefs.img_file_path or ".",
                                scene.prefs.img_file_name + "_preview.png")

    # Fast path: when no progressive feature is requested (no preview,
    # not interactive), render the whole frame as ONE persistent
    # wavefront — full device occupancy across tiles and passes, like the
    # reference's batch mode which also only delivers the finished frame.
    progressive = bool(preview_every or opts.get("interactive")
                       or start_pass)

    # --trace DIR: jax.profiler device trace of the whole render — the
    # TPU-native upgrade over the reference's wall-clock-only profiling
    # (SURVEY.md §5); view with tensorboard/perfetto
    trace_dir = opts.get("trace_dir")
    if trace_dir:
        import jax
        os.makedirs(trace_dir, exist_ok=True)
        jax.profiler.start_trace(trace_dir)
        logging.info("Capturing device trace to %s", trace_dir)

    t0 = time.perf_counter()
    interrupted = False
    if not progressive:
        import signal

        region_tracker = None
        last_regions = [0.0]
        if preview_srv is not None:
            # per-region progress grid for the preview overlay — the
            # reference's per-tile in-flight feedback (ui.c:236-320)
            from craytpu.runtime.regions import RegionTracker
            npix_s = r.width * r.height
            xs_s, ys_s, _, _, _, _ = r._pixel_schedule
            region_tracker = RegionTracker(
                r.width, r.height, np.asarray(xs_s[:npix_s]),
                np.asarray(ys_s[:npix_s]))

        def ray_progress(done, total):
            frac = max(done, 0) / max(total, 1)
            sys.stderr.write(f"\r[{int(frac * 100):3d}%] "
                             f"{done // 1000}k/{total // 1000}k paths")
            sys.stderr.flush()
            if preview_srv is not None:
                preview_srv.progress_only(max(done, 0), total)
                now = time.perf_counter()
                if region_tracker is not None \
                        and now - last_regions[0] >= 1.0:
                    last_regions[0] = now
                    lanes = r.tile_rays * getattr(r, "D", 1)
                    preview_srv.update_regions(*region_tracker.snapshot(
                        max(done, 0), spp, lanes))

        on_frame = None
        if preview_srv is not None:
            npix = r.width * r.height
            last_fetch = [0.0]

            def on_frame(final_dev, done):
                # throttle: the framebuffer fetch is a full device->host
                # copy (33 MB at 1080p) — at most one every 2 s
                now = time.perf_counter()
                if now - last_fetch[0] < 2.0 or done <= 0:
                    return
                last_fetch[0] = now
                # fetch_partial reduces sharded per-device partials to a
                # replicated frame first (multi-host safe)
                fs = r.fetch_partial(final_dev)
                denom = max(done / npix, 1e-9)
                preview_srv.update((fs / denom).reshape(
                    r.height, r.width, 4), done, npix * spp)

        # SIGINT or the X/S keys on the fast path: checkpoint at the next
        # refill boundary (losslessly: completed lanes' radiance +
        # in-flight queue ids). P pauses (ui.c:190-233 analogue).
        want_stop = []
        prev_handler = signal.signal(
            signal.SIGINT, lambda *_: want_stop.append(True))
        keys = _KeyPoller()

        def interrupt():
            k = keys.poll()
            if k == "p":
                sys.stderr.write("\n[paused — any key resumes]")
                sys.stderr.flush()
                keys.wait_key()
            elif k in ("x", "s"):
                want_stop.append(True)
            return bool(want_stop)

        try:
            with keys:
                out = r.render_persistent(spp=spp, progress=ray_progress,
                                          resume=persist_resume,
                                          interrupt=interrupt,
                                          on_frame=on_frame)
        finally:
            signal.signal(signal.SIGINT, prev_handler)
        sys.stderr.write("\n")
        if isinstance(out, tuple) and out[0] == "interrupted":
            _, final_sum, pending, ranges = out
            logging.info("Aborting persistent render; checkpointing "
                         "(%d in-flight paths recorded)", len(pending))
            if _proc0():
                checkpoint.save_persistent(ckpt_path, final_sum, pending,
                                           ranges, spp,
                                           (r.height, r.width))
                logging.info("Wrote checkpoint %s (resume with --resume)",
                             ckpt_path)
            return 130
        accum = jnp.asarray(out)
    else:
        try:
            prev_accum = accum
            p = start_pass
            with _KeyPoller() as keys:
                for p in range(start_pass, spp):
                    prev_accum = accum  # pre-update buffer for checkpoint
                    accum = r.render_pass(accum, p, spp)
                    accum.block_until_ready()
                    _status(p + 1, spp, t0, r.width, r.height)
                    if preview_srv is not None:
                        npx = r.width * r.height
                        preview_srv.update(np.asarray(accum),
                                           (p + 1) * npx, spp * npx)
                    if preview_every and (p + 1) % int(preview_every) == 0:
                        from craytpu.io.png import write_png
                        write_png(preview_path, np.asarray(accum),
                                  {"Samples per pixel": str(p + 1)})
                    # S=abort+save partial, X=abort(checkpoint), P=pause
                    # (ui.c:190-233)
                    k = keys.poll()
                    if k == "p":
                        sys.stderr.write("\n[paused — any key resumes]")
                        sys.stderr.flush()
                        keys.wait_key()
                    elif k == "s":
                        logging.info("Aborting render, saving partial "
                                     "result (%d/%d passes)", p + 1, spp)
                        break
                    elif k == "x":
                        raise KeyboardInterrupt
        except KeyboardInterrupt:
            interrupted = True
            # SIGINT may land after accum was reassigned for pass p but
            # before the pass counter advanced; checkpoint the PRE-update
            # buffer with p so resume re-renders pass p exactly once
            # instead of double-weighting it
            p_done = p
            sys.stderr.write("\n")
            logging.info("Aborting render (pass %d/%d); checkpointing",
                         p_done, spp)
            if _proc0():
                checkpoint.save(ckpt_path, np.asarray(prev_accum), p_done,
                                spp)
                logging.info("Wrote checkpoint %s (resume with --resume)",
                             ckpt_path)
            accum = prev_accum

    render_ms = (time.perf_counter() - t0) * 1e3
    if trace_dir:
        import jax
        jax.profiler.stop_trace()
        logging.info("Wrote device trace to %s", trace_dir)
    logging.info("Finished render in %s", logging.smart_time(render_ms))

    # ---- write image (main.c:30, c-ray.c:85-111) ----
    if _proc0():
        from craytpu.api import Renderer
        api = Renderer(scene=scene, compiled=cscene,
                       framebuffer=np.asarray(accum),
                       render_time_ms=render_ms)
        api.write_image()
    return 130 if interrupted else 0


def _backend_name() -> str:
    try:
        import jax
        return jax.devices()[0].platform
    except Exception:
        return "unknown"


def _proc0() -> bool:
    """True on the (only) process of a single-host run or process 0 of a
    multi-host run — checkpoint/image writes happen once."""
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True
