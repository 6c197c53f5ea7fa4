"""Helper process for tests/test_distributed.py: one of N jax.distributed
processes on CPU, exercising the PRODUCT renderer (ShardedPoolRenderer)
over the global multi-process mesh — the TPU-native analogue of the
reference's whole-cluster single-frame render (renderer.c:96-117 +
utils/protocol/server.c:369).

Covers, across 2 processes x 2 local devices = 4 global pools:
  1. the full persistent render (live-count pmax steering, final psum),
  2. interrupt -> lossless checkpoint (replicated gathers + the
     process-0 interrupt broadcast) -> resume,
  3. the progressive tier (render_pass pixel-split across the mesh).

Each process validates the frames against a LOCAL single-device render
(same per-(pixel, pass) sample streams -> allclose) and prints
DIST_RENDER <sha256 of the rounded frame> so the test can also assert
cross-process agreement.
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# argv[4] local CPU devices per process (default 2) BEFORE jax import
_NDEV = int(sys.argv[4]) if len(sys.argv) > 4 else 2
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_NDEV}")
os.environ["CRAYTPU_PLATFORM"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    coord = sys.argv[1]
    nproc = int(sys.argv[2])
    pid = int(sys.argv[3])

    from craytpu.parallel.dist import init_distributed

    ok = init_distributed(coord, nproc, pid)
    assert ok, "init_distributed returned False"
    assert jax.process_count() == nproc
    assert len(jax.devices()) == _NDEV * nproc

    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import WavefrontRenderer
    from craytpu.parallel.pool_shard import ShardedPoolRenderer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = load_scene_from_file(
        os.path.join(repo, "assets", "entry_scene.json"))
    cs = compile_scene(scene)
    spp = 4

    # local single-device oracle (same streams, float-order differences
    # only) — rendered on this process's first device
    ref = WavefrontRenderer(cs, tile_rays=4096).render_persistent(spp=spp)

    r = ShardedPoolRenderer(cs, tile_rays=1024)
    assert r.D == _NDEV * nproc

    # 1. full product render over the multi-process mesh
    img = r.render_persistent(spp=spp)
    np.testing.assert_allclose(img, ref, rtol=2e-5, atol=2e-6)

    # 2. interrupt (decided on process 0, broadcast) -> checkpoint ->
    #    resume across the same mesh
    calls = []

    def interrupt():
        calls.append(1)
        return len(calls) >= 2

    out = r.render_persistent(spp=spp, interrupt=interrupt)
    assert isinstance(out, tuple) and out[0] == "interrupted", out[0]
    _, final_sum, pending, ranges = out
    img2 = ShardedPoolRenderer(cs, tile_rays=1024).render_persistent(
        spp=spp, resume={"final_sum": final_sum, "pending": pending,
                         "ranges": ranges})
    np.testing.assert_allclose(img2, ref, rtol=2e-5, atol=2e-6)

    # 3. progressive tier: two passes, pixel-split over all 4 pools
    import jax.numpy as jnp
    single = WavefrontRenderer(cs, tile_rays=4096)
    acc_ref = jnp.zeros((r.height, r.width, 4), jnp.float32)
    acc = jnp.zeros((r.height, r.width, 4), jnp.float32)
    for p in range(2):
        acc_ref = single.render_pass(acc_ref, p, spp)
        acc = r.render_pass(acc, p, spp)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref),
                               rtol=2e-5, atol=2e-6)

    digest = hashlib.sha256(
        np.round(np.asarray(img, np.float64), 4).tobytes()).hexdigest()
    print(f"DIST_RENDER {digest}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
