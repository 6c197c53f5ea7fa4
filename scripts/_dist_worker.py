"""Helper process for tests/test_distributed.py: one of N jax.distributed
processes on CPU. Computes the sharded image loss of the entry scene over
the GLOBAL mesh and prints it (identical on every process; the test reads
process 0's)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 2 local CPU devices per process BEFORE jax import
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
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
    from craytpu.parallel import shard
    assert jax.process_count() == nproc
    n_dev = len(jax.devices())
    assert n_dev == 2 * nproc, f"global devices {n_dev}"

    from craytpu.scene.sceneloader import load_scene_from_file
    from craytpu.scene.compile import compile_scene
    from craytpu.models.wavefront_pt import WavefrontRenderer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = load_scene_from_file(
        os.path.join(repo, "assets", "entry_scene.json"))
    cs = compile_scene(scene)
    r = WavefrontRenderer(cs)

    mesh = shard.make_mesh()        # spans all processes
    loss_fn = shard.make_loss_fn(r, mesh, depth=2)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    B = shard.pad_to(64, mesh.shape[shard.RAY_AXIS])
    xs_np = (np.arange(B, dtype=np.int32) % r.width)
    ys_np = (np.arange(B, dtype=np.int32) // r.width % r.height)
    tgt_np = np.zeros((B, 3), np.float32)

    def gmake(arr, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx])

    xs = gmake(xs_np, P(shard.RAY_AXIS))
    ys = gmake(ys_np, P(shard.RAY_AXIS))
    tgt = gmake(tgt_np, P(shard.RAY_AXIS, None))
    params = jax.tree.map(
        lambda x: gmake(np.asarray(x), P()), cs.params)

    loss = jax.jit(loss_fn)(params, xs, ys, tgt, jnp.int32(0))
    print(f"DIST_LOSS {float(loss):.9f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
