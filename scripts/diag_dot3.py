"""Find a cross-backend bit-deterministic dot3/matvec formulation.

The plain (a0*b0 + a1*b1) + a2*b2 chain differs by 1 ulp on ~0.1% of
lanes between XLA:CPU and XLA:TPU (FMA/MAC contraction asymmetry,
scripts/diag_camera.py len2 row). Candidates: barriered products
(forces separate mul rounding), barriered partial sums, and a
two_prod-compensated sum.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "output", "diag")
os.makedirs(OUT, exist_ok=True)


def record(tag):
    import craytpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    f32 = jnp.float32
    bar = jax.lax.optimization_barrier
    print("backend:", jax.default_backend(), flush=True)

    rng = np.random.default_rng(11)
    N = 1 << 18
    a = rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32)
    b = rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)

    def plain(a, b):
        return (a[:, 0] * b[:, 0] + a[:, 1] * b[:, 1]
                + a[:, 2] * b[:, 2])

    def barprod(a, b):
        return (bar(a[:, 0] * b[:, 0]) + bar(a[:, 1] * b[:, 1])
                + bar(a[:, 2] * b[:, 2]))

    def barsum(a, b):
        return bar(bar(a[:, 0] * b[:, 0] + a[:, 1] * b[:, 1])
                   + a[:, 2] * b[:, 2])

    def barall(a, b):
        p0 = bar(a[:, 0] * b[:, 0])
        p1 = bar(a[:, 1] * b[:, 1])
        p2 = bar(a[:, 2] * b[:, 2])
        return bar(bar(p0 + p1) + p2)

    # normalize built on barall + exact ops
    from craytpu.ops import vecmath as vm

    def normfull(a, b):
        l2 = barall(a, a)
        return vm.exact_div(a[:, 0], vm.exact_sqrt(l2))

    def rnd(x):
        # int bitcast round-trip: pins the product to a rounded f32
        # value LLVM's fp-contract can't see through
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.int32), jnp.float32)

    def castprod(a, b):
        return (rnd(a[:, 0] * b[:, 0]) + rnd(a[:, 1] * b[:, 1])
                + rnd(a[:, 2] * b[:, 2]))

    def castall(a, b):
        return rnd(rnd(rnd(a[:, 0] * b[:, 0]) + rnd(a[:, 1] * b[:, 1]))
                   + rnd(a[:, 2] * b[:, 2]))

    fns = {"plain": plain, "barprod": barprod, "barsum": barsum,
           "barall": barall, "normfull": normfull,
           "castprod": castprod, "castall": castall}
    out = {}
    for name, fn in fns.items():
        out[name] = np.asarray(jax.jit(fn)(aj, bj)).view(np.uint32)
    np.savez(os.path.join(OUT, f"d3_{tag}.npz"), **out)
    print("ok", flush=True)


def compare():
    A = np.load(os.path.join(OUT, "d3_cpu.npz"))
    B = np.load(os.path.join(OUT, "d3_tpu.npz"))
    for k in A.files:
        x = A[k].astype(np.int64)
        y = B[k].astype(np.int64)
        xs = np.where(x >= 0x80000000, 0x80000000 - x, x)
        ys = np.where(y >= 0x80000000, 0x80000000 - y, y)
        ulp = np.abs(xs - ys)
        print(f"{k:9s} %bits-differ={(x != y).mean() * 100:8.4f} "
              f"max-ulp={ulp.max()}")


if __name__ == "__main__":
    if sys.argv[1] == "compare":
        compare()
    else:
        record(sys.argv[1])
