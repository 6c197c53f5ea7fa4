"""Which f32 primitives are bit-identical between XLA:CPU and XLA:TPU?

Evaluates a battery of candidate ops on identical inputs on the current
backend and dumps raw bits; "compare" prints, per op, the fraction of
results whose BITS differ and the max ulp distance. This decides which
ops the geometry/shading path may use freely and which need
deterministic replacements (cross-backend golden parity, VERDICT r4 #1).
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "output", "diag")
os.makedirs(OUT, exist_ok=True)

N = 1 << 16


def build_inputs():
    rng = np.random.default_rng(42)
    # mixed-magnitude values, scene-like ranges
    a = (rng.uniform(-2000, 2000, N)).astype(np.float32)
    b = (rng.uniform(-2000, 2000, N)).astype(np.float32)
    c = (rng.uniform(-1, 1, N)).astype(np.float32)
    d = (rng.uniform(1e-4, 4.0, N)).astype(np.float32)
    u = (rng.uniform(0, 1, N)).astype(np.float32)
    return a, b, c, d, u


def record(tag):
    import craytpu  # noqa: F401  (setup_jax: CRAYTPU_PLATFORM pin)
    import jax
    import jax.numpy as jnp
    print("backend:", jax.default_backend(), flush=True)
    a, b, c, d, u = [jnp.asarray(x) for x in build_inputs()]

    M = jnp.asarray(np.random.default_rng(7).uniform(
        -1, 1, (3, 3)).astype(np.float32))
    v3 = jnp.stack([c, c * 2, c * 3], axis=-1)          # (N, 3)

    ops = {
        "mul": lambda: a * b,
        "add": lambda: a + b,
        "muladd": lambda: a * b + c,                     # FMA contraction?
        "dot3": lambda: (v3[:, 0] * M[0, 0] + v3[:, 1] * M[0, 1]
                         + v3[:, 2] * M[0, 2]),
        "matvec_at": lambda: (v3 @ M.T)[:, 0],           # highest precision
        "div": lambda: a / d,
        "recip": lambda: 1.0 / d,
        "sqrt": lambda: jnp.sqrt(d),
        "rsqrt": lambda: jax.lax.rsqrt(d),
        "norm3": lambda: (v3 / jnp.sqrt(
            jnp.sum(v3 * v3, axis=-1, keepdims=True)))[:, 0],
        "sin": lambda: jnp.sin(c * 6.0),
        "cos": lambda: jnp.cos(c * 6.0),
        "tan": lambda: jnp.tan(c),
        "atan2": lambda: jnp.arctan2(c, d),
        "asin": lambda: jnp.arcsin(c),
        "acos": lambda: jnp.arccos(c),
        "exp": lambda: jnp.exp(c * 10.0),
        "log": lambda: jnp.log(d),
        "pow": lambda: jnp.power(d, c * 4.0),
        "cbrt": lambda: jnp.cbrt(d),
    }
    out = {}
    for name, fn in ops.items():
        out[name] = np.asarray(jax.jit(fn)()).view(np.uint32)
    np.savez(os.path.join(OUT, f"ops_{tag}.npz"), **out)
    print("recorded", len(out), "ops", flush=True)


def compare():
    A = np.load(os.path.join(OUT, "ops_cpu.npz"))
    B = np.load(os.path.join(OUT, "ops_tpu.npz"))
    print(f"{'op':10s} {'%bits-differ':>12s} {'max-ulp':>8s}")
    for k in A.files:
        x, y = A[k].astype(np.int64), B[k].astype(np.int64)
        # ulp distance on the monotone int mapping of floats
        xs = np.where(x >= 0x80000000, 0x80000000 - x, x)
        ys = np.where(y >= 0x80000000, 0x80000000 - y, y)
        ulp = np.abs(xs - ys)
        print(f"{k:10s} {(x != y).mean() * 100:11.4f}% {ulp.max():8d}")


if __name__ == "__main__":
    if sys.argv[1] == "compare":
        compare()
    else:
        record(sys.argv[1])
