"""Micro-bisect of triangle_distribution's cross-backend divergence.

Runs each candidate formulation on the same small-magnitude inputs the
tent filter produces (|orig| down to ~1e-8) and bit-compares backends.
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
    print("backend:", jax.default_backend(), flush=True)

    bar = jax.lax.optimization_barrier

    def two_prod(x, y):
        """Dekker: exact p + e == x*y (needs exact mul/add, no fma/
        reassoc — barrier the split against simplification)."""
        p = x * y
        c = bar(f32(4097.0) * x)
        hx = c - (c - x)
        lx = x - hx
        c2 = bar(f32(4097.0) * y)
        hy = c2 - (c2 - y)
        ly = y - hy
        e = ((hx * hy - p) + hx * ly + lx * hy) + lx * ly
        return p, e

    def refined_div(a, b):
        q = bar(a / b)                    # hw approx (~2 ulp)
        p, e = two_prod(q, b)
        r = (a - p) - e                   # exact residual a - q*b
        return q + bar(r / b)

    def refined_sqrt(x):
        s = bar(jnp.sqrt(x))              # hw approx (~2 ulp)
        p, e = two_prod(s, s)
        r = (x - p) - e                   # exact residual x - s*s
        return s + bar(r / (s + s))

    rng = np.random.default_rng(3)
    # u in [0,1): orig = 2u-1 spans [-1,1) incl. tiny magnitudes
    u = rng.uniform(0, 1, 1 << 15).astype(np.float32)
    u = np.concatenate([u, (0.5 + np.linspace(-1e-7, 1e-7, 1 << 15)
                            ).astype(np.float32)])
    uj = jnp.asarray(u)

    def orig_of(v):
        return v * f32(2.0) - f32(1.0)

    fns = {
        "orig": lambda v: orig_of(v),
        "absial": lambda v: jnp.abs(orig_of(v)),
        "sqrt": lambda v: jnp.sqrt(jnp.abs(orig_of(v))),
        "div": lambda v: orig_of(v) / jnp.sqrt(jnp.abs(orig_of(v))),
        "div_bar": lambda v: orig_of(v) / jax.lax.optimization_barrier(
            jnp.sqrt(jnp.abs(orig_of(v)))),
        "div_bar2": lambda v: jax.lax.optimization_barrier(
            orig_of(v)) / jax.lax.optimization_barrier(
            jnp.sqrt(jnp.abs(orig_of(v)))),
        "signsqrt": lambda v: jnp.copysign(
            jnp.sqrt(jnp.abs(orig_of(v))), orig_of(v)),
        "recip": lambda v: f32(1.0) / jnp.sqrt(jnp.abs(orig_of(v))),
        "plaindiv": lambda v: orig_of(v) / jnp.abs(orig_of(v)),
        "refdiv": lambda v: refined_div(orig_of(v),
                                        jnp.abs(orig_of(v))),
        "refsqrt": lambda v: refined_sqrt(jnp.abs(orig_of(v))),
        "reftent": lambda v: refined_div(
            orig_of(v), refined_sqrt(jnp.abs(orig_of(v)))),
    }
    out = {}
    for name, fn in fns.items():
        out[name] = np.asarray(jax.jit(fn)(uj)).view(np.uint32)
    np.savez(os.path.join(OUT, f"td_{tag}.npz"), **out)
    print("ok", flush=True)


def compare():
    A = np.load(os.path.join(OUT, "td_cpu.npz"))
    B = np.load(os.path.join(OUT, "td_tpu.npz"))
    for k in A.files:
        x = A[k].astype(np.int64)
        y = B[k].astype(np.int64)
        fa = A[k].view(np.float32)
        fb = B[k].view(np.float32)
        ok = ~(np.isnan(fa) & np.isnan(fb))   # both-NaN: bit pattern
        x, y, fa, fb = x[ok], y[ok], fa[ok], fb[ok]
        xs = np.where(x >= 0x80000000, 0x80000000 - x, x)
        ys = np.where(y >= 0x80000000, 0x80000000 - y, y)
        ulp = np.abs(xs - ys)
        i = int(np.argmax(ulp))
        print(f"{k:10s} %bits-differ={(x != y).mean() * 100:8.4f} "
              f"max-ulp={ulp.max()} (nonNaN {len(x)})"
              + (f"  worst: cpu={fa[i]!r} tpu={fb[i]!r}"
                 if ulp.max() else ""))


if __name__ == "__main__":
    if sys.argv[1] == "compare":
        compare()
    else:
        record(sys.argv[1])
