"""The driver contract: entry() compile-checks and dryrun_multichip runs a
full sharded train step on the virtual 8-device CPU mesh."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 4)
    assert np.isfinite(np.asarray(out)).all()
    assert float(out.mean()) > 0.0


def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
