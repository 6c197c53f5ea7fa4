"""Native C++ SAH builder produces the identical tree to the Python path."""

import numpy as np
import pytest

from craytpu.accel import bvh as bvhmod
from craytpu import native


def _random_tris(rng, n):
    v0 = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    bmin = np.minimum(v0, np.minimum(v1, v2))
    bmax = np.maximum(v0, np.maximum(v1, v2))
    centers = ((v0 + v1) + v2) * np.float32(1 / 3)
    return bmin, bmax, centers


@pytest.mark.skipif(native.bvh_builder() is None,
                    reason="native builder unavailable")
@pytest.mark.parametrize("n", [1, 2, 17, 333, 5000])
def test_native_matches_python(n, monkeypatch):
    rng = np.random.default_rng(n)
    bmin, bmax, centers = _random_tris(rng, n)
    nat = bvhmod.build_bvh(bmin, bmax, centers)

    monkeypatch.setenv("CRAYTPU_NO_NATIVE", "1")
    py = bvhmod.build_bvh(bmin, bmax, centers)

    assert nat.node_count == py.node_count
    np.testing.assert_array_equal(nat.child, py.child)
    np.testing.assert_array_equal(nat.count, py.count)
    np.testing.assert_array_equal(nat.prim_indices, py.prim_indices)
    np.testing.assert_array_equal(nat.bounds, py.bounds)


@pytest.mark.skipif(native.bvh_builder() is None,
                    reason="native builder unavailable")
def test_degenerate_prims():
    # coincident centers (all in bin 0) must still terminate
    n = 40
    bmin = np.zeros((n, 3), np.float32)
    bmax = np.ones((n, 3), np.float32)
    centers = np.full((n, 3), 0.5, np.float32)
    t = bvhmod.build_bvh(bmin, bmax, centers)
    assert t.count.max() >= 1
    assert sorted(t.prim_indices.tolist()) == list(range(n))
