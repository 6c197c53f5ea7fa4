"""Tile quantization + ordering parity (datatypes/tile.c)."""

import numpy as np

from craytpu.runtime.tile import (quantize_image, pixel_order, _HostPCG32,
                                  _rand_interval)


def test_quantize_counts_and_clamps():
    # 1280x800 at 64x64 -> 20x13 = 260 tiles (scene.json defaults)
    tiles = quantize_image(1280, 800, 64, 64, "normal")
    assert len(tiles) == 260
    # edge tiles are clipped: last row is 800 - 12*64 = 32 high
    assert tiles[-1].height == 32 and tiles[-1].width == 64
    # oversized tile dims clamp to the image
    t = quantize_image(100, 50, 4096, 4096, "normal")
    assert len(t) == 1 and t[0].width == 100 and t[0].height == 50


def test_orderings():
    def nums(order, n=6):
        return [t.tile_num for t in quantize_image(n, 1, 1, 1, order)]

    assert nums("normal") == [0, 1, 2, 3, 4, 5]
    assert nums("topToBottom") == [5, 4, 3, 2, 1, 0]
    # fromMiddle (tile.c:161-182): midRight=n/2, alternate right++/left--
    assert nums("fromMiddle") == [3, 2, 4, 1, 5, 0]
    # toMiddle (tile.c:184-207): alternate from both ends
    assert nums("toMiddle") == [5, 0, 4, 1, 3, 2]
    # odd count
    assert nums("fromMiddle", 5) == [2, 1, 3, 0, 4]


def test_random_order_deterministic():
    a = [t.tile_num for t in quantize_image(16, 16, 4, 4, "random")]
    b = [t.tile_num for t in quantize_image(16, 16, 4, 4, "random")]
    assert a == b  # fixed seed 3141592 (tile.c:149-150)
    assert sorted(a) == list(range(16))
    assert a != list(range(16))


def test_rand_interval_matches_reference_model():
    # cross-check the host PCG32 against the bit-exact test model
    from tests.reference_models import pcg32_seed, pcg32_next
    rng = _HostPCG32(3141592, 0)
    state = pcg32_seed(3141592)
    for _ in range(10):
        ours = rng.next()
        ref, state = pcg32_next(state)
        assert ours == ref


def test_pixel_order_covers_frame():
    xs, ys, tiles, offsets = pixel_order(10, 7, 4, 4, "fromMiddle")
    assert xs.shape == (70,)
    flat = ys.astype(np.int64) * 10 + xs
    assert sorted(flat.tolist()) == list(range(70))
    assert offsets[-1] == 70
    assert len(tiles) == 3 * 2
