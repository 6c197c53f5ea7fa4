"""Golden-image parity vs the compiled C reference, in CI.

The reference ships no image tests (SURVEY.md §4) — we do better: every
corpus scene renders at 80x50/4spp on CPU (SIMT reference-exact traversal)
under shared PCG sample streams and must match the C oracle's PNG within
accumulation rounding. Goldens were produced by `.refbuild/bin/c-ray
<scene> -d 80x50 -s 4` (the reference build tree kept as the correctness
oracle, run with CWD-style asset resolution against /root/reference/input
so both renderers see the identical asset set, including the known-missing
large blobs). A shading/traversal regression anywhere in the pipeline
fails this test. The SAME comparison also gates the TPU bench path
(bench.py runs craytpu.utils.golden.render_and_compare on its backend).
"""

import pytest

from craytpu.utils import golden as g


@pytest.mark.parametrize("name", g.SCENES)
def test_golden(name):
    ok, within, mean_abs = g.render_and_compare(name)
    if ok is None:
        pytest.skip(f"no golden for {name}")
    assert ok, (
        f"{name}: {within:.4f} of subpixels within 1 LSB "
        f"(need >= {g.MIN_WITHIN_1LSB}), mean|d|={mean_abs:.4f} "
        f"(need <= {g.MAX_MEAN_ABS})")
