"""Render checkpoint/resume.

The reference has none (SURVEY.md §5): the closest thing is abort-and-save
(S key, ui.c:206-212). Because our sampler streams are stateless functions
of (pixel, pass), the resumable state of any render is exactly
(accumulation buffer, completed pass count, total pass count) — persisting
that triple resumes bit-identically.
"""

from __future__ import annotations

import os

import numpy as np

MAGIC = "craytpu-ckpt-v1"


def save(path: str, accum: np.ndarray, completed_passes: int,
         total_passes: int, meta: dict | None = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path, magic=MAGIC, accum=np.asarray(accum, np.float32),
        completed_passes=np.int64(completed_passes),
        total_passes=np.int64(total_passes),
        meta=np.array(repr(meta or {})))


def load(path: str):
    """Returns (accum, completed_passes, total_passes)."""
    with np.load(path, allow_pickle=False) as z:
        if str(z["magic"]) != MAGIC:
            raise ValueError(f"{path} is not a craytpu checkpoint")
        return (z["accum"], int(z["completed_passes"]),
                int(z["total_passes"]))
