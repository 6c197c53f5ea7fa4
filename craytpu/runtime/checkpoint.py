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
MAGIC_P = "craytpu-ckpt-persistent-v1"


def save(path: str, accum: np.ndarray, completed_passes: int,
         total_passes: int, meta: dict | None = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path, magic=MAGIC, accum=np.asarray(accum, np.float32),
        completed_passes=np.int64(completed_passes),
        total_passes=np.int64(total_passes),
        meta=np.array(repr(meta or {})))


def save_persistent(path: str, final_sum: np.ndarray, qpos: int,
                    pending: np.ndarray, total_passes: int,
                    shape: tuple) -> None:
    """Persistent-wavefront checkpoint: the RADIANCE SUM framebuffer (not
    yet divided by spp), the queue position, and the in-flight queue ids
    whose paths must be re-traced on resume."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path, magic=MAGIC_P, final_sum=np.asarray(final_sum, np.float32),
        qpos=np.int64(qpos), pending=np.asarray(pending, np.int64),
        total_passes=np.int64(total_passes),
        shape=np.asarray(shape, np.int64))


def kind(path: str) -> str:
    """"progressive" | "persistent" for a checkpoint file."""
    with np.load(path, allow_pickle=False) as z:
        m = str(z["magic"])
    if m == MAGIC:
        return "progressive"
    if m == MAGIC_P:
        return "persistent"
    raise ValueError(f"{path} is not a craytpu checkpoint")


def load(path: str):
    """Returns (accum, completed_passes, total_passes)."""
    with np.load(path, allow_pickle=False) as z:
        if str(z["magic"]) != MAGIC:
            raise ValueError(f"{path} is not a craytpu checkpoint")
        return (z["accum"], int(z["completed_passes"]),
                int(z["total_passes"]))


def load_persistent(path: str):
    """Returns (resume dict for render_persistent, total_passes, shape)."""
    with np.load(path, allow_pickle=False) as z:
        if str(z["magic"]) != MAGIC_P:
            raise ValueError(f"{path} is not a persistent checkpoint")
        return ({"final_sum": z["final_sum"], "qpos": int(z["qpos"]),
                 "pending": z["pending"]},
                int(z["total_passes"]), tuple(int(x) for x in z["shape"]))
