"""Elastic tile execution: failure detection, re-dispatch, resume.

The reference has no fault handling beyond a GPU-OOM fallback
(src/viewer/viewer.cpp:854-867).  A TPU fleet preempts and faults, so the
production scheduler needs the property SURVEY.md §5 calls out: rendering
is stateless per tile batch, so recovery = re-dispatch the failed batch;
long jobs checkpoint completed batches and resume without re-rendering.

Host-side driver (the per-batch device work stays one jitted call):
- splits the frame into fixed-size pixel batches (static shapes);
- detects per-batch failures (any exception from the device call),
  retries each batch up to ``retries`` times;
- on a retry it re-enters through a fresh ``jax.jit`` wrapper so a
  poisoned executable or donated-buffer state cannot wedge the job;
- optionally persists finished batches to ``checkpoint_path`` (npz) after
  every ``checkpoint_every`` batches: a restarted job resumes from there
  (preemption loses at most one checkpoint window);
- ``fault_hook(batch_index, attempt)`` lets tests inject failures.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ElasticReport:
    """What happened while rendering one frame."""

    batches: int = 0
    completed: int = 0
    resumed: int = 0       # skipped: restored from checkpoint
    errors: int = 0        # device-call exceptions observed
    retried: int = 0       # batches that succeeded only after re-dispatch
    failed: int = 0        # batches abandoned after all retries

    @property
    def ok(self) -> bool:
        return self.failed == 0


def _grid(width, height):
    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    return xx.reshape(-1).astype(np.int32), yy.reshape(-1).astype(np.int32)


def render_frame_elastic(params, cam, width: int, height: int,
                         algo: str = "pathtracing", spp: int = 1,
                         pixel_sampler: str = "jittered_blend",
                         frame_num: int = 1, nee: bool = False,
                         batch: int = 1 << 16, retries: int = 2,
                         checkpoint_path: Optional[str] = None,
                         checkpoint_every: int = 4,
                         fault_hook: Optional[Callable[[int, int], None]]
                         = None):
    """Render one frame with per-batch re-dispatch and optional resume.

    Returns (color (H, W, 4) numpy, ElasticReport).  Deterministic: the
    counter-based sampler keys on absolute pixel ids, so retried /
    resumed batches produce bit-identical pixels (tested).
    """
    from visionaray_tpu.sched.render import render_pixels

    x, y = _grid(width, height)
    n = x.shape[0]
    nb = -(-n // batch)
    npad = nb * batch
    xp = np.pad(x, (0, npad - n))
    yp = np.pad(y, (0, npad - n))

    def make_fn():
        return jax.jit(lambda tx, ty, f: render_pixels(
            params, cam, tx, ty, width, height, algo, spp, pixel_sampler,
            f, nee=nee)[0])

    fn = make_fn()
    out = np.zeros((npad, 4), np.float32)
    done = np.zeros((nb,), bool)
    report = ElasticReport(batches=nb)

    # resume: restore completed batches from a previous run
    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = np.load(checkpoint_path)
        if (int(ck["width"]) == width and int(ck["height"]) == height
                and int(ck["batch"]) == batch
                and int(ck["frame_num"]) == int(frame_num)):
            done = ck["done"].copy()
            out = ck["color"].copy()
            report.resumed = int(done.sum())

    def save_ck():
        if not checkpoint_path:
            return
        np.savez(checkpoint_path, width=width, height=height, batch=batch,
                 frame_num=int(frame_num), done=done, color=out)

    frame = jnp.uint32(int(frame_num))
    since_ck = 0
    for b in range(nb):
        if done[b]:
            continue
        tx = jnp.asarray(xp[b * batch:(b + 1) * batch])
        ty = jnp.asarray(yp[b * batch:(b + 1) * batch])
        ok = False
        for attempt in range(retries + 1):
            try:
                if fault_hook is not None:
                    fault_hook(b, attempt)
                color = fn(tx, ty, frame)
                out[b * batch:(b + 1) * batch] = np.asarray(
                    jax.block_until_ready(color))
                ok = True
                break
            except KeyboardInterrupt:
                save_ck()
                raise
            except Exception:
                report.errors += 1
                fn = make_fn()        # fresh executable for the re-dispatch
        if ok:
            done[b] = True
            report.completed += 1
            if attempt > 0:
                report.retried += 1
            since_ck += 1
            if since_ck >= checkpoint_every:
                save_ck()
                since_ck = 0
        else:
            report.failed += 1
    save_ck()
    img = out[:n].reshape(height, width, 4)
    return img, report
