"""Timing and per-frame metrics (SURVEY §5 observability).

Replaces the reference's wall-clock timer + 0.5s-window FPS counter
(src/common/timer.h:23-49,106-145) and HUD stats (viewer.cpp:371-469) with
an honest device-fenced timer and a structured metrics dict with JSONL
emission for benchmark mode.
"""

from __future__ import annotations

import json
import time
from typing import Optional


class Timer:
    """Wall-clock timer with explicit device fencing (timer.h:23 analogue).

    Use ``tick(x)`` with a jax array to block_until_ready before reading the
    clock — the TPU equivalent of cudaEventSynchronize (timer.h:52-104).
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()

    def elapsed(self, fence=None) -> float:
        if fence is not None:
            import jax
            jax.block_until_ready(fence)
        return time.perf_counter() - self._t0


class FrameCounter:
    """Sliding-window FPS (frame_counter, timer.h:106-145: 0.5 s window)."""

    def __init__(self, window: float = 0.5):
        self.window = window
        self._frames = []

    def register_frame(self) -> float:
        now = time.perf_counter()
        self._frames.append(now)
        cutoff = now - self.window
        self._frames = [t for t in self._frames if t >= cutoff]
        if len(self._frames) < 2:
            return 0.0
        return (len(self._frames) - 1) / (self._frames[-1] - self._frames[0])


def frame_metrics(width: int, height: int, spp: int, bounces: int,
                  seconds: float, n_prims: int, algo: str,
                  n_devices: int = 1) -> dict:
    """Structured per-frame metric dict (rays/s, per-chip rates)."""
    rays = width * height * spp * (1 if algo == "simple" else bounces)
    return {
        "algo": algo,
        "resolution": [width, height],
        "spp": spp,
        "bounces": bounces,
        "prims": n_prims,
        "frame_ms": seconds * 1e3,
        "mrays_per_s": rays / seconds / 1e6,
        "mrays_per_s_per_chip": rays / seconds / 1e6 / max(n_devices, 1),
        "devices": n_devices,
    }


class MetricsLog:
    """JSONL metrics emitter for benchmark runs."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.records = []

    def emit(self, record: dict):
        self.records.append(record)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")
        return record
