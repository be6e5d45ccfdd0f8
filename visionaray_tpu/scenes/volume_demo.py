"""Procedural volume scene (reference examples/volume/main.cpp:69-107).

The reference example fills a 256^3 volume with a distance-like analytic
field and classifies it through an RGBA transfer function; with no assets
in tree, the same idea here: a smooth shell-plus-core density sampled on a
grid, and a blue-to-orange transfer ramp.
"""

from __future__ import annotations

import numpy as np

from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.scene import Scene
from visionaray_tpu.kernels.volume import Volumes


def volume_scene(resolution: int = 64):
    """Returns (scene, camera) with one AABB-bounded procedural volume."""
    n = resolution
    ax = (np.arange(n, dtype=np.float32) + 0.5) / n * 2.0 - 1.0
    z, y, x = np.meshgrid(ax, ax, ax, indexing="ij")
    r = np.sqrt(x * x + y * y + z * z)
    # a soft shell at r=0.7 plus a dense core, twisted by an angular ripple
    shell = np.exp(-((r - 0.7) / 0.12) ** 2)
    core = np.exp(-((r - 0.15) / 0.2) ** 2)
    ripple = 0.5 + 0.5 * np.sin(6.0 * np.arctan2(y, x)) * np.cos(5.0 * z)
    field = np.clip(0.8 * shell * ripple + core, 0.0, 1.0)

    t = np.linspace(0.0, 1.0, 64, dtype=np.float32)
    transfer = np.stack([
        0.2 + 0.8 * t,                    # R ramps up
        0.1 + 0.5 * np.sin(np.pi * t),    # G peaks mid-range
        0.9 - 0.8 * t,                    # B ramps down
        np.where(t < 0.05, 0.0, t ** 1.5),  # opacity gated at low density
    ], axis=-1)

    vols = Volumes.create(
        lo=[[-1.0, -1.0, -1.0]], hi=[[1.0, 1.0, 1.0]],
        texels=field[None], transfer=transfer[None])
    scene = Scene.create(volumes=vols)
    cam = Pinhole.create(eye=(2.2, 1.6, 2.4), center=(0.0, 0.0, 0.0),
                         up=(0.0, 1.0, 0.0), fovy=np.deg2rad(45.0),
                         aspect=1.0)
    return scene, cam
