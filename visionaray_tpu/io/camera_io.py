"""Camera save/load to a small text file (viewer.cpp:690-712 'u'/'v' keys).

Format (whitespace separated, one value per token):
    eye.x eye.y eye.z
    center.x center.y center.z
    up.x up.y up.z
    fovy aspect z_near z_far
"""

from __future__ import annotations

import numpy as np

from visionaray_tpu.core.camera import Pinhole


def save_camera(path: str, cam: Pinhole):
    vals = np.concatenate([
        np.asarray(cam.eye, np.float64).ravel(),
        np.asarray(cam.center, np.float64).ravel(),
        np.asarray(cam.up, np.float64).ravel(),
        [float(cam.fovy), float(cam.aspect),
         float(cam.z_near), float(cam.z_far)],
    ])
    with open(path, "w") as f:
        f.write(" ".join(repr(float(v)) for v in vals) + "\n")


def load_camera(path: str) -> Pinhole:
    with open(path) as f:
        vals = [float(t) for t in f.read().split()]
    assert len(vals) >= 13, f"bad camera file: {path}"
    return Pinhole.create(
        eye=vals[0:3], center=vals[3:6], up=vals[6:9], fovy=vals[9],
        aspect=vals[10], z_near=vals[11], z_far=vals[12])
