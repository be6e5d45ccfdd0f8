#!/usr/bin/env python
"""Minimal library usage — the reference's 'API contract' path
(examples/minimal/main.cpp and SURVEY §3.5: camera, render target,
scheduler, params, kernel).

Here the same five objects appear functionally: a Pinhole, a RenderTarget,
the scheduler inside `render()`, KernelParams, and a *custom kernel* — a
lambda returning white where the ray hits, registered under a name.
"""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp
import numpy as np

from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.scene import Scene, TriangleMesh
from visionaray_tpu.core.types import ResultRecord
from visionaray_tpu.io.image import save_png
from visionaray_tpu.ops.trace import closest_hit
from visionaray_tpu.sched.render import KERNELS, render


def white_kernel(params, ray, sampler=None):
    hr = closest_hit(ray, params.scene)
    white = jnp.ones(hr.t.shape + (4,), jnp.float32)
    color = jnp.where(hr.hit[..., None], white, params.bg_color)
    return ResultRecord(color=color, hit=hr.hit, depth=hr.t)


def main():
    KERNELS["white"] = white_kernel

    # one triangle (examples/minimal/main.cpp:20-31 spirit)
    mesh = TriangleMesh.create(
        np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32),
        np.array([[0, 1, 2]], np.int32))
    scene = Scene.create(mesh=mesh)
    cam = Pinhole.create(eye=(0, 0, 3), center=(0, 0, 0),
                         fovy=np.deg2rad(45), aspect=1.0)
    rt = render(scene, cam, 128, 128, algo="white",
                bg_color=(0.1, 0.1, 0.3, 1.0))
    out = save_png("minimal.png", np.asarray(rt.color)[..., :3])
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
