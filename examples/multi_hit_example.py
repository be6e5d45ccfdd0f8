#!/usr/bin/env python
"""Multi-hit transparency compositing (reference examples/multi_hit:
multi_hit<16> + front-to-back blend of all hits along the ray)."""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp
import numpy as np

from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.scene import Scene, TriangleMesh
from visionaray_tpu.core.types import ResultRecord
from visionaray_tpu.io.image import save_png
from visionaray_tpu.ops.trace import multi_hit
from visionaray_tpu.sched.render import KERNELS, render
from visionaray_tpu.shading.materials import Materials

ALPHA = 0.35


def transparency_kernel(params, ray, sampler=None):
    rec = multi_hit(ray, params.scene, k=8)
    # per-hit colors from the material's diffuse color
    cd = jnp.take(params.scene.materials.cd, rec.geom_id, axis=0)
    dst = jnp.zeros(ray.batch_shape + (4,), jnp.float32)
    for k in range(rec.t.shape[-1]):   # hits are sorted near-to-far
        a = jnp.where(rec.hit[..., k], ALPHA, 0.0)[..., None]
        contrib = jnp.concatenate([cd[..., k, :] * a, a], axis=-1)
        dst = dst + (1.0 - dst[..., 3:4]) * contrib
    color = dst + (1.0 - dst[..., 3:4]) * params.bg_color
    any_hit = rec.hit.any(axis=-1)
    return ResultRecord(color=color, hit=any_hit, depth=rec.t[..., 0])


def main():
    KERNELS["transparency"] = transparency_kernel
    verts, faces, gids = [], [], []
    for i, z in enumerate(np.linspace(0.0, 2.0, 5)):
        b = len(verts)
        s = 1.0 - 0.12 * i
        verts += [[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]]
        faces += [[b, b + 1, b + 2], [b, b + 2, b + 3]]
        gids += [i, i]
    mesh = TriangleMesh.create(np.asarray(verts, np.float32),
                               np.asarray(faces, np.int32),
                               geom_ids=np.asarray(gids, np.int32))
    colors = [(0.9, 0.2, 0.2), (0.9, 0.7, 0.1), (0.2, 0.8, 0.3),
              (0.2, 0.5, 0.9), (0.7, 0.3, 0.8)]
    mats = Materials.concatenate([Materials.matte(cd=c) for c in colors])
    scene = Scene.create(mesh=mesh, materials=mats)
    cam = Pinhole.create(eye=(0.8, 0.9, 5.0), center=(0, 0, 1.0),
                         fovy=np.deg2rad(45), aspect=1.0)
    rt = render(scene, cam, 256, 256, algo="transparency",
                bg_color=(0.05, 0.05, 0.1, 1.0))
    print("wrote", save_png("multi_hit.png", np.asarray(rt.color)[..., :3]))


if __name__ == "__main__":
    main()
