#!/usr/bin/env python
"""Custom intersector hook: alpha-mask transparency
(reference examples/intersector/main.cpp:256-330: a CRTP mask_intersector
whose per-primitive test discards texel-transparent hits in both closest-
and any-hit queries).

Here the hook is a `hit_filter(prim_id, t, u, v, hit) -> hit` callable
passed to closest_hit/any_hit — it samples the alpha texture at the hit's
interpolated UV and kills transparent candidates, so rays see through the
holes to farther geometry.
"""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp
import numpy as np

from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.scene import Planes, Scene, TriangleMesh
from visionaray_tpu.core.types import ResultRecord
from visionaray_tpu.core.vecmath import faceforward, normalize
from visionaray_tpu.io.image import save_png
from visionaray_tpu.ops.trace import closest_hit
from visionaray_tpu.sched.render import KERNELS, render
from visionaray_tpu.shading.lights import PointLights
from visionaray_tpu.shading.materials import Materials
from visionaray_tpu.shading.surface import get_surface


def checker_alpha(u, v, squares=8):
    """Checkerboard alpha mask: half the squares are transparent."""
    iu = jnp.floor(u * squares).astype(jnp.int32)
    iv = jnp.floor(v * squares).astype(jnp.int32)
    return ((iu + iv) % 2) == 0


def make_masked_kernel(scene):
    n_tris = scene.num_triangles

    def hit_filter(prim_id, t, u, v, hit):
        # only the quad's triangles (ids < n_tris) are alpha-masked
        masked = prim_id < n_tris
        opaque = checker_alpha(u, v)
        return hit & (~masked | opaque)

    def kernel(params, ray, sampler=None):
        hr = closest_hit(ray, params.scene, hit_filter=hit_filter)
        surf = get_surface(hr, ray, params.scene)
        view_dir = -ray.dir
        n = faceforward(surf.shading_normal, view_dir, surf.geometric_normal)
        isect = ray.at(jnp.where(hr.hit, hr.t, 1.0))
        lights = params.scene.lights
        shaded = jnp.zeros(hr.t.shape + (3,), jnp.float32)
        for li in range(lights.num_lights):
            ldir = normalize(lights.position[li] - isect)
            inten = lights.intensity(li, isect)
            shaded += surf.materials.shade(n, view_dir, ldir, inten)
        rgba = jnp.concatenate([shaded, jnp.ones_like(shaded[..., :1])], -1)
        color = jnp.where(hr.hit[..., None], rgba, params.bg_color)
        return ResultRecord(color=color, hit=hr.hit, depth=hr.t)

    return kernel


def main():
    verts = np.array([[-1.5, 0.1, 0], [1.5, 0.1, 0], [1.5, 2.5, 0],
                      [-1.5, 2.5, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh = TriangleMesh.create(verts, faces, geom_ids=[0, 0])
    planes = Planes.create(normal=[[0, 1, 0]], offset=[0.0], geom_ids=[1])
    mats = Materials.concatenate([
        Materials.plastic(cd=(0.8, 0.3, 0.2)),
        Materials.matte(cd=(0.5, 0.55, 0.6)),
    ])
    scene = Scene.create(mesh=mesh, planes=planes, materials=mats,
                         lights=PointLights.create(position=[[3, 5, 4]]))
    KERNELS["alpha_masked"] = make_masked_kernel(scene)
    cam = Pinhole.create(eye=(0.5, 1.8, 5.0), center=(0, 1.2, 0),
                         fovy=np.deg2rad(45), aspect=1.0)
    rt = render(scene, cam, 256, 256, algo="alpha_masked",
                bg_color=(0.3, 0.5, 0.8, 1.0))
    print("wrote", save_png("intersector.png",
                            np.asarray(rt.color)[..., :3]))


if __name__ == "__main__":
    main()
