"""Simple kernel: one closest-hit + per-light direct shading, no shadows.

Behavioral parity with reference detail/simple.inl:20-83:
  - closest_hit
  - ambient = material.ambient() * ambient_color
  - two-sided shading: n = faceforward(shading_n, view_dir, geometric_n)
  - per light: shade with light_dir to light position, accumulate
  - color = hit ? rgba(shaded) : bg
"""

from __future__ import annotations

import jax.numpy as jnp

from visionaray_tpu.core.types import Ray, ResultRecord
from visionaray_tpu.core.vecmath import faceforward, normalize
from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.ops.trace import closest_hit
from visionaray_tpu.shading.lights import light_groups
from visionaray_tpu.shading.surface import get_surface


def simple_kernel(params: KernelParams, ray: Ray, sampler=None) -> ResultRecord:
    scene = params.scene
    hit_rec = closest_hit(ray, scene, hit_filter=params.hit_filter)
    isect_pos = ray.at(jnp.where(hit_rec.hit, hit_rec.t, 1.0))

    surf = get_surface(hit_rec, ray, scene)
    ambient = surf.materials.ambient() * params.ambient_color[:3]
    bg3 = params.bg_color[:3]
    shaded = jnp.where(hit_rec.hit[..., None], ambient,
                       jnp.broadcast_to(bg3, ambient.shape))

    view_dir = -ray.dir
    n = faceforward(surf.shading_normal, view_dir, surf.geometric_normal)

    for lights in light_groups(scene.lights):
        for li in range(lights.num_lights):
            light_dir = normalize(lights.position[li] - isect_pos)
            intensity = lights.intensity(li, isect_pos)
            clr = surf.materials.shade(n, view_dir, light_dir, intensity)
            shaded = shaded + jnp.where(hit_rec.hit[..., None], clr, 0.0)

    rgba = jnp.concatenate([shaded, jnp.ones_like(shaded[..., :1])], axis=-1)
    color = jnp.where(hit_rec.hit[..., None], rgba, params.bg_color)
    return ResultRecord(color=color, hit=hit_rec.hit, depth=hit_rec.t)
