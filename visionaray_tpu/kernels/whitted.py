"""Whitted recursive ray tracing (iterative), with shadows and specular bounces.

Behavioral parity with reference detail/whitted.inl:221-331:
  - bounce loop <= num_bounces with lane masks (while any(hit && tp>eps))
  - per light: shadow ray offset by epsilon, any_hit(max_t = dist to light)
  - per-bounce color += (ambient + sum_lights shade) * throughput
  - specular bounce dir = reflect(view_dir, shading_normal) (NOT two-sided n),
    throughput *= kr (kr per material type: matte 0, mirror kr, else 0.1)
  - no_hit_color = bg for the first segment, 0 afterwards

XLA note: the bounce loop is a lax.fori_loop so the traversal program is
compiled once per query kind (closest/any), not once per bounce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from visionaray_tpu.core.types import FLT_MAX, Ray, ResultRecord
from visionaray_tpu.core.vecmath import faceforward, length, normalize
from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.ops.trace import any_hit, closest_hit
from visionaray_tpu.shading.lights import light_groups
from visionaray_tpu.shading.surface import get_surface


def whitted_kernel(params: KernelParams, ray: Ray, sampler=None) -> ResultRecord:
    scene = params.scene
    eps = params.epsilon
    bg3 = params.bg_color[:3]
    batch = ray.batch_shape

    hit_rec0 = closest_hit(ray, scene, hit_filter=params.hit_filter)
    first_hit = hit_rec0.hit
    first_t = hit_rec0.t

    def bounce_body(depth, carry):
        ray, hit_rec, color, throughput, active, no_hit_scale = carry
        live = active & (throughput > eps)
        isect_pos = ray.at(jnp.where(hit_rec.hit, hit_rec.t, 1.0))
        surf = get_surface(hit_rec, ray, scene)
        view_dir = -ray.dir
        n = faceforward(surf.shading_normal, view_dir, surf.geometric_normal)

        ambient = surf.materials.ambient() * params.ambient_color[:3]
        shaded = jnp.where(hit_rec.hit[..., None], ambient,
                           jnp.broadcast_to(bg3, ambient.shape))

        for lights in light_groups(scene.lights):
            for li in range(lights.num_lights):
                to_light = lights.position[li] - isect_pos
                light_dir = normalize(to_light)
                shadow_ray = Ray(ori=isect_pos + light_dir * eps,
                                 dir=light_dir)
                # only lanes that actually shade fire a shadow ray
                # (max_t = -1 drops the rest from the kernel tiles)
                fire = live & hit_rec.hit
                shadow_rec = any_hit(shadow_ray, scene,
                                     max_t=jnp.where(fire,
                                                     length(to_light), -1.0),
                                     hit_filter=params.hit_filter)
                lit = fire & ~shadow_rec.hit
                intensity = lights.intensity(li, isect_pos)
                clr = surf.materials.shade(n, view_dir, light_dir, intensity)
                shaded = shaded + jnp.where(lit[..., None], clr, 0.0)

        no_hit_color = no_hit_scale[..., None] * bg3
        seg = jnp.where(hit_rec.hit[..., None], shaded, no_hit_color)
        color = color + jnp.where(live[..., None],
                                  seg * throughput[..., None], 0.0)

        refl_dir, kr = surf.materials.specular_bounce(
            view_dir, surf.shading_normal)
        ray = Ray(ori=isect_pos + refl_dir * eps, dir=refl_dir)
        throughput = jnp.where(live, throughput * kr, throughput)
        # only lanes whose reflection still carries weight trace on
        cont = live & (throughput > eps)
        next_rec = closest_hit(ray, scene,
                               max_t=jnp.where(cont, FLT_MAX, -1.0),
                               hit_filter=params.hit_filter)
        active = live & next_rec.hit
        return (ray, next_rec, color, throughput, active,
                jnp.zeros_like(no_hit_scale))

    init = (ray, hit_rec0,
            jnp.zeros(batch + (3,), jnp.float32),
            jnp.ones(batch, jnp.float32),
            first_hit,
            jnp.ones(batch, jnp.float32))
    _, _, color, _, _, _ = jax.lax.fori_loop(
        0, params.num_bounces, bounce_body, init)

    rgba = jnp.concatenate([color, jnp.ones_like(color[..., :1])], axis=-1)
    out = jnp.where(first_hit[..., None], rgba, params.bg_color)
    return ResultRecord(color=out, hit=first_hit, depth=first_t)
