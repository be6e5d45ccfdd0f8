"""Iterative path tracing kernel with lane masks.

Behavioral parity with reference detail/pathtracing.inl:24-132:
  - throughput dst starts at 1; bounce loop over num_bounces
  - rays that exit multiply the ambient color (environment) and retire
  - emissive surfaces multiply ce*ls and retire
  - otherwise: sample BSDF, dst *= f * dot(n, wi) / pdf; zero-pdf kills path
  - rays still active after the loop contribute 0
  - two-sided shading normal via faceforward
  - next ray: origin = isect_pos + wi * epsilon

XLA note: the bounce loop is a lax.fori_loop so the (expensive-to-compile)
BVH traversal is compiled once, not once per bounce.

This is the differentiable target: all material/light/vertex leaves receive
gradients through the shading math (detached-pdf sampling; the traversal
itself differentiates by recompute, ops/traversal.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from visionaray_tpu.core.types import Ray, ResultRecord
from visionaray_tpu.core.vecmath import faceforward
from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.ops.sampling import Sampler
from visionaray_tpu.ops.trace import closest_hit
from visionaray_tpu.shading.surface import get_surface


def pathtracing_kernel(params: KernelParams, ray: Ray,
                       sampler: Sampler) -> ResultRecord:
    scene = params.scene
    eps = params.epsilon
    amb3 = params.ambient_color[:3]
    batch = ray.batch_shape

    def bounce_body(bounce, carry):
        ray, sampler, active, dst, first_hit, first_t = carry
        hit_rec = closest_hit(ray, scene)

        exited = active & ~hit_rec.hit
        dst = jnp.where(exited[..., None], dst * amb3, dst)
        active = active & hit_rec.hit

        is_first = bounce == 0
        first_hit = jnp.where(is_first, hit_rec.hit, first_hit)
        first_t = jnp.where(is_first, hit_rec.t, first_t)

        surf = get_surface(hit_rec, ray, scene)
        view_dir = -ray.dir
        n = faceforward(surf.shading_normal, view_dir, surf.geometric_normal)

        (u_lobe, u1, u2), sampler = sampler.next_n(3)
        src, refl_dir, pdf = surf.materials.sample(n, view_dir, u_lobe, u1, u2)

        zero_pdf = pdf <= 0.0
        emissive = surf.materials.is_emissive()

        # src *= dot(n, wi)/pdf for non-emissive (pathtracing.inl:97)
        safe_pdf = jnp.where(zero_pdf, 1.0, pdf)
        ndotwi = jnp.sum(n * refl_dir, axis=-1)
        weight = jnp.where(emissive, 1.0, ndotwi / safe_pdf)
        src = src * weight[..., None]

        upd = active & ~zero_pdf
        dst = jnp.where(upd[..., None], dst * src, dst)
        dst = jnp.where((zero_pdf & active)[..., None], 0.0, dst)

        active = active & ~emissive & ~zero_pdf

        isect_pos = ray.at(jnp.where(hit_rec.hit, hit_rec.t, 1.0))
        ray = Ray(ori=isect_pos + refl_dir * eps, dir=refl_dir)
        return (ray, sampler, active, dst, first_hit, first_t)

    init = (ray, sampler,
            jnp.ones(batch, jnp.bool_),
            jnp.ones(batch + (3,), jnp.float32),
            jnp.zeros(batch, jnp.bool_),
            jnp.zeros(batch, jnp.float32))
    _, _, active, dst, first_hit, first_t = jax.lax.fori_loop(
        0, params.num_bounces, bounce_body, init)

    # Paths still alive at loop end are terminated to black (pathtracing.inl:115)
    dst = jnp.where(active[..., None], 0.0, dst)

    rgba = jnp.concatenate([dst, jnp.ones_like(dst[..., :1])], axis=-1)
    color = jnp.where(first_hit[..., None], rgba, params.bg_color)
    return ResultRecord(color=color, hit=first_hit, depth=first_t)
