"""Ambient-occlusion kernel (reference examples/ao/main.cpp:183-240).

Per sample: closest hit, then N cosine-distributed occlusion rays with
any_hit(max_t = radius); AO = fraction unoccluded.  Progressive accumulation
happens in the scheduler (jittered_blend), matching the example's usage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from visionaray_tpu.core.types import Ray, ResultRecord
from visionaray_tpu.core.vecmath import faceforward, normalize, orthonormal_basis
from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.ops.sampling import Sampler
from visionaray_tpu.ops.trace import any_hit, closest_hit
from visionaray_tpu.shading.brdf import cosine_sample_hemisphere
from visionaray_tpu.shading.surface import get_surface

AO_SAMPLES = 8
AO_RADIUS_SCALE = 0.1  # fraction of scene diagonal


def ao_kernel(params: KernelParams, ray: Ray, sampler: Sampler) -> ResultRecord:
    scene = params.scene
    eps = params.epsilon
    hit_rec = closest_hit(ray, scene, hit_filter=params.hit_filter)
    surf = get_surface(hit_rec, ray, scene)
    view_dir = -ray.dir
    n = faceforward(surf.shading_normal, view_dir, surf.geometric_normal)
    isect_pos = ray.at(jnp.where(hit_rec.hit, hit_rec.t, 1.0))

    bbox = scene.bbox()
    radius = AO_RADIUS_SCALE * jnp.linalg.norm(bbox.hi - bbox.lo)

    u, v = orthonormal_basis(n)

    def body(i, acc):
        total, samp = acc
        (u1, u2), samp = samp.next_n(2)
        sp = cosine_sample_hemisphere(u1, u2)
        dir = normalize(sp[..., 0:1] * u + sp[..., 1:2] * v
                        + sp[..., 2:3] * n)
        occ_ray = Ray(ori=isect_pos + dir * eps, dir=dir)
        # missed lanes fire no occlusion ray (max_t = -1 drops them from
        # the traversal kernel tiles)
        occ = any_hit(occ_ray, scene,
                      max_t=jnp.where(hit_rec.hit, radius, -1.0),
                      hit_filter=params.hit_filter)
        return total + jnp.where(hit_rec.hit & ~occ.hit, 1.0, 0.0), samp

    total, _ = jax.lax.fori_loop(
        0, AO_SAMPLES, body,
        (jnp.zeros(hit_rec.t.shape, jnp.float32), sampler))
    ao = total / AO_SAMPLES

    c = jnp.repeat(ao[..., None], 3, axis=-1)
    rgba = jnp.concatenate([c, jnp.ones_like(c[..., :1])], axis=-1)
    color = jnp.where(hit_rec.hit[..., None], rgba, params.bg_color)
    return ResultRecord(color=color, hit=hit_rec.hit, depth=hit_rec.t)
