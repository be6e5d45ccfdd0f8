"""Volume ray-marching kernel (reference examples/volume/main.cpp, and the
multi-volume variant examples/multi_volume/main.cpp:376-690).

Each volume is an AABB-bounded 3D scalar field sampled through `tex3d`
with a 1D post-classification transfer function, composited front-to-back:

    while t < tfar:  s = tex3D(vol, p); c = transfer(s)
                     dst += (1 - dst.a) * c;  t += dt

The march is a fixed-count fori_loop with masks (lanes exit at tfar or full
opacity) — the wavefront form of the reference's while loop.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from visionaray_tpu.core.types import Ray, ResultRecord, pytree_dataclass
from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.ops.intersect import intersect_aabb
from visionaray_tpu.shading.texture import Filter, tex1d, tex3d

MAX_STEPS = 512


@pytree_dataclass
class Volumes:
    """One or more AABB-bounded scalar volumes with transfer functions."""

    lo: Any        # (V, 3) box lower corners
    hi: Any        # (V, 3)
    texels: Any    # (V, D, H, W) f32 in [0, 1]
    transfer: Any  # (V, T, 4) RGBA transfer function

    @staticmethod
    def create(lo, hi, texels, transfer):
        return Volumes(
            lo=jnp.asarray(lo, jnp.float32).reshape(-1, 3),
            hi=jnp.asarray(hi, jnp.float32).reshape(-1, 3),
            texels=jnp.asarray(texels, jnp.float32),
            transfer=jnp.asarray(transfer, jnp.float32),
        )

    @property
    def num_volumes(self):
        return self.lo.shape[0]


def volume_kernel(params: KernelParams, ray: Ray, sampler=None,
                  volumes: Volumes = None, step_scale: float = 1.0
                  ) -> ResultRecord:
    """March all volumes front-to-back.  ``volumes`` defaults to
    ``params.scene.volumes`` (the scheduler registry path); an explicit arg
    wins."""
    vols = volumes if volumes is not None else params.scene.volumes
    assert vols is not None, \
        "volume_kernel needs a Volumes instance (scene.volumes or arg)"
    batch = ray.batch_shape
    dst = jnp.zeros(batch + (4,), jnp.float32)
    inv_d = 1.0 / ray.dir

    any_hit = jnp.zeros(batch, jnp.bool_)
    depth = jnp.zeros(batch, jnp.float32)

    for vi in range(vols.num_volumes):
        lo = vols.lo[vi]
        hi = vols.hi[vi]
        tn, tf, hit = intersect_aabb(ray.ori, inv_d, lo, hi)
        tn = jnp.maximum(tn, 0.0)
        hit = hit & (tf >= tn)
        any_hit = any_hit | hit
        depth = jnp.where(hit & (depth == 0.0), tn, depth)

        extent = hi - lo
        # step: half a voxel of the smallest axis (reference uses a fixed
        # world step; voxel-relative keeps quality resolution-independent)
        D3 = jnp.asarray(vols.texels.shape[1:4], jnp.float32)
        dt = step_scale * jnp.min(extent / D3)

        def body(i, carry):
            dst, = carry
            t = tn + dt * i
            live = hit & (t < tf) & (dst[..., 3] < 0.999)
            p = ray.at(t)
            uvw = (p - lo) / extent
            s = tex3d(vols.texels[vi], uvw[..., 0], uvw[..., 1], uvw[..., 2],
                      filter=Filter.LINEAR)
            c = tex1d(vols.transfer[vi], s, filter=Filter.LINEAR)
            # opacity correction for step size then front-to-back compositing
            a = jnp.clip(c[..., 3] * dt * D3[0], 0.0, 1.0)
            contrib = jnp.concatenate(
                [c[..., :3] * a[..., None], a[..., None]], axis=-1)
            new_dst = dst + (1.0 - dst[..., 3:4]) * contrib
            return (jnp.where(live[..., None], new_dst, dst),)

        (dst,) = jax.lax.fori_loop(0, MAX_STEPS, body, (dst,))

    bg = params.bg_color
    color = dst + (1.0 - dst[..., 3:4]) * bg
    return ResultRecord(color=color, hit=any_hit, depth=depth)
