"""Volume ray-marching kernel (reference examples/volume/main.cpp, and the
multi-volume variant examples/multi_volume/main.cpp:376-690).

Each volume is an AABB-bounded 3D scalar field sampled through a trilinear
fetch with a 1D post-classification transfer function, composited
front-to-back:

    while t < tfar:  s = tex3D(vol, p); c = transfer(s)
                     dst += (1 - dst.a) * c;  t += dt

Multi-volume (V > 1): the reference renders each volume separately and
depth-composites the results by bounding-box order
(multi_volume/main.cpp:376-690).  Here every ray sorts its V entry
distances and marches the volumes in per-ray nearest-first order — the
same compositing order, without the per-volume framebuffer passes.  The
rank loop is a ``lax.scan`` whose body gathers the per-lane volume id, so
compile time is V-independent (one march body total; previously a Python
loop inlined V copies of a 512-step march).

All volumes share one stacked texel array (V, D, H, W) and transfer table
(V, T, 4); the per-lane volume index rides the gathers.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from visionaray_tpu.core.types import Ray, ResultRecord, pytree_dataclass
from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.ops.intersect import intersect_aabb

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
        texels = jnp.asarray(texels, jnp.float32)
        transfer = jnp.asarray(transfer, jnp.float32)
        if texels.ndim == 3:
            texels = texels[None]
        if transfer.ndim == 2:
            transfer = transfer[None]
        return Volumes(
            lo=jnp.asarray(lo, jnp.float32).reshape(-1, 3),
            hi=jnp.asarray(hi, jnp.float32).reshape(-1, 3),
            texels=texels,
            transfer=transfer,
        )

    @property
    def num_volumes(self):
        return self.lo.shape[0]


def _tex3d_multi(texels, vi, u, v, w):
    """Trilinear fetch of (V, D, H, W) texels with a PER-LANE volume index
    ``vi`` — tex3D(CLAMP, LINEAR) with the volume id riding the gather, so
    a batch of rays can sample different volumes in one call."""
    V, D, H, W = texels.shape
    x = u * W - 0.5
    y = v * H - 0.5
    z = w * D - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    fz = z - z0
    flat = texels.reshape(-1)

    def fetch(xi, yi, zi):
        xi = jnp.clip(xi, 0, W - 1)
        yi = jnp.clip(yi, 0, H - 1)
        zi = jnp.clip(zi, 0, D - 1)
        return jnp.take(flat, ((vi * D + zi) * H + yi) * W + xi)

    out = 0.0
    for dz in (0, 1):
        wz = (1 - fz) if dz == 0 else fz
        for dy in (0, 1):
            wy = (1 - fy) if dy == 0 else fy
            for dx in (0, 1):
                wx = (1 - fx) if dx == 0 else fx
                out = out + wz * wy * wx * fetch(x0 + dx, y0 + dy, z0 + dz)
    return out


def _tex1d_multi(transfer, vi, u):
    """Linear fetch of (V, T, C) transfer tables with per-lane volume id."""
    V, T, C = transfer.shape
    x = u * T - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    fx = (x - x0)[..., None]
    flat = transfer.reshape(-1, C)

    def fetch(xi):
        xi = jnp.clip(xi, 0, T - 1)
        return jnp.take(flat, vi * T + xi, axis=0)

    return (1 - fx) * fetch(x0) + fx * fetch(x0 + 1)


def volume_kernel(params: KernelParams, ray: Ray, sampler=None,
                  volumes: Volumes = None, step_scale: float = 1.0
                  ) -> ResultRecord:
    """March all volumes front-to-back in per-ray depth order.  ``volumes``
    defaults to ``params.scene.volumes`` (the scheduler registry path); an
    explicit arg wins."""
    vols = volumes if volumes is not None else params.scene.volumes
    assert vols is not None, \
        "volume_kernel needs a Volumes instance (scene.volumes or arg)"
    V = vols.num_volumes
    batch = ray.batch_shape
    dst0 = jnp.zeros(batch + (4,), jnp.float32)
    inv_d = 1.0 / ray.dir

    # entry/exit of every volume: (V,) + batch
    tn_all, tf_all, hit_all = jax.vmap(
        lambda lo, hi: intersect_aabb(ray.ori, inv_d, lo, hi))(
            vols.lo, vols.hi)
    tn_all = jnp.maximum(tn_all, 0.0)
    hit_all = hit_all & (tf_all >= tn_all)

    any_hit = jnp.any(hit_all, axis=0)
    depth = jnp.min(jnp.where(hit_all, tn_all, jnp.inf), axis=0)
    depth = jnp.where(any_hit, depth, 0.0)

    # per-ray nearest-first volume order (the reference's bounding-box
    # compositing order, resolved per ray instead of per frame)
    order = jnp.argsort(jnp.where(hit_all, tn_all, jnp.inf),
                        axis=0).astype(jnp.int32)

    D3 = jnp.asarray(vols.texels.shape[1:4], jnp.float32)

    def rank_body(dst, r):
        vi = jnp.take(order, r, axis=0)                    # (batch,) i32
        take_v = lambda a: jnp.take(a, vi, axis=0)
        lo = take_v(vols.lo)
        hi = take_v(vols.hi)
        tn = jnp.take_along_axis(tn_all, vi[None], axis=0)[0]
        tf = jnp.take_along_axis(tf_all, vi[None], axis=0)[0]
        inv = jnp.take_along_axis(hit_all, vi[None], axis=0)[0]
        extent = hi - lo
        # step: half a voxel of the smallest axis (reference uses a fixed
        # world step; voxel-relative keeps quality resolution-independent)
        dt = step_scale * jnp.min(extent / D3, axis=-1)

        def body(i, dst):
            t = tn + dt * i
            live = inv & (t < tf) & (dst[..., 3] < 0.999)
            p = ray.at(t)
            uvw = (p - lo) / extent
            s = _tex3d_multi(vols.texels, vi,
                             uvw[..., 0], uvw[..., 1], uvw[..., 2])
            c = _tex1d_multi(vols.transfer, vi, s)
            # opacity correction for step size then front-to-back composite
            a = jnp.clip(c[..., 3] * dt * D3[0], 0.0, 1.0)
            contrib = jnp.concatenate(
                [c[..., :3] * a[..., None], a[..., None]], axis=-1)
            new_dst = dst + (1.0 - dst[..., 3:4]) * contrib
            return jnp.where(live[..., None], new_dst, dst)

        dst = jax.lax.fori_loop(0, MAX_STEPS, body, dst)
        return dst, None

    dst, _ = jax.lax.scan(rank_body, dst0, jnp.arange(V, dtype=jnp.int32))

    bg = params.bg_color
    color = dst + (1.0 - dst[..., 3:4]) * bg
    return ResultRecord(color=color, hit=any_hit, depth=depth)
