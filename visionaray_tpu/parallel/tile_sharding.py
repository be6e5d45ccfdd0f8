"""Tile sharding: data-parallel rendering over a TPU device mesh.

The reference's only scaling axis is image tiles over a thread pool
(detail/tiled_sched.inl:175-224, atomic work stealing).  The TPU-native
equivalent is SPMD: the flat pixel array is sharded over a 1-D device mesh
('tiles' axis) with the scene/BVH replicated; `shard_map` runs the same
batched kernel per shard.  There is no work stealing — tiles are statically
partitioned, and the counter-based RNG (ops/sampling.py) makes the result
bit-identical to the single-device render for any mesh size.

Gradient reduction: differentiating through shard_map automatically inserts
the `psum` over the 'tiles' axis for replicated scene parameters (the
all-reduce the reference never had; SURVEY.md §2.3), and XLA's latency-hiding
scheduler overlaps it with the backward sweep.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.sched.render import render_pixels

TILE_AXIS = "tiles"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the tile axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (TILE_AXIS,))


def pad_to_multiple(x, m: int, axis: int = 0):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def render_image_sharded(params: KernelParams, cam, width: int, height: int,
                         mesh: Mesh, algo: str = "pathtracing", spp: int = 1,
                         pixel_sampler: str = "jittered_blend",
                         frame_num=1, seed: int = 0, nee: bool = False,
                         tile_size: int = 0):
    """Render a full frame with pixels sharded over the mesh.

    Returns (color (H,W,4), depth (H,W)).  Scene/BVH replicated (<= HBM);
    geometry sharding for scenes beyond HBM lives in parallel/ring.py.
    ``nee``/``tile_size``: the flagship-config knobs (next-event estimation
    and per-device lax.map sub-tiling to bound live memory) — plumbed to
    render_pixels exactly as the single-device path does.
    """
    n_dev = mesh.devices.size
    x = jnp.arange(width, dtype=jnp.int32)
    y = jnp.arange(height, dtype=jnp.int32)
    xx, yy = jnp.meshgrid(x, y)
    chunk = n_dev * tile_size if tile_size else n_dev
    xf = pad_to_multiple(xx.reshape(-1), chunk)
    yf = pad_to_multiple(yy.reshape(-1), chunk)

    def shard_fn(p, c, xs, ys, fn):
        if tile_size and xs.shape[0] > tile_size:
            nt = xs.shape[0] // tile_size

            def tile_fn(args):
                tx, ty = args
                return render_pixels(p, c, tx, ty, width, height, algo,
                                     spp, pixel_sampler, fn, seed, nee=nee)

            col, dep = jax.lax.map(
                tile_fn, (xs.reshape(nt, tile_size),
                          ys.reshape(nt, tile_size)))
            return col.reshape(-1, 4), dep.reshape(-1)
        col, dep = render_pixels(p, c, xs, ys, width, height,
                                 algo, spp, pixel_sampler, fn, seed,
                                 nee=nee)
        return col, dep

    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(TILE_AXIS), P(TILE_AXIS), P()),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS)),
        # loop carries legitimately go replicated->varying (e.g. the shared
        # camera origin becomes a per-shard bounce origin); disable the VMA
        # type check — numerical equality with the single-device render is
        # asserted in tests/test_sharding.py instead
        check_vma=False,
    )
    color, depth = sharded(params, cam, xf, yf,
                           jnp.asarray(frame_num, jnp.uint32))
    n = width * height
    return (color[:n].reshape(height, width, 4),
            depth[:n].reshape(height, width))
