"""Schedulers, pixel samplers, render targets — the frame-rendering front end.

The reference's scheduler family (simple serial loop, tiled thread pool, CUDA
grid; scheduler.h, detail/*_sched.*) becomes:

- ``simple``: the whole ray batch in one fused XLA program (the batched
  kernels *are* the packet loop; XLA supplies the lanes).
- ``tiled``: ``lax.map`` over ray tiles to bound live memory — the analogue
  of the 16x16-tile thread-pool scheduler (tiled_sched.inl:24-25), except
  tiles are scheduled statically (SPMD) instead of by an atomic counter.
- ``sharded``: shard_map over a device mesh (visionaray has no multi-device
  axis; see parallel/).

Pixel samplers (detail/sched_common.h:40-52): uniform (pixel center),
ssaa<N>, jittered, jittered_blend (progressive accumulation with
alpha = 1/frame_num; sched_common.h:515-529).

Pixel convention: image arrays are (H, W, 4) with row 0 = BOTTOM scanline
(the reference's GL render targets are bottom-up); io.image flips on save.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from visionaray_tpu.core.types import pytree_dataclass, replace
from visionaray_tpu.kernels.ao import ao_kernel
from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.kernels.pathtracing import pathtracing_kernel
from visionaray_tpu.kernels.simple import simple_kernel
from visionaray_tpu.kernels.volume import volume_kernel
from visionaray_tpu.kernels.whitted import whitted_kernel
from visionaray_tpu.ops.sampling import Sampler, pcg_hash

KERNELS = {
    "simple": simple_kernel,
    "whitted": whitted_kernel,
    "pathtracing": pathtracing_kernel,
    "ao": ao_kernel,
    "volume": volume_kernel,
}

# SSAA sample offset tables (reference detail/sched_common.h:222-295).
SSAA_OFFSETS = {
    1: [(0.0, 0.0)],
    2: [(-0.25, -0.25), (0.25, 0.25)],
    4: [(-0.125, -0.375), (0.375, -0.125), (0.125, 0.375), (-0.375, 0.125)],
    8: [(-0.4375, 0.0625), (-0.3125, -0.1875), (-0.1875, 0.3125),
        (-0.0625, -0.4375), (0.0625, 0.4375), (0.1875, -0.3125),
        (0.3125, 0.1875), (0.4375, -0.0625)],
}


def _ssaa_offsets(spp: int):
    """Offset table for any spp: reference tables for 1/2/4/8 (the only
    widths the reference instantiates, sched_common.h:222-295); a rotated
    low-discrepancy (i/N, radical-inverse-2) lattice otherwise — previously
    spp not in {1,2,4,8} silently rendered every sample at the pixel
    center."""
    if spp in SSAA_OFFSETS:
        return SSAA_OFFSETS[spp]

    def rad2(i: int) -> float:
        x, f = 0.0, 0.5
        while i:
            x += f * (i & 1)
            i >>= 1
            f *= 0.5
        return x

    return [((i + 0.5) / spp - 0.5, rad2(i) - 0.5) for i in range(spp)]


@pytree_dataclass(static=("width", "height"))
class RenderTarget:
    """Device-resident color+depth frame buffer (cpu_buffer_rt analogue;
    reference render_target.h:44-90, cpu_buffer_rt.h:18)."""

    color: Any   # (H, W, 4) f32 linear RGBA
    depth: Any   # (H, W) f32
    width: int
    height: int

    @staticmethod
    def create(width: int, height: int) -> "RenderTarget":
        return RenderTarget(
            color=jnp.zeros((height, width, 4), jnp.float32),
            depth=jnp.zeros((height, width), jnp.float32),
            width=width, height=height,
        )


@pytree_dataclass(static=("algo", "spp", "pixel_sampler", "tile_size"))
class SchedParams:
    """make_sched_params analogue (scheduler.h:164-242)."""

    algo: str = "simple"
    spp: int = 1
    pixel_sampler: str = "uniform"   # uniform | ssaa | jittered | jittered_blend
    tile_size: int = 0               # 0 = whole frame in one program


def _pixel_grid(width, height):
    x = jnp.arange(width, dtype=jnp.int32)
    y = jnp.arange(height, dtype=jnp.int32)
    xx, yy = jnp.meshgrid(x, y)          # (H, W)
    return xx.reshape(-1), yy.reshape(-1)


def render_pixels(params: KernelParams, cam, x, y, width, height,
                  algo: str, spp: int, pixel_sampler: str,
                  frame_num, seed: int = 0, nee: bool = False):
    """Render a flat batch of pixels; returns (color (N,4), depth (N,)).

    The spp loop is a lax.fori_loop so the (expensive-to-compile) kernel
    body is compiled exactly once regardless of sample count.
    """
    kernel = KERNELS[algo]
    pixel_id = (y.astype(jnp.uint32) * np.uint32(width) + x.astype(jnp.uint32))
    ssaa_table = jnp.asarray(_ssaa_offsets(spp), jnp.float32)

    def sample_body(s, acc):
        color, depth = acc
        # decorrelate samples within a frame by folding the sample index
        stream = pcg_hash(jnp.uint32(seed)
                          + s.astype(jnp.uint32) * np.uint32(0x85EBCA6B))
        samp = Sampler.seed(0, pixel_id ^ stream,
                            jnp.asarray(frame_num, jnp.uint32))
        if pixel_sampler in ("jittered", "jittered_blend"):
            (jx, jy), samp = samp.next_n(2)
            jitter = jnp.stack([jx - 0.5, jy - 0.5], axis=-1)
        elif pixel_sampler == "ssaa":
            jitter = jnp.broadcast_to(ssaa_table[s], x.shape + (2,))
        else:
            jitter = None
        ray = cam.primary_rays(x, y, width, height, jitter)
        if algo == "pathtracing":
            rec = kernel(params, ray, samp, nee=nee)
        else:
            rec = kernel(params, ray, samp)
        return (color + rec.color,
                depth + jnp.where(rec.hit, rec.depth, 0.0))

    init = (jnp.zeros(x.shape + (4,), jnp.float32),
            jnp.zeros(x.shape, jnp.float32))
    if spp == 1:
        color, depth = sample_body(jnp.int32(0), init)
    else:
        color, depth = jax.lax.fori_loop(0, spp, sample_body, init)
    return color / spp, depth / spp


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "algo", "spp", "pixel_sampler",
                     "tile_size", "nee"))
def _render_frame(params: KernelParams, cam, width: int, height: int,
                  algo: str, spp: int, pixel_sampler: str, tile_size: int,
                  frame_num, seed: int = 0, nee: bool = False):
    x, y = _pixel_grid(width, height)
    if tile_size and x.shape[0] > tile_size:
        n = x.shape[0]
        n_tiles = -(-n // tile_size)
        pad = n_tiles * tile_size - n
        xp = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]) if pad else x
        yp = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)]) if pad else y
        xt = xp.reshape(n_tiles, tile_size)
        yt = yp.reshape(n_tiles, tile_size)

        def tile_fn(args):
            tx, ty = args
            return render_pixels(params, cam, tx, ty, width, height,
                                 algo, spp, pixel_sampler, frame_num, seed,
                                 nee=nee)

        color_t, depth_t = jax.lax.map(tile_fn, (xt, yt))
        color = color_t.reshape(-1, 4)[:n]
        depth = depth_t.reshape(-1)[:n]
    else:
        color, depth = render_pixels(params, cam, x, y, width, height,
                                     algo, spp, pixel_sampler, frame_num,
                                     seed, nee=nee)
    return (color.reshape(height, width, 4), depth.reshape(height, width))


def render(scene, cam, width: int, height: int, algo: str = "simple",
           spp: int = 1, bounces: Optional[int] = None,
           epsilon: Optional[float] = None, bg_color=(0.1, 0.4, 1.0, 1.0),
           ambient: Optional[tuple] = None, pixel_sampler: Optional[str] = None,
           frame_num: int = 1, seed: int = 0, tile_size: int = 0,
           rt: Optional[RenderTarget] = None, nee: bool = False,
           spectral: int = 0, hit_filter=None, boundary=None,
           boundary_opts: Optional[dict] = None):
    """Render one frame; the call_kernel analogue (src/common/call_kernel.h).

    Defaults mirror the viewer (viewer.cpp:489-496): bounces 4 (10 for PT),
    ambient 0 (1 for PT), epsilon from scene diagonal; PT uses the
    jittered_blend progressive sampler with alpha = 1/frame_num.

    ``hit_filter``: custom-intersector hook threaded into every kernel's
    closest/any-hit call (the reference's intersector sched plumbing,
    sched_common.h:786-818; alpha-mask transparency,
    examples/intersector/main.cpp:256-330).

    ``spectral`` = N > 0: lift the scene to N-sample SPDs and path trace
    per-wavelength, folding back through the CIE observer for display (the
    VSNRAY_SPECTRUM_RGB toggle, spectrum.h:17; pathtracing only).  Scenes
    whose materials already carry SPD channels (cornell_box_spectral) run
    spectrally without this flag.

    Returns a RenderTarget (pass ``rt`` for progressive accumulation).
    """
    if spectral:
        assert algo == "pathtracing", "spectral mode is a pathtracing mode"
        from visionaray_tpu.shading.spectrum import lift_scene
        scene = lift_scene(scene, spectral)
    if bounces is None:
        bounces = 10 if algo == "pathtracing" else 4
    if ambient is None:
        ambient = (1.0, 1.0, 1.0, 1.0) if algo == "pathtracing" \
            else (0.0, 0.0, 0.0, 0.0)
    if pixel_sampler is None:
        # PT and AO are progressive monte-carlo kernels (the reference AO
        # example also runs jittered_blend, examples/ao/main.cpp:183-240)
        pixel_sampler = ("jittered_blend"
                         if algo in ("pathtracing", "ao") else "uniform")
    if epsilon is None:
        bbox = scene.bbox()
        diag = float(jnp.linalg.norm(bbox.hi - bbox.lo))
        epsilon = max(1e-3, diag * 1e-5)

    params = KernelParams.create(
        scene, num_bounces=bounces, epsilon=epsilon,
        bg_color=bg_color, ambient_color=ambient, hit_filter=hit_filter)

    color, depth = _render_frame(
        params, cam, width, height, algo, spp, pixel_sampler, tile_size,
        jnp.uint32(frame_num), seed, nee=nee)

    if boundary is not None and boundary is not False:
        # silhouette/boundary gradient term (diff/boundary.py): adds a
        # zero-VALUED image whose vjp carries the primary-visibility
        # boundary term, so jax.grad of any loss over this frame sees
        # moving silhouettes.  Pass boundary=True (adjacency built here;
        # requires concrete faces, i.e. an un-jitted call) or a prebuilt
        # EdgeAdjacency for use under jit/grad tracing.
        from visionaray_tpu.diff.boundary import (
            EdgeAdjacency, boundary_image, build_edge_adjacency,
            sphere_boundary_image,
        )
        if scene.mesh is not None:
            adj = boundary if isinstance(boundary, EdgeAdjacency) \
                else build_edge_adjacency(np.asarray(scene.mesh.faces),
                                          np.asarray(scene.mesh.vertices))
            color = color + boundary_image(
                params, cam, width, height, adj, algo=algo, nee=nee,
                frame_num=frame_num, seed=seed, **(boundary_opts or {}))
        if scene.spheres is not None:
            color = color + sphere_boundary_image(
                params, cam, width, height, algo=algo, nee=nee,
                frame_num=frame_num, seed=seed)

    if rt is None:
        return RenderTarget(color=color, depth=depth, width=width, height=height)
    # progressive blend, alpha = 1/frame_num (sched_common.h:515-529)
    alpha = 1.0 / jnp.float32(frame_num)
    from visionaray_tpu.io.pixel_format import (
        TypedRenderTarget, blend_device,
    )
    if isinstance(rt, TypedRenderTarget):
        # quantized device framebuffer: blend through the device-side
        # pixel_access path (detail/pixel_access.h blend into unorm8 —
        # the reference GL targets' arrangement)
        rt2 = blend_device(rt, color, alpha, 1.0 - alpha)
        return replace(rt2,
                       depth=rt.depth * (1.0 - alpha) + depth * alpha)
    return replace(rt,
                   color=rt.color * (1.0 - alpha) + color * alpha,
                   depth=rt.depth * (1.0 - alpha) + depth * alpha)
