"""Path tracing over geometry-sharded scenes — BASELINE config #5.

The reference cannot express this at all (no multi-device axis, SURVEY
§2.3); the capability target is: a scene too large to replicate per chip
(instanced Sponza x16 at 4K) is spatially sharded (parallel/ring.py, ~1/D
HBM per device), the image is tile-sharded over the same mesh axis, and
the FULL path-tracing bounce loop — closest hit, surface shading, NEE
shadow rays, BSDF sampling — runs inside one ``shard_map``:

- closest hit + surface: ``ring_closest_surface_local`` — every hop
  resolves rays against the local sub-BVH and the winning hop gathers
  shading data (normals/uv) from its LOCAL soup; the winner rides the
  ``ppermute`` payload home.  This is the reference's
  closest_hit + get_surface (get_surface.h:541-585) distributed over the
  ring.
- NEE shadow rays: ``ring_any_hit_local`` with per-lane max_t and
  early-occlusion skip per hop.
- materials / lights / textures: replicated (they are KB-scale; geometry
  is the thing that doesn't fit).

The bounce loop is ``kernels.pathtracing.pathtrace_loop`` — the SAME
kernel code as the replicated path, instantiated with a ring tracer
instead of a scene tracer (the reference's one-kernel-many-schedulers
property, SURVEY §3).

Gradients: each hop's closest hit is recompute-differentiable w.r.t. the
LOCAL soup corners (v1/e1/e2) and the surface gather w.r.t. the local
corner normals, so ``jax.grad`` of a loss over the rendered image yields
per-shard soup gradients; map them to the original face order with
``geo.prim_ids``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from visionaray_tpu.core.types import FLT_MAX, Ray
from visionaray_tpu.core.vecmath import normalize
from visionaray_tpu.kernels.pathtracing import pathtrace_loop
from visionaray_tpu.ops.sampling import Sampler, pcg_hash
from visionaray_tpu.parallel.ring import (
    ShardedGeometry, ring_any_hit_local, ring_closest_surface_local,
)
from visionaray_tpu.shading.surface import Surface


def ring_tracer(soup, bvh, shard_lo, shard_hi, backend: str,
                axis_name: str, materials, textures=None,
                interpret: bool = False):
    """(closest, any) pair for ``pathtrace_loop`` over one device's shard.

    Must be called INSIDE shard_map; ``materials``/``textures`` are the
    replicated tables.
    """

    def trace_closest(ray, max_t):
        hr, ns, ng, uv = ring_closest_surface_local(
            ray, soup, bvh, shard_lo, shard_hi, backend, axis_name,
            max_t=max_t, interpret=interpret)
        mats = materials.take(hr.geom_id)
        tex_color = jnp.ones(hr.t.shape + (3,), jnp.float32)
        if textures is not None:
            from visionaray_tpu.shading.texture import sample_scene_texture
            tex_color = sample_scene_texture(textures, hr.geom_id, uv)
            tc = tex_color
            if mats.cd.shape[-1] != 3:   # spectral mode
                from visionaray_tpu.shading.spectrum import from_rgb
                tc = from_rgb(tc, mats.cd.shape[-1])
            # same fold as shading/surface.py: tex modulates diffuse +
            # emissive terms (matte.inl:64,141, plastic.inl:62,182,
            # emissive.inl:89)
            mats = dataclasses.replace(mats, cd=mats.cd * tc,
                                       ce=mats.ce * tc)
        surf = Surface(geometric_normal=ng, shading_normal=normalize(ns),
                       tex_color=tex_color, materials=mats)
        return hr, surf

    def trace_any(ray, max_t):
        return ring_any_hit_local(ray, max_t, soup, bvh, shard_lo,
                                  shard_hi, backend, axis_name,
                                  interpret=interpret)

    return trace_closest, trace_any


def pathtrace_pixels_sharded(geo1, materials, lights, x, y, cam,
                             width: int, height: int, *, axis_name: str,
                             num_bounces: int, spp: int = 1,
                             eps: float = 1e-3,
                             bg_color=(0.0, 0.0, 0.0, 1.0),
                             ambient=(1.0, 1.0, 1.0),
                             frame_num=1, seed: int = 0, nee: bool = True,
                             textures=None, backend: str = "lbvh",
                             interpret: bool = False):
    """Per-device body: path trace this device's pixel block.

    Sampler keys use ABSOLUTE pixel ids (y * width + x), so the result is
    bit-independent of the mesh shape (SURVEY §4 determinism test
    discipline).  Matches sched/render.py::render_pixels draw-for-draw.
    """
    tracer = ring_tracer(geo1.soup, geo1.bvh, geo1.shard_lo, geo1.shard_hi,
                         backend, axis_name, materials, textures,
                         interpret)
    nc = materials.cd.shape[-1]
    amb3 = jnp.asarray(ambient[:3], jnp.float32)
    if nc != 3:
        from visionaray_tpu.shading.spectrum import from_rgb
        amb3 = from_rgb(amb3, nc)
    pixel_id = (y.astype(jnp.uint32) * np.uint32(width)
                + x.astype(jnp.uint32))

    def sample_body(s, acc):
        color, depth = acc
        stream = pcg_hash(jnp.uint32(seed)
                          + s.astype(jnp.uint32) * np.uint32(0x85EBCA6B))
        samp = Sampler.seed(0, pixel_id ^ stream,
                            jnp.asarray(frame_num, jnp.uint32))
        (jx, jy), samp = samp.next_n(2)
        jitter = jnp.stack([jx - 0.5, jy - 0.5], axis=-1)
        ray = cam.primary_rays(x, y, width, height, jitter)
        rec = pathtrace_loop(
            ray, samp, num_bounces=num_bounces, tracer=tracer,
            tracer0=None, lights=lights, nc=nc, amb3=amb3,
            bg_color=jnp.asarray(bg_color, jnp.float32), eps=eps, nee=nee)
        return (color + rec.color,
                depth + jnp.where(rec.hit, rec.depth, 0.0))

    init = (jnp.zeros(x.shape + (4,), jnp.float32),
            jnp.zeros(x.shape, jnp.float32))
    if spp == 1:
        color, depth = sample_body(jnp.int32(0), init)
    else:
        color, depth = jax.lax.fori_loop(0, spp, sample_body, init)
    return color / spp, depth / spp


def render_image_geometry_sharded(geo: ShardedGeometry, materials, lights,
                                  cam, width: int, height: int,
                                  mesh: Mesh, *, num_bounces: int = 5,
                                  spp: int = 1, eps: float = 1e-3,
                                  bg_color=(0.0, 0.0, 0.0, 1.0),
                                  ambient=(1.0, 1.0, 1.0),
                                  frame_num: int = 1, seed: int = 0,
                                  nee: bool = True, textures=None,
                                  interpret: bool = False):
    """Config #5 frame: geometry-sharded + tile-sharded path tracing.

    Returns (color (H, W, 4), depth (H, W)).  Differentiable w.r.t.
    ``geo.soup`` leaves and ``materials``/``lights``.
    """
    axis = mesh.axis_names[0]
    D = mesh.devices.size
    n = width * height
    npad = -(-n // D) * D
    xg, yg = jnp.meshgrid(jnp.arange(width, dtype=jnp.int32),
                          jnp.arange(height, dtype=jnp.int32))
    x = jnp.pad(xg.reshape(-1), (0, npad - n))
    y = jnp.pad(yg.reshape(-1), (0, npad - n))

    def inner(x_blk, y_blk, geo_blk, mats, lts, texs):
        geo1 = jax.tree_util.tree_map(lambda a: a[0], geo_blk)
        return pathtrace_pixels_sharded(
            geo1, mats, lts, x_blk, y_blk, cam, width, height,
            axis_name=axis, num_bounces=num_bounces, spp=spp, eps=eps,
            bg_color=bg_color, ambient=ambient, frame_num=frame_num,
            seed=seed, nee=nee, textures=texs, backend=geo.backend,
            interpret=interpret)

    fn = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(axis), P(axis)), check_vma=False)
    color, depth = fn(x, y, geo, materials, lights, textures)
    return (color[:n].reshape(height, width, 4),
            depth[:n].reshape(height, width))


def soup_grads_to_faces(grad_soup_field, prim_ids, num_faces: int):
    """Scatter-add per-shard soup gradients back to original face order.

    ``grad_soup_field``: (D, per, ...) gradient of a soup leaf;
    ``prim_ids``: geo.prim_ids (D, per).  Padding slots (duplicated tail
    faces) accumulate into their source face — correct, because the
    duplicate IS the same face.
    """
    flat = grad_soup_field.reshape((-1,) + grad_soup_field.shape[2:])
    ids = prim_ids.reshape(-1)
    out = jnp.zeros((num_faces,) + flat.shape[1:], flat.dtype)
    return out.at[ids].add(flat)
