"""get_surface: gather shading data at hit points.

Re-expresses the reference's get_surface pipeline (get_surface.h:577-585,
get_normal.h, get_shading_normal.h, get_tex_coord.h) as batched jnp gathers:

- geometric normal: per-face ``normals[prim_id]`` for triangles
  (get_normal.h:36); ``(isect_pos - center)/radius`` for spheres
  (get_normal.h:135-138); the plane normal for planes.
- shading normal: per-face binding reuses the geometric normal; per-vertex
  binding interpolates per-corner normals with
  ``normalize(lerp(n1, n2, n3, u, v))`` where
  lerp = (1-u-v)*n1 + u*n2 + v*n3 (get_shading_normal.h).
- tex color: bilinear texture fetch at interpolated UV (if textures bound).
- material: gathered by geom_id.

The reference's SIMD path unpacks the hit record into scalar gathers and
re-packs (get_surface.h:541-568); on TPU this is simply `jnp.take` along the
batch, which XLA vectorizes.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from visionaray_tpu.core.types import HitRecord, Ray, pytree_dataclass
from visionaray_tpu.core.vecmath import normalize
from visionaray_tpu.ops.trace import (
    PRIM_PLANE, PRIM_SPHERE, PRIM_TRIANGLE, prim_type_of,
)
from visionaray_tpu.shading.materials import Materials


@pytree_dataclass
class Surface:
    """surface<N, M, C> analogue (reference surface.h:21-96)."""

    geometric_normal: Any  # (..., 3)
    shading_normal: Any    # (..., 3)
    tex_color: Any         # (..., 3)
    materials: Materials   # per-ray gathered material rows


def get_surface(hit: HitRecord, ray: Ray, scene) -> Surface:
    batch = hit.t.shape
    isect_pos = ray.at(jnp.where(hit.hit, hit.t, 1.0))
    ptype = prim_type_of(scene, hit.prim_id)

    geom_n = jnp.zeros(batch + (3,), jnp.float32)
    shade_n = jnp.zeros(batch + (3,), jnp.float32)
    tex_color = jnp.ones(batch + (3,), jnp.float32)

    nt = scene.num_triangles
    ns = scene.num_spheres

    if scene.mesh is not None:
        tri_idx = jnp.clip(hit.prim_id, 0, max(nt - 1, 0))
        tri_n = jnp.take(scene.mesh.normals, tri_idx, axis=0)
        is_tri = (ptype == PRIM_TRIANGLE)[..., None]
        geom_n = jnp.where(is_tri, tri_n, geom_n)
        if scene.mesh.face_normals_binding:
            tri_sn = tri_n
        else:
            cn = jnp.take(scene.mesh.corner_normals, tri_idx, axis=0)
            w = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)
            tri_sn = normalize(jnp.sum(cn * w[..., None], axis=-2))
        shade_n = jnp.where(is_tri, tri_sn, shade_n)
        if scene.textures is not None:
            from visionaray_tpu.shading.texture import sample_scene_texture
            uvs = jnp.take(scene.mesh.tex_coords, tri_idx, axis=0)
            w = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)
            uv = jnp.sum(uvs * w[..., None], axis=-2)
            tc = sample_scene_texture(scene.textures, hit.geom_id, uv)
            tex_color = jnp.where(is_tri, tc, tex_color)

    if scene.spheres is not None:
        sp_idx = jnp.clip(hit.prim_id - nt, 0, max(ns - 1, 0))
        center = jnp.take(scene.spheres.center, sp_idx, axis=0)
        radius = jnp.take(scene.spheres.radius, sp_idx, axis=0)
        sp_n = (isect_pos - center) / radius[..., None]
        is_sp = (ptype == PRIM_SPHERE)[..., None]
        geom_n = jnp.where(is_sp, sp_n, geom_n)
        shade_n = jnp.where(is_sp, sp_n, shade_n)

    if scene.planes is not None:
        np_ = scene.num_planes
        pl_idx = jnp.clip(hit.prim_id - nt - ns, 0, max(np_ - 1, 0))
        pl_n = jnp.take(scene.planes.normal, pl_idx, axis=0)
        is_pl = (ptype == PRIM_PLANE)[..., None]
        geom_n = jnp.where(is_pl, pl_n, geom_n)
        shade_n = jnp.where(is_pl, pl_n, shade_n)

    mats = scene.materials.take(hit.geom_id)
    if scene.textures is not None:
        # the reference multiplies sr.tex_color into every diffuse/emissive
        # term inside the material impls (matte.inl:64,141, plastic.inl:
        # 62,182, emissive.inl:89, carried via surface.h:82,90); folding it
        # into the gathered per-ray material rows gives the same algebra to
        # shade(), sample() and NEE in one place
        import dataclasses
        tc = tex_color
        if mats.cd.shape[-1] != 3:   # spectral mode: lift the RGB texel
            from visionaray_tpu.shading.spectrum import from_rgb
            tc = from_rgb(tc, mats.cd.shape[-1])
        mats = dataclasses.replace(mats, cd=mats.cd * tc, ce=mats.ce * tc)
    return Surface(geometric_normal=geom_n, shading_normal=shade_n,
                   tex_color=tex_color, materials=mats)
