"""Geometry-sharded tracing: ring ray exchange over the device mesh.

For scenes too large to replicate per chip (BASELINE config #5: instanced
Sponza x16 at 4K), the mesh is spatially partitioned into D shards, each
device owns one sub-mesh + its own acceleration structure, and rays visit
every shard via a ring of `ppermute` rotations — keeping a running closest
hit as they travel.  Structurally this is ring attention for rays
(SURVEY.md §5): geometry shards <-> KV blocks, ray batches <-> query
blocks, and an online min over t replaces the online softmax.

Round r (of D):
  1. shard-AABB cull: lanes whose live segment [0, best_t) misses this
     shard's bounding box carry max_t = -1 and skip the local traversal
     (on the Pallas tier their tiles retire on the first frustum test);
  2. survivors traverse the LOCAL acceleration structure (per-shard
     ClusterBVH / LBVH built once, outside the loop) with max_t = best_t
     — the reference's is_closer(…, max_t) pruning (update_if.h:75-80)
     applied across devices;
  3. the winner's (t, u, v) are recomputed differentiably at its local
     primitive IN THE SAME HOP (each backend's closest_hit is recompute-
     differentiable), so no separate gradient rotation pass is needed;
  4. rays + carried best rotate to the next device over ICI (`ppermute`).
After D rounds every ray has seen every shard and is home with the
globally closest hit and differentiable (t, u, v).

Memory: each shard holds per = ceil(F/D) triangle records (soup form,
~36 B each) + its accel — the per-device HBM footprint is ~1/D of the
scene; nothing is broadcast.  Spatial (morton) partitioning keeps shard
AABBs compact so the step-1 cull skips most (ray, shard) combinations.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from visionaray_tpu.core.types import (
    FLT_MAX, HitRecord, Ray, pytree_dataclass,
)
from visionaray_tpu.core.vecmath import cross, normalize
from visionaray_tpu.ops.intersect import intersect_aabb, intersect_triangle
from visionaray_tpu.ops.lbvh import (
    build_lbvh_from_aabbs, morton3d, triangle_aabbs,
)

SHARD_AXIS = "shards"

BACKENDS = ("brute", "lbvh", "cluster")


@pytree_dataclass
class SoupMesh:
    """Minimal per-shard mesh view (triangle soup) satisfying the corners()
    + geom_ids contract the traversal tiers consume.

    ``corner_normals`` / ``tex_coords`` (optional) carry the shading data
    the reference's get_surface gathers (get_surface.h:541-585) — here
    gathered from the LOCAL soup inside the ring hop that owns the hit, so
    shading over sharded geometry never needs a replicated mesh."""

    v1: Any       # (per, 3)
    e1: Any
    e2: Any
    geom_ids: Any  # (per,)
    corner_normals: Any = None   # (per, 3, 3) per-corner shading normals
    tex_coords: Any = None       # (per, 3, 2) per-corner UVs

    def corners(self):
        return self.v1, self.e1, self.e2

    @property
    def num_prims(self):
        return self.v1.shape[0]


@pytree_dataclass(static=("backend", "prims_per_shard", "num_shards"))
class ShardedGeometry:
    """Spatially partitioned scene geometry, one shard per device.

    All arrays carry a leading (D,) shard axis; pass through shard_map with
    in_spec P(SHARD_AXIS).  ``soup.v1/e1/e2`` are the differentiable
    leaves (gradients arrive per-shard; map to the original vertex buffer
    via ``prim_ids`` if needed).
    """

    soup: SoupMesh          # fields (D, per, ...)
    prim_ids: Any           # (D, per) original face index of each soup slot
    shard_lo: Any           # (D, 3)
    shard_hi: Any           # (D, 3)
    bvh: Any                # per-shard accel (leading D) or None for brute
    backend: str = "lbvh"
    prims_per_shard: int = 0
    num_shards: int = 0


def shard_geometry(mesh, n_shards: int, backend: str = "lbvh",
                   cluster_size: int = 8,
                   treelet_size: int = 0,
                   with_shading: bool = False) -> ShardedGeometry:
    """Partition a TriangleMesh into n spatially-compact shards.

    Faces are morton-sorted by centroid then split into D contiguous
    ranges, so each shard covers a compact region and the ring's
    shard-AABB cull is effective.  The tail shard is padded by repeating
    its last face (duplicate hits merge to the same t — harmless).

    ``with_shading``: also scatter the mesh's per-corner shading normals
    and tex coords into the soup so the ring can shade (sharded PT,
    parallel/sharded_pt.py).
    """
    assert backend in BACKENDS, backend
    v1, e1, e2 = mesh.corners()
    F = v1.shape[0]
    lo, hi = triangle_aabbs(v1, e1, e2)
    centroid = 0.5 * (lo + hi)
    scene_lo = jnp.min(lo, axis=0)
    extent = jnp.maximum(jnp.max(hi, axis=0) - scene_lo, 1e-9)
    order = jnp.argsort(morton3d((centroid - scene_lo) / extent))
    order = order.astype(jnp.int32)

    per = -(-F // n_shards)
    padn = per * n_shards - F
    if padn:
        order = jnp.concatenate(
            [order, jnp.broadcast_to(order[-1], (padn,))], axis=0)
    order = order.reshape(n_shards, per)

    take = lambda a: jnp.take(a, order.reshape(-1), axis=0).reshape(
        n_shards, per, *a.shape[1:])
    soup = SoupMesh(
        v1=take(v1), e1=take(e1), e2=take(e2),
        geom_ids=take(mesh.geom_ids),
        corner_normals=take(mesh.corner_normals) if with_shading else None,
        tex_coords=take(mesh.tex_coords) if with_shading else None)
    s_lo = take(lo)
    s_hi = take(hi)
    shard_lo = jnp.min(s_lo, axis=1)
    shard_hi = jnp.max(s_hi, axis=1)

    bvh = None
    if backend == "lbvh":
        bvh = jax.vmap(build_lbvh_from_aabbs)(s_lo, s_hi)
    elif backend == "cluster":
        from visionaray_tpu.ops.pallas.cluster_bvh import (
            build_cluster_bvh_from_corners,
        )
        bvh = jax.vmap(partial(
            build_cluster_bvh_from_corners, cluster_size=cluster_size,
            treelet_size=treelet_size))(soup.v1, soup.e1, soup.e2)
    return ShardedGeometry(
        soup=soup, prim_ids=order, shard_lo=shard_lo, shard_hi=shard_hi,
        bvh=bvh, backend=backend, prims_per_shard=int(per),
        num_shards=int(n_shards))


def _local_closest(ray: Ray, soup: SoupMesh, bvh, backend: str, max_t,
                   interpret: bool) -> HitRecord:
    """Backend dispatch for one shard's closest hit; differentiable by each
    backend's own recompute.  prim_id is LOCAL to the shard."""
    if backend == "cluster":
        from visionaray_tpu.ops.pallas.traverse import cluster_closest_hit
        return cluster_closest_hit(ray, bvh, soup, max_t=max_t,
                                   interpret=interpret)
    if backend == "lbvh":
        from visionaray_tpu.ops.traversal import bvh_closest_hit
        return bvh_closest_hit(ray, bvh, soup, max_t=max_t)
    from visionaray_tpu.ops.trace import intersect_triangles_brute
    hr = intersect_triangles_brute(ray, soup.v1, soup.e1, soup.e2,
                                   soup.geom_ids)
    ok = hr.hit & (hr.t < max_t)
    return dataclasses.replace(hr, hit=ok, t=jnp.where(ok, hr.t, FLT_MAX))


def _local_any(ray: Ray, soup: SoupMesh, bvh, backend: str, max_t,
               interpret: bool) -> HitRecord:
    if backend == "cluster":
        from visionaray_tpu.ops.pallas.traverse import cluster_any_hit
        return cluster_any_hit(ray, bvh, soup, max_t=max_t,
                               interpret=interpret)
    if backend == "lbvh":
        from visionaray_tpu.ops.traversal import bvh_any_hit
        return bvh_any_hit(ray, bvh, soup, max_t=max_t)
    from visionaray_tpu.ops.trace import intersect_triangles_brute
    hr = intersect_triangles_brute(ray, soup.v1, soup.e1, soup.e2,
                                   soup.geom_ids)
    ok = hr.hit & (hr.t < max_t)
    return dataclasses.replace(hr, hit=ok, t=jnp.where(ok, hr.t, FLT_MAX))


def ring_closest_hit_local(ray: Ray, soup: SoupMesh, bvh, shard_lo, shard_hi,
                           backend: str, axis_name: str,
                           interpret: bool = False) -> HitRecord:
    """Runs INSIDE shard_map: rays local to this device, geometry local.

    Returns each home device's rays' global closest hit with differentiable
    (t, u, v); prim_id is GLOBAL (owner_shard * prims_per_shard + local).
    """
    D = jax.lax.psum(1, axis_name)
    per = soup.num_prims
    my = jax.lax.axis_index(axis_name)
    perm_fwd = [(i, (i + 1) % D) for i in range(D)]

    def round_body(r, carry):
        ray, best, owner = carry
        # ---- shard-AABB cull: live segment [0, best.t) vs this shard
        inv_d = 1.0 / jnp.where(jnp.abs(ray.dir) < 1e-30, 1e-30, ray.dir)
        tn, tf, bh = intersect_aabb(jax.lax.stop_gradient(ray.ori),
                                    jax.lax.stop_gradient(inv_d),
                                    shard_lo, shard_hi)
        want = bh & (tf >= 0.0) & (tn < best.t)
        mt = jnp.where(want, jax.lax.stop_gradient(best.t), -1.0)
        hr = _local_closest(ray, soup, bvh, backend, mt, interpret)
        closer = hr.hit & (hr.t < best.t)
        sel = lambda a, b: jnp.where(closer, a, b)
        best = HitRecord(
            hit=best.hit | closer,
            t=sel(hr.t, best.t),
            prim_id=sel(hr.prim_id, best.prim_id),
            geom_id=sel(hr.geom_id, best.geom_id),
            u=sel(hr.u, best.u), v=sel(hr.v, best.v))
        owner = jnp.where(closer, my, owner)
        ray, best, owner = jax.lax.ppermute((ray, best, owner), axis_name,
                                            perm_fwd)
        return ray, best, owner

    best0 = HitRecord.none(ray.batch_shape)
    owner0 = jnp.zeros(ray.batch_shape, jnp.int32)
    # D rotations = identity: rays (and their hits) are home again
    _, best, owner = jax.lax.fori_loop(0, D, round_body,
                                       (ray, best0, owner0))
    return dataclasses.replace(
        best, prim_id=jnp.where(best.hit, owner * per + best.prim_id, 0))


def ring_closest_surface_local(ray: Ray, soup: SoupMesh, bvh, shard_lo,
                               shard_hi, backend: str, axis_name: str,
                               max_t=FLT_MAX, interpret: bool = False):
    """Closest hit PLUS surface data over the ring — the sharded analogue of
    closest_hit + get_surface (reference get_surface.h:541-585).

    Each hop gathers the shading data of hits it owns from its LOCAL soup
    (per-corner normals interpolated at the recompute-differentiable
    (u, v), geometric normal from cross(e1, e2), per-corner UVs) and the
    winner's values ride the ``ppermute`` payload home.  Gradients flow to
    the owning shard's soup leaves through the rotation (ppermute is
    linear), so no second gradient pass is needed.

    Returns (HitRecord, shading_normal (..., 3) unnormalized interpolation,
    geometric_normal (..., 3) unit, uv (..., 2)).  Normalization of the
    shading normal is left to the caller (a carried value is only ever
    replaced, never accumulated, so normalize-at-home == normalize-at-hop).
    """
    assert soup.corner_normals is not None, \
        "ring shading needs shard_geometry(..., with_shading=True)"
    D = jax.lax.psum(1, axis_name)
    per = soup.num_prims
    my = jax.lax.axis_index(axis_name)
    perm_fwd = [(i, (i + 1) % D) for i in range(D)]
    batch = ray.batch_shape
    mt0 = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), batch)

    def round_body(r, carry):
        ray, mt, best, owner, ns, ng, uv = carry
        inv_d = 1.0 / jnp.where(jnp.abs(ray.dir) < 1e-30, 1e-30, ray.dir)
        tn, tf, bh = intersect_aabb(jax.lax.stop_gradient(ray.ori),
                                    jax.lax.stop_gradient(inv_d),
                                    shard_lo, shard_hi)
        bound = jnp.minimum(jax.lax.stop_gradient(best.t), mt)
        want = bh & (tf >= 0.0) & (tn < bound)
        hr = _local_closest(ray, soup, bvh, backend,
                            jnp.where(want, bound, -1.0), interpret)
        closer = hr.hit & (hr.t < best.t) & (hr.t < mt)
        # --- local surface gather at this hop's winning primitive
        pid = jnp.where(closer, hr.prim_id, 0)
        w = jnp.stack([1.0 - hr.u - hr.v, hr.u, hr.v], axis=-1)
        cn = jnp.take(soup.corner_normals, pid, axis=0)      # (..., 3, 3)
        ns_new = jnp.sum(cn * w[..., None], axis=-2)
        uvs = jnp.take(soup.tex_coords, pid, axis=0)         # (..., 3, 2)
        uv_new = jnp.sum(uvs * w[..., None], axis=-2)
        e1g = jnp.take(soup.e1, pid, axis=0)
        e2g = jnp.take(soup.e2, pid, axis=0)
        ng_new = normalize(cross(e1g, e2g))

        sel = lambda a, b: jnp.where(closer, a, b)
        sel3 = lambda a, b: jnp.where(closer[..., None], a, b)
        best = HitRecord(
            hit=best.hit | closer,
            t=sel(hr.t, best.t),
            prim_id=sel(hr.prim_id, best.prim_id),
            geom_id=sel(hr.geom_id, best.geom_id),
            u=sel(hr.u, best.u), v=sel(hr.v, best.v))
        owner = jnp.where(closer, my, owner)
        ns = sel3(ns_new, ns)
        ng = sel3(ng_new, ng)
        uv = jnp.where(closer[..., None], uv_new, uv)
        (ray, mt, best, owner, ns, ng, uv) = jax.lax.ppermute(
            (ray, mt, best, owner, ns, ng, uv), axis_name, perm_fwd)
        return ray, mt, best, owner, ns, ng, uv

    best0 = HitRecord.none(batch)
    owner0 = jnp.zeros(batch, jnp.int32)
    # miss lanes keep a unit normal (never consumed — their lanes are
    # masked — but normalize(0) would inject NaNs that poison masked
    # products downstream: NaN * 0 == NaN)
    z3 = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                          batch + (3,))
    z2 = jnp.zeros(batch + (2,), jnp.float32)
    _, _, best, owner, ns, ng, uv = jax.lax.fori_loop(
        0, D, round_body, (ray, mt0, best0, owner0, z3, z3, z2))
    best = dataclasses.replace(
        best, prim_id=jnp.where(best.hit, owner * per + best.prim_id, 0))
    return best, ns, ng, uv


def ring_any_hit_local(ray: Ray, max_t, soup: SoupMesh, bvh, shard_lo,
                       shard_hi, backend: str, axis_name: str,
                       interpret: bool = False) -> HitRecord:
    """Occlusion ring: a ray already occluded skips every later shard."""
    D = jax.lax.psum(1, axis_name)
    perm_fwd = [(i, (i + 1) % D) for i in range(D)]
    mt0 = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), ray.batch_shape)

    def round_body(r, carry):
        ray, mt, occluded, t = carry
        inv_d = 1.0 / jnp.where(jnp.abs(ray.dir) < 1e-30, 1e-30, ray.dir)
        tn, tf, bh = intersect_aabb(ray.ori, inv_d, shard_lo, shard_hi)
        want = (~occluded) & bh & (tf >= 0.0) & (tn < mt)
        hr = _local_any(ray, soup, bvh, backend,
                        jnp.where(want, mt, -1.0), interpret)
        occluded = occluded | hr.hit
        t = jnp.where(hr.hit & (hr.t < t), hr.t, t)
        ray, mt, occluded, t = jax.lax.ppermute(
            (ray, mt, occluded, t), axis_name, perm_fwd)
        return ray, mt, occluded, t

    z = jnp.zeros(ray.batch_shape, jnp.bool_)
    tinf = jnp.full(ray.batch_shape, FLT_MAX, jnp.float32)
    _, _, occluded, t = jax.lax.fori_loop(
        0, D, round_body, (jax.lax.stop_gradient(ray),
                           jax.lax.stop_gradient(mt0), z, tinf))
    return HitRecord(hit=occluded, t=t,
                     prim_id=jnp.zeros(ray.batch_shape, jnp.int32),
                     geom_id=jnp.zeros(ray.batch_shape, jnp.int32),
                     u=jnp.zeros_like(t), v=jnp.zeros_like(t))


def geometry_sharded_closest_hit(ray_global: Ray, geo: ShardedGeometry,
                                 mesh: Mesh,
                                 interpret: bool = False) -> HitRecord:
    """Host-level entry: rays tile-sharded, geometry shard per device.

    ``ray_global``: flat (N, 3) components, N divisible by mesh size.
    Differentiable w.r.t. geo.soup.{v1,e1,e2} via each hop's recompute.
    """
    axis = mesh.axis_names[0]

    def inner(ray, geo_blk):
        geo1 = jax.tree_util.tree_map(lambda x: x[0], geo_blk)
        return ring_closest_hit_local(
            ray, geo1.soup, geo1.bvh, geo1.shard_lo, geo1.shard_hi,
            geo.backend, axis, interpret)

    fn = jax.shard_map(
        inner, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis), check_vma=False)
    return fn(ray_global, geo)


def geometry_sharded_any_hit(ray_global: Ray, max_t, geo: ShardedGeometry,
                             mesh: Mesh,
                             interpret: bool = False) -> HitRecord:
    axis = mesh.axis_names[0]

    def inner(ray, mt, geo_blk):
        geo1 = jax.tree_util.tree_map(lambda x: x[0], geo_blk)
        return ring_any_hit_local(
            ray, mt, geo1.soup, geo1.bvh, geo1.shard_lo, geo1.shard_hi,
            geo.backend, axis, interpret)

    mt = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32),
                          ray_global.batch_shape)
    fn = jax.shard_map(
        inner, mesh=mesh, in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis), check_vma=False)
    return fn(ray_global, mt, geo)


# --------------------------------------------------------------------------
# Back-compat shim for the round-1 API (replicated-vertex face split).


def shard_mesh(mesh, n_shards: int) -> ShardedGeometry:
    """Deprecated round-1 name: now spatial sharding with local buffers."""
    return shard_geometry(mesh, n_shards, backend="brute")
