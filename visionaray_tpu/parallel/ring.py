"""Geometry-sharded tracing: ring ray exchange over the device mesh.

For scenes too large to replicate per chip (BASELINE config #5: instanced
Sponza x16 at 4K), the mesh is partitioned into D shards, each device owns
one sub-mesh + its own LBVH, and rays visit every shard via a ring of
`ppermute` rotations — keeping a running closest hit as they travel.
Structurally this is ring attention for rays (SURVEY.md §5): geometry
shards <-> KV blocks, ray batches <-> query blocks, and an online min over
t replaces the online softmax.

Round r (of D):
  1. each device intersects the visiting ray batch against its local BVH,
     merging into the carried best hit (tagging the owner shard);
  2. rays + carried best rotate to the next device over ICI (`ppermute`).
After D rounds every ray has seen every shard and is back on its home
device with the globally closest hit.

The carried best-t also culls: a shard's traversal passes max_t = best_t,
so later hops get cheaper (the reference's is_closer(…, max_t) pruning,
update_if.h:75-80, applied across devices).

Differentiability (recompute across shards): the ring search runs under
stop_gradient; a second, cheap rotation pass re-intersects each ray's
winning primitive differentiably on the shard that owns it and rotates the
(t, u, v) home — same fixed-topology gradients as ops/traversal.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from visionaray_tpu.core.scene import TriangleMesh
from visionaray_tpu.core.types import FLT_MAX, HitRecord, Ray
from visionaray_tpu.ops.intersect import intersect_triangle

SHARD_AXIS = "shards"


def shard_mesh(mesh: TriangleMesh, n_shards: int):
    """Partition a TriangleMesh into n equal shards (stacked leading axis).

    Faces are padded per-shard with degenerate triangles (vertex 0 repeated
    -> zero-area, never hit).  Returns a TriangleMesh whose arrays carry a
    leading (n_shards,) axis, ready for shard_map in_spec P('shards').
    """
    F = mesh.num_prims
    per = -(-F // n_shards)

    def pad_faces(a, fill):
        padn = per * n_shards - F
        if padn:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(fill, (padn,) + a.shape[1:]).astype(a.dtype)],
                axis=0)
        return a.reshape(n_shards, per, *a.shape[1:])

    faces = pad_faces(mesh.faces, jnp.zeros((3,), jnp.int32))
    geom_ids = pad_faces(mesh.geom_ids, jnp.int32(0))
    normals = pad_faces(mesh.normals, jnp.zeros((3,), jnp.float32))
    corner_normals = pad_faces(mesh.corner_normals,
                               jnp.zeros((3, 3), jnp.float32))
    tex_coords = pad_faces(mesh.tex_coords, jnp.zeros((3, 2), jnp.float32))
    vertices = jnp.broadcast_to(mesh.vertices,
                                (n_shards,) + mesh.vertices.shape)
    return TriangleMesh(
        vertices=vertices, faces=faces, geom_ids=geom_ids, normals=normals,
        corner_normals=corner_normals, tex_coords=tex_coords,
        face_normals_binding=mesh.face_normals_binding)


def _local_closest(ray: Ray, verts, faces, geom_ids, best: HitRecord,
                   prim_offset):
    """Brute-force local sweep merged into the carried best (max_t culled).

    The Pallas/LBVH local traversal drops in here transparently; brute
    force keeps the distributed logic testable on tiny CPU meshes.
    """
    v1 = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - v1
    e2 = verts[faces[:, 2]] - v1
    o = ray.ori[..., None, :]
    d = ray.dir[..., None, :]
    t, u, v, hit = intersect_triangle(o, d, v1, e1, e2)
    valid = hit & (t >= 0.0) & (t < best.t[..., None])
    tt = jnp.where(valid, t, FLT_MAX)
    idx = jnp.argmin(tt, axis=-1)
    take = lambda a: jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]
    bt = take(tt)
    closer = bt < best.t
    sel = lambda a, b: jnp.where(closer, a, b)
    return HitRecord(
        hit=best.hit | closer,
        t=sel(bt, best.t),
        prim_id=sel((idx + prim_offset).astype(jnp.int32), best.prim_id),
        geom_id=sel(jnp.take(geom_ids, idx), best.geom_id),
        u=sel(take(u), best.u), v=sel(take(v), best.v),
    )


def ring_closest_hit_local(ray: Ray, verts, faces, geom_ids, axis_name: str
                           ) -> HitRecord:
    """Runs INSIDE shard_map: rays local to this device, geometry local.

    Returns each home device's rays' global closest hit.  prim_id is the
    global id (shard_index * prims_per_shard + local id); geom_id is global
    (materials replicated).
    """
    D = jax.lax.psum(1, axis_name)
    per = faces.shape[0]
    my = jax.lax.axis_index(axis_name)
    perm_fwd = [(i, (i + 1) % D) for i in range(D)]

    def round_body(r, carry):
        ray, best = carry
        # geometry is pinned to this device: its global prim range starts
        # at my * per regardless of which home batch is visiting
        best = _local_closest(ray, verts, faces, geom_ids, best,
                              prim_offset=my * per)
        ray, best = jax.lax.ppermute((ray, best), axis_name, perm_fwd)
        return ray, best

    best0 = HitRecord.none(ray.batch_shape)
    ray_out, best = jax.lax.fori_loop(0, D, round_body, (ray, best0))
    # D rotations = identity: rays (and their hits) are home again
    return best


def ring_recompute_local(ray: Ray, hit: HitRecord, verts, faces,
                         axis_name: str):
    """Differentiable (t, u, v) recompute for ring results, inside shard_map.

    Rotates (ray, prim_id) around the ring; each hop re-intersects the rays
    whose winning primitive lives on this shard; accumulated (t, u, v)
    travel with the rays and are home after D hops.
    """
    D = jax.lax.psum(1, axis_name)
    per = faces.shape[0]
    my = jax.lax.axis_index(axis_name)
    perm_fwd = [(i, (i + 1) % D) for i in range(D)]

    def round_body(r, carry):
        ray, pid, acc_t, acc_u, acc_v = carry
        owner = pid // per
        local = jnp.clip(pid - my * per, 0, per - 1)
        v1 = verts[faces[local, 0]]
        e1 = verts[faces[local, 1]] - v1
        e2 = verts[faces[local, 2]] - v1
        t, u, v, _ = intersect_triangle(ray.ori, ray.dir, v1, e1, e2)
        mine = owner == my
        acc_t = jnp.where(mine, t, acc_t)
        acc_u = jnp.where(mine, u, acc_u)
        acc_v = jnp.where(mine, v, acc_v)
        ray, pid, acc_t, acc_u, acc_v = jax.lax.ppermute(
            (ray, pid, acc_t, acc_u, acc_v), axis_name, perm_fwd)
        return ray, pid, acc_t, acc_u, acc_v

    z = jnp.zeros(ray.batch_shape, jnp.float32)
    _, _, t, u, v = jax.lax.fori_loop(
        0, D, round_body, (ray, hit.prim_id, z, z, z))
    return t, u, v


def geometry_sharded_closest_hit(ray_global: Ray, sharded_mesh: TriangleMesh,
                                 mesh: Mesh) -> HitRecord:
    """Host-level entry: rays tile-sharded, geometry shard per device.

    ``ray_global``: flat (N, 3) components, N divisible by mesh size.
    ``sharded_mesh``: from shard_mesh() — leading (D,) axis on face arrays.
    Differentiable w.r.t. sharded_mesh.vertices via the recompute pass.
    """
    axis = mesh.axis_names[0]

    def inner(ray, verts, faces, geom_ids):
        # shard_map delivers the (D, ...) leading shard axis as a size-1 block
        verts = verts[0]
        faces = faces[0]
        geom_ids = geom_ids[0]
        sg = jax.lax.stop_gradient
        hit = ring_closest_hit_local(
            Ray(sg(ray.ori), sg(ray.dir)), sg(verts), faces, geom_ids, axis)
        t, u, v = ring_recompute_local(ray, hit, verts, faces, axis)
        return HitRecord(
            hit=hit.hit,
            t=jnp.where(hit.hit, t, FLT_MAX),
            prim_id=hit.prim_id, geom_id=hit.geom_id,
            u=jnp.where(hit.hit, u, 0.0), v=jnp.where(hit.hit, v, 0.0),
        )

    fn = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis), check_vma=False)
    return fn(ray_global, sharded_mesh.vertices, sharded_mesh.faces,
              sharded_mesh.geom_ids)
