"""Traversal front-end: closest_hit / any_hit / multi_hit over a Scene.

The reference exposes closest_hit/any_hit/multi_hit over primitive ranges or
BVHs (traverse.h, detail/traverse_linear.inl:186-380).  Here:

- ``closest_hit(ray, scene)``: full scene query.  Triangles go through the
  BVH when ``scene.bvh`` is set, else a (chunked) brute-force sweep; spheres
  likewise via ``scene.sphere_bvh`` (ops/traversal.py:build_sphere_bvh, the
  reference's generic build() over any primitive type, bvh.h:438-448);
  planes are always swept linearly (they are few).
- ``any_hit(ray, scene, max_t)``: shadow-ray variant with the reference's
  is_closer(…, max_t) predicate (update_if.h:75-80).
- ``multi_hit(ray, scene, K)``: top-K nearest hits per ray (multi_hit.h).

All paths are pure jnp and differentiable; the Pallas fast path plugs in at
the BVH traversal level (ops/pallas).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from visionaray_tpu.core.types import (
    FLT_MAX, HitRecord, Ray, is_closer, update_if,
)
from visionaray_tpu.ops.intersect import (
    intersect_plane, intersect_sphere, intersect_triangle,
)

# Primitive-group type tags carried in HitRecord.prim_id's global ordering.
PRIM_TRIANGLE = 0
PRIM_SPHERE = 1
PRIM_PLANE = 2

_CHUNK = 512  # brute-force primitive chunk (keeps the N x F matrix bounded)


def _is_cluster_bvh(bvh) -> bool:
    from visionaray_tpu.ops.pallas.cluster_bvh import ClusterBVH
    return isinstance(bvh, ClusterBVH)


def _interpret_default() -> bool:
    """Pallas kernels compile natively on TPU (incl. the axon plugin);
    interpret on CPU (tests)."""
    import jax
    return jax.default_backend() == "cpu"


def _best_of(t, hit, max_t=None):
    """Select index of the closest valid hit along the last (primitive) axis.

    Validity per reference is_closer (update_if.h:50-57): hit && t >= 0.
    Returns (best_idx, best_t, best_valid).
    """
    valid = hit & (t >= 0.0)
    if max_t is not None:
        valid = valid & (t < max_t[..., None])
    tt = jnp.where(valid, t, FLT_MAX)
    idx = jnp.argmin(tt, axis=-1)
    best_t = jnp.take_along_axis(tt, idx[..., None], axis=-1)[..., 0]
    return idx, best_t, best_t < FLT_MAX


def _merge(dst: HitRecord, src: HitRecord, max_t=None) -> HitRecord:
    return update_if(dst, src, is_closer(src, dst.t, max_t))


def intersect_triangles_brute(ray: Ray, v1, e1, e2, geom_ids,
                              prim_offset: int = 0,
                              hit_filter=None) -> HitRecord:
    """Chunked brute-force sweep over a triangle soup. Batched over rays.

    ``hit_filter``: optional custom-intersector hook (the TPU analogue of
    basic_intersector's per-primitive override, reference intersector.h:24):
    ``fn(prim_id, t, u, v, hit) -> hit`` applied to every candidate hit
    before the closest-merge — e.g. alpha-mask transparency
    (examples/intersector/main.cpp:256).
    """
    F = v1.shape[0]
    batch = ray.batch_shape
    o = ray.ori[..., None, :]
    d = ray.dir[..., None, :]

    if F <= _CHUNK:
        t, u, v, hit = intersect_triangle(o, d, v1, e1, e2)
        if hit_filter is not None:
            pid_arr = jnp.broadcast_to(
                jnp.arange(F, dtype=jnp.int32) + prim_offset, t.shape)
            hit = hit_filter(pid_arr, t, u, v, hit)
        idx, best_t, best_hit = _best_of(t, hit)
        take = lambda a: jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]
        return HitRecord(
            hit=best_hit,
            t=jnp.where(best_hit, best_t, FLT_MAX),
            prim_id=(idx + prim_offset).astype(jnp.int32),
            geom_id=jnp.take(geom_ids, idx),
            u=take(u), v=take(v),
        )

    # scan over primitive chunks, carrying the best hit record
    n_chunks = -(-F // _CHUNK)
    pad = n_chunks * _CHUNK - F
    padf = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0) if pad else a
    v1p, e1p, e2p = padf(v1), padf(e1), padf(e2)
    gp = padf(geom_ids)
    v1c = v1p.reshape(n_chunks, _CHUNK, 3)
    e1c = e1p.reshape(n_chunks, _CHUNK, 3)
    e2c = e2p.reshape(n_chunks, _CHUNK, 3)
    gc = gp.reshape(n_chunks, _CHUNK)

    def body(best, chunk):
        ci, (cv1, ce1, ce2, cg) = chunk
        t, u, v, hit = intersect_triangle(o, d, cv1, ce1, ce2)
        local_pid = ci * _CHUNK + jnp.arange(_CHUNK)
        hit = hit & (local_pid < F)
        if hit_filter is not None:
            pid_arr = jnp.broadcast_to(
                (local_pid + prim_offset).astype(jnp.int32), t.shape)
            hit = hit_filter(pid_arr, t, u, v, hit)
        idx, best_t, best_hit = _best_of(t, hit)
        take = lambda a: jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]
        src = HitRecord(
            hit=best_hit,
            t=jnp.where(best_hit, best_t, FLT_MAX),
            prim_id=(ci * _CHUNK + idx + prim_offset).astype(jnp.int32),
            geom_id=jnp.take(cg, idx),
            u=take(u), v=take(v),
        )
        return _merge(best, src), None

    init = HitRecord.none(batch)
    best, _ = jax.lax.scan(
        body, init,
        (jnp.arange(n_chunks), (v1c, e1c, e2c, gc)))
    return best


def intersect_spheres_brute(ray: Ray, center, radius, geom_ids,
                            prim_offset: int = 0) -> HitRecord:
    o = ray.ori[..., None, :]
    d = ray.dir[..., None, :]
    t, hit = intersect_sphere(o, d, center, radius)
    idx, best_t, best_hit = _best_of(t, hit)
    return HitRecord(
        hit=best_hit,
        t=jnp.where(best_hit, best_t, FLT_MAX),
        prim_id=(idx + prim_offset).astype(jnp.int32),
        geom_id=jnp.take(geom_ids, idx),
        u=jnp.zeros_like(best_t), v=jnp.zeros_like(best_t),
    )


def intersect_planes_brute(ray: Ray, normal, offset, geom_ids,
                           prim_offset: int = 0) -> HitRecord:
    o = ray.ori[..., None, :]
    d = ray.dir[..., None, :]
    t, hit = intersect_plane(o, d, normal, offset)
    idx, best_t, best_hit = _best_of(t, hit)
    return HitRecord(
        hit=best_hit,
        t=jnp.where(best_hit, best_t, FLT_MAX),
        prim_id=(idx + prim_offset).astype(jnp.int32),
        geom_id=jnp.take(geom_ids, idx),
        u=jnp.zeros_like(best_t), v=jnp.zeros_like(best_t),
    )


_FILTER_RETRACE_CAP = 16  # matches the reference's multi_hit N<=16 bound


def _cluster_closest_filtered(ray: Ray, cbvh, mesh, hit_filter,
                              interpret: bool, max_t=FLT_MAX) -> HitRecord:
    """Closest SURVIVING hit on the Pallas tier.

    The kernel has no per-leaf filter hook (filtering inside the consensus
    loop would put a user callable on the scalar/vector sync path), so the
    reference's in-traversal rejection (intersector.h:24, the alpha-mask
    example main.cpp:256-330) is recovered by iterative fall-through: trace,
    ask the filter about the winner, and for rejected winners re-trace from
    just past the rejected hit (excluding that primitive, so coplanar or
    zero-distance repeats cannot livelock).  Lanes already resolved carry
    max_t = -1 and retire on their tile's first frustum test.
    """
    from visionaray_tpu.ops.pallas.traverse import cluster_closest_hit

    batch = ray.batch_shape
    sg = jax.lax.stop_gradient
    # the search loop is discrete (and lax.while_loop is not reverse-mode
    # differentiable): run it fully detached, then recompute t/u/v at the
    # winning primitive differentiably below — the same recompute pattern
    # as bvh_closest_hit
    sray = Ray(ori=sg(ray.ori), dir=sg(ray.dir))
    mtb = sg(jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), batch))

    def trace(t0, excl, live):
        o = sray.ori + sray.dir * t0[..., None]
        mt = jnp.where(live, mtb - t0, -1.0)
        hr = cluster_closest_hit(Ray(ori=o, dir=sray.dir), cbvh, mesh,
                                 max_t=mt, interpret=interpret)
        # exclude the previously rejected primitive explicitly
        same = hr.hit & (hr.prim_id == excl)
        return HitRecord(hit=hr.hit & ~same,
                         t=jnp.where(same, FLT_MAX, hr.t),
                         prim_id=hr.prim_id, geom_id=hr.geom_id,
                         u=hr.u, v=hr.v), same

    def step(state):
        best, t0, excl, unresolved, k = state
        hr, same = trace(t0, excl, unresolved)
        # `same` re-hit of the excluded prim: advance past it and continue
        keep = hit_filter(hr.prim_id, hr.t + t0, hr.u, hr.v, hr.hit)
        accept = unresolved & hr.hit & keep
        rejected = unresolved & ((hr.hit & ~keep) | same)
        # re-hit of the excluded prim at t>=0 means the nudge didn't clear
        # the surface numerically; advance by a t0-proportional epsilon
        # instead (livelock is bounded by prim exclusion plus the
        # _FILTER_RETRACE_CAP iteration cap, not by escalation)
        adv_t = jnp.where(same, jnp.maximum(t0 * 1e-5, 1e-6), hr.t)
        new_best = HitRecord(
            hit=jnp.where(accept, True, best.hit),
            t=jnp.where(accept, hr.t + t0, best.t),
            prim_id=jnp.where(accept, hr.prim_id, best.prim_id),
            geom_id=jnp.where(accept, hr.geom_id, best.geom_id),
            u=jnp.where(accept, hr.u, best.u),
            v=jnp.where(accept, hr.v, best.v))
        # nudge past the rejected hit; prim exclusion handles the exact-0 case
        t0 = jnp.where(rejected, t0 + adv_t * (1.0 + 1e-5) + 1e-7, t0)
        excl = jnp.where(rejected, hr.prim_id, -1)
        return new_best, t0, excl, rejected, k + 1

    init = (HitRecord.none(batch), jnp.zeros(batch, jnp.float32),
            jnp.full(batch, -1, jnp.int32), mtb > 0.0,
            jnp.int32(0))
    best, _, _, _, _ = jax.lax.while_loop(
        lambda s: jnp.any(s[3]) & (s[4] < _FILTER_RETRACE_CAP), step, init)

    # differentiable recompute at the winning primitive (original ray)
    pid = jnp.where(best.hit, best.prim_id, 0)
    v1, e1, e2 = mesh.corners()
    t, u, v, _ = intersect_triangle(
        ray.ori, ray.dir,
        jnp.take(v1, pid, axis=0), jnp.take(e1, pid, axis=0),
        jnp.take(e2, pid, axis=0))
    return HitRecord(
        hit=best.hit,
        t=jnp.where(best.hit, t, FLT_MAX),
        prim_id=pid.astype(jnp.int32),
        geom_id=jnp.take(mesh.geom_ids, pid),
        u=jnp.where(best.hit, u, 0.0),
        v=jnp.where(best.hit, v, 0.0),
    )


def closest_hit(ray: Ray, scene, use_bvh: Optional[bool] = None,
                hit_filter=None, binned: bool = False,
                max_t=None) -> HitRecord:
    """Closest-hit query over the whole scene (traverse_linear.inl:286-318).

    ``hit_filter``: custom-intersector hook, see intersect_triangles_brute.
    ``binned``: treelet-binned traversal on the Pallas tier — the fast path
    for INCOHERENT rays (diffuse bounces); requires a treelet-built
    ClusterBVH, silently falls back otherwise.  Coherent primary rays are
    faster unbinned.
    ``max_t``: optional per-lane search bound.  Lanes with max_t <= 0 are
    DEAD: on the Pallas tier they are dropped from the kernel tiles
    entirely (the live-ray compaction lever — retired path-tracer lanes
    must not pay traversal; cf. the reference's any(active_rays) early-out,
    pathtracing.inl:47-53); the jnp tier masks them after the fact.
    """
    best = HitRecord.none(ray.batch_shape)
    offset = 0
    if scene.mesh is not None:
        if use_bvh is None:
            use_bvh = scene.bvh is not None
        if use_bvh and _is_cluster_bvh(scene.bvh):
            from visionaray_tpu.ops.pallas.traverse import (
                binned_closest_hit, cluster_closest_hit,
            )
            mt = FLT_MAX if max_t is None else max_t
            if hit_filter is not None:
                # a filtered-out winner falls through to the NEXT hit
                # (reference in-traversal rejection semantics)
                hr = _cluster_closest_filtered(ray, scene.bvh, scene.mesh,
                                               hit_filter,
                                               _interpret_default(),
                                               max_t=mt)
            elif binned and scene.bvh.treelet_size > 0:
                hr = binned_closest_hit(ray, scene.bvh, scene.mesh,
                                        max_t=mt,
                                        interpret=_interpret_default())
            else:
                hr = cluster_closest_hit(ray, scene.bvh, scene.mesh,
                                         max_t=mt,
                                         interpret=_interpret_default())
        elif use_bvh:
            from visionaray_tpu.ops.traversal import bvh_closest_hit
            hr = bvh_closest_hit(ray, scene.bvh, scene.mesh,
                                 hit_filter=hit_filter)
        else:
            v1, e1, e2 = scene.mesh.corners()
            hr = intersect_triangles_brute(
                ray, v1, e1, e2, scene.mesh.geom_ids, offset,
                hit_filter=hit_filter)
        best = _merge(best, hr)
        offset += scene.num_triangles
    if scene.spheres is not None:
        if scene.sphere_bvh is not None:
            from visionaray_tpu.ops.traversal import sphere_bvh_closest_hit
            hr = sphere_bvh_closest_hit(ray, scene.sphere_bvh,
                                        scene.spheres,
                                        prim_offset=offset)
        else:
            hr = intersect_spheres_brute(
                ray, scene.spheres.center, scene.spheres.radius,
                scene.spheres.geom_ids, offset)
        best = _merge(best, hr)
        offset += scene.num_spheres
    if scene.planes is not None:
        hr = intersect_planes_brute(
            ray, scene.planes.normal, scene.planes.offset,
            scene.planes.geom_ids, offset)
        best = _merge(best, hr)
    if max_t is not None:
        # uniform bound across tiers (the Pallas paths also honor it
        # in-kernel; the jnp/brute paths only here)
        keep = best.hit & (best.t < max_t)
        best = HitRecord(
            hit=keep, t=jnp.where(keep, best.t, FLT_MAX),
            prim_id=best.prim_id, geom_id=best.geom_id,
            u=jnp.where(keep, best.u, 0.0), v=jnp.where(keep, best.v, 0.0))
    return best


def _shadow_m():
    """Occlusion-query treelet slots: any-hit rounds stop at the first
    hit, so fewer slots than the closest-hit path can win (sweep knob;
    docs/PERF.md round-5 ladder)."""
    import os
    from visionaray_tpu.ops.pallas.traverse import BIN_M
    # default 3 (vs BIN_M=6 on the closest path): swept with reversed
    # shadows at the step config — 2/3/4/5/6 -> 5.32/5.21/5.24/5.25/5.29
    # s/step (docs/PERF.md r5 ladder).  Coverage stays exact at any m
    # (the overflow slot subsumes the tail).
    v = os.environ.get("VSNRAY_SHADOW_M", "")
    return int(v) if v else 3


def any_hit(ray: Ray, scene, max_t, use_bvh: Optional[bool] = None,
            hit_filter=None, binned: bool = False) -> HitRecord:
    """Any-hit (occlusion) query with max_t (traverse_linear.inl:186-272).

    Semantics: a hit counts iff hit && 0 <= t < max_t.  The jnp tier computes
    the closest such hit (no early-out in lock-step lanes — same as the
    reference's SIMD packets which also keep traversing until all lanes
    terminate); the Pallas tier adds whole-tile early exit.  ``binned``:
    see closest_hit.
    """
    best = HitRecord.none(ray.batch_shape)
    offset = 0
    if scene.mesh is not None:
        if use_bvh is None:
            use_bvh = scene.bvh is not None
        if use_bvh and _is_cluster_bvh(scene.bvh):
            from visionaray_tpu.ops.pallas.traverse import (
                binned_any_hit, cluster_any_hit,
            )
            if hit_filter is not None:
                # occlusion through a filter = "any SURVIVING hit in
                # (0, max_t)": the closest surviving hit answers it
                # (filtered-out candidates fall through, so shadow rays see
                # through alpha-masked texels like the reference's
                # mask_intersector any-hit, examples/intersector/main.cpp)
                hr = _cluster_closest_filtered(ray, scene.bvh, scene.mesh,
                                               hit_filter,
                                               _interpret_default(),
                                               max_t=max_t)
            elif binned and scene.bvh.treelet_size > 0:
                hr = binned_any_hit(ray, scene.bvh, scene.mesh, max_t,
                                    interpret=_interpret_default(),
                                    m=_shadow_m())
            else:
                hr = cluster_any_hit(ray, scene.bvh, scene.mesh, max_t,
                                     interpret=_interpret_default())
        elif use_bvh:
            from visionaray_tpu.ops.traversal import bvh_any_hit
            hr = bvh_any_hit(ray, scene.bvh, scene.mesh, max_t,
                             hit_filter=hit_filter)
        else:
            v1, e1, e2 = scene.mesh.corners()
            hr = intersect_triangles_brute(
                ray, v1, e1, e2, scene.mesh.geom_ids, offset,
                hit_filter=hit_filter)
        best = update_if(best, hr, is_closer(hr, best.t, max_t))
        offset += scene.num_triangles
    if scene.spheres is not None:
        if scene.sphere_bvh is not None:
            from visionaray_tpu.ops.traversal import sphere_bvh_any_hit
            hr = sphere_bvh_any_hit(ray, scene.sphere_bvh, scene.spheres,
                                    max_t, prim_offset=offset)
        else:
            hr = intersect_spheres_brute(
                ray, scene.spheres.center, scene.spheres.radius,
                scene.spheres.geom_ids, offset)
        best = update_if(best, hr, is_closer(hr, best.t, max_t))
        offset += scene.num_spheres
    if scene.planes is not None:
        hr = intersect_planes_brute(
            ray, scene.planes.normal, scene.planes.offset,
            scene.planes.geom_ids, offset)
        best = update_if(best, hr, is_closer(hr, best.t, max_t))
    return best


def _cluster_multi_hit(ray: Ray, cbvh, mesh, k: int, interpret: bool):
    """Top-K triangle hits on the Pallas tier by iterative re-trace.

    K sequential closest-hit kernel launches, each starting just past the
    previous winner with that primitive excluded.  Surfaces coincident
    within the advance epsilon beyond the first are skipped (the jnp-tier
    bvh_multi_hit reports all of them); lanes that ran out of hits carry
    max_t = -1 and retire on their tile's first frustum test.

    Returns (t, hit, prim_id, geom_id, u, v) each (..., K), t-sorted by
    construction, differentiable by recompute.
    """
    from visionaray_tpu.ops.pallas.traverse import cluster_closest_hit

    sg = jax.lax.stop_gradient
    sray = Ray(ori=sg(ray.ori), dir=sg(ray.dir))
    batch = ray.batch_shape

    def slot(carry, _):
        t0, excl, live = carry
        o = sray.ori + sray.dir * t0[..., None]
        mt = jnp.where(live, FLT_MAX, -1.0)
        hr = cluster_closest_hit(Ray(ori=o, dir=sray.dir), cbvh, mesh,
                                 max_t=mt, interpret=interpret)
        ok = live & hr.hit & ~(hr.prim_id == excl)
        t_global = jnp.where(ok, hr.t + t0, FLT_MAX)
        new_t0 = jnp.where(ok, t0 + hr.t * (1.0 + 1e-6) + 1e-7, t0)
        return ((new_t0, jnp.where(ok, hr.prim_id, -1), ok),
                (t_global, ok, hr.prim_id))

    init = (jnp.zeros(batch, jnp.float32), jnp.full(batch, -1, jnp.int32),
            jnp.ones(batch, jnp.bool_))
    _, (t_k, hit_k, pid_k) = jax.lax.scan(slot, init, None, length=k)
    # scan stacks the K axis in front; move it to the back
    perm = tuple(range(1, 1 + len(batch))) + (0,)
    t_k = jnp.transpose(t_k, perm)
    hit_k = jnp.transpose(hit_k, perm)
    pid_k = jnp.transpose(pid_k, perm)

    pid = jnp.where(hit_k, pid_k, 0)
    v1, e1, e2 = mesh.corners()
    t, u, v, _ = intersect_triangle(
        ray.ori[..., None, :], ray.dir[..., None, :],
        jnp.take(v1, pid, axis=0), jnp.take(e1, pid, axis=0),
        jnp.take(e2, pid, axis=0))
    return (jnp.where(hit_k, t, FLT_MAX), hit_k, pid.astype(jnp.int32),
            jnp.take(mesh.geom_ids, pid), jnp.where(hit_k, u, 0.0),
            jnp.where(hit_k, v, 0.0))


def multi_hit(ray: Ray, scene, k: int = 16,
              use_bvh: Optional[bool] = None) -> HitRecord:
    """Top-K nearest hits per ray, sorted by t (multi_hit.h:32-58; N<=16).

    Returns a HitRecord whose fields have a trailing K axis; unused slots
    have hit=False, t=FLT_MAX.  Triangles go through the BVH when built
    (sorted-K insertion during traversal, traverse_linear.inl:333-380) or
    K re-traces on the Pallas tier; spheres/planes are swept linearly and
    merged by a final top-K.  Used by the transparency-compositing example
    (examples/multi_hit/main.cpp:186).
    """
    groups = []  # (t, hit, prim_id, geom_id, u, v) each (..., M_g)
    offset = 0
    if scene.mesh is not None:
        if use_bvh is None:
            use_bvh = scene.bvh is not None
        if use_bvh and _is_cluster_bvh(scene.bvh):
            groups.append(_cluster_multi_hit(ray, scene.bvh, scene.mesh, k,
                                             _interpret_default()))
        elif use_bvh:
            from visionaray_tpu.ops.traversal import bvh_multi_hit
            rec = bvh_multi_hit(ray, scene.bvh, scene.mesh, k)
            groups.append((rec.t, rec.hit, rec.prim_id, rec.geom_id,
                           rec.u, rec.v))
        else:
            v1, e1, e2 = scene.mesh.corners()
            o = ray.ori[..., None, :]
            d = ray.dir[..., None, :]
            t, u, v, hit = intersect_triangle(o, d, v1, e1, e2)
            pid = jnp.broadcast_to(
                jnp.arange(v1.shape[0], dtype=jnp.int32), t.shape)
            gid = jnp.broadcast_to(scene.mesh.geom_ids, t.shape)
            groups.append((t, hit, pid + offset, gid, u, v))
        offset += scene.num_triangles
    if scene.spheres is not None:
        o = ray.ori[..., None, :]
        d = ray.dir[..., None, :]
        t, hit = intersect_sphere(o, d, scene.spheres.center,
                                  scene.spheres.radius)
        pid = jnp.broadcast_to(
            jnp.arange(scene.num_spheres, dtype=jnp.int32), t.shape)
        gid = jnp.broadcast_to(scene.spheres.geom_ids, t.shape)
        z = jnp.zeros_like(t)
        groups.append((t, hit, pid + offset, gid, z, z))
        offset += scene.num_spheres
    if scene.planes is not None:
        o = ray.ori[..., None, :]
        d = ray.dir[..., None, :]
        t, hit = intersect_plane(o, d, scene.planes.normal,
                                 scene.planes.offset)
        pid = jnp.broadcast_to(
            jnp.arange(scene.num_planes, dtype=jnp.int32), t.shape)
        gid = jnp.broadcast_to(scene.planes.geom_ids, t.shape)
        z = jnp.zeros_like(t)
        groups.append((t, hit, pid + offset, gid, z, z))

    t = jnp.concatenate([g[0] for g in groups], axis=-1)
    hit = jnp.concatenate([g[1] for g in groups], axis=-1)
    pid = jnp.concatenate([g[2] for g in groups], axis=-1)
    gid = jnp.concatenate([g[3] for g in groups], axis=-1)
    u = jnp.concatenate([g[4] for g in groups], axis=-1)
    v = jnp.concatenate([g[5] for g in groups], axis=-1)

    valid = hit & (t >= 0.0)
    tt = jnp.where(valid, t, FLT_MAX)
    kk = min(k, tt.shape[-1])
    neg_topk, idx = jax.lax.top_k(-tt, kk)
    take = lambda a: jnp.take_along_axis(a, idx, axis=-1)
    tk = -neg_topk
    hitk = tk < FLT_MAX
    rec = HitRecord(hit=hitk, t=tk, prim_id=take(pid), geom_id=take(gid),
                    u=take(u), v=take(v))
    if kk < k:  # pad to the requested K
        pad = k - kk
        padf = lambda a, val: jnp.concatenate(
            [a, jnp.full(a.shape[:-1] + (pad,), val, a.dtype)], axis=-1)
        rec = HitRecord(
            hit=padf(rec.hit, False), t=padf(rec.t, FLT_MAX),
            prim_id=padf(rec.prim_id, 0), geom_id=padf(rec.geom_id, 0),
            u=padf(rec.u, 0.0), v=padf(rec.v, 0.0))
    return rec


def prim_type_of(scene, prim_id):
    """Map global prim ids to group tags (triangle/sphere/plane)."""
    nt = scene.num_triangles
    ns = scene.num_spheres
    return jnp.where(
        prim_id < nt, PRIM_TRIANGLE,
        jnp.where(prim_id < nt + ns, PRIM_SPHERE, PRIM_PLANE)).astype(jnp.int32)
