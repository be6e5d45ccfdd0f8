"""BVH traversal — jnp tier (correctness + autodiff oracle for Pallas tier).

Re-derives the reference's stack-based packet traversal
(detail/bvh/intersect.inl:25-134): a while_loop with a per-ray stack array,
ordered near-child-first descent, and is_closer-based hit updates.  Batched
over rays: under vmap/jit the loop runs lock-step with per-lane masks, the
exact analogue of the reference's SIMD packets.

Differentiability: the search itself is discrete, so it runs under
stop_gradient inside a while_loop; the returned (prim_id) is then used to
*recompute* the intersection differentiably at the winning primitive
(SURVEY.md §7 "recompute-based backward").  Gradients flow to vertices and
ray origins/directions with fixed hit topology.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from visionaray_tpu.core.types import FLT_MAX, HitRecord, Ray
from visionaray_tpu.ops.intersect import intersect_aabb, intersect_triangle

# Provably sufficient for any input (not a heuristic clamp): Karras radix
# tree depth <= 30 morton-prefix values + 32 index-tiebreak values + root
# = 63 (see ops/pallas/traverse.py STACK_DEPTH note and
# tests/test_lbvh.py::test_degenerate_layout_stack_bound).
STACK_DEPTH = 64


def _traverse_one(o, d, node_lo, node_hi, left, right, prim_isect,
                  prim_ids, max_t, any_hit_mode: bool,
                  hit_filter=None, leaf_first=None, leaf_count=None,
                  max_leaf_size: int = 1):
    """Single-ray stack traversal; vmapped over the ray batch.

    Returns (best_t, best_ref, hit) where best_ref is the index into
    prim_ids of the winning primitive (-1 if none).

    ``prim_isect(o, d, pid) -> (t, u, v, hit)`` is the leaf intersector —
    the build()-is-generic-over-primitive-type analogue of the reference
    (bvh.h:438-448 builds over any primitive with an aabb; intersect.inl
    dispatches to the primitive's intersect): triangles, spheres, or any
    custom primitive traverse the same tree.

    Leaves follow either BVH convention (ops/lbvh.BVH docstring): 1:1
    (``leaf_first is None``: leaf slot s = prim_ids[s]) or generalized
    multi-prim SBVH leaves (a static ``max_leaf_size``-bounded inner loop
    over prim_ids[leaf_first[s] : +leaf_count[s]], the analogue of the
    reference's leaf prim loop, detail/bvh/intersect.inl:108-129).
    """
    leaf_base = (node_lo.shape[0] + 1) // 2 - 1
    n_refs = prim_ids.shape[0]
    inv_d = 1.0 / d

    stack = jnp.zeros((STACK_DEPTH,), jnp.int32)
    # state: (node, sp, stack, best_t, best_leaf, done)
    root = jnp.int32(0 if leaf_base > 0 else leaf_base)
    state = (root, jnp.int32(0), stack, jnp.float32(max_t),
             jnp.int32(-1), jnp.bool_(False))

    def cond(s):
        return ~s[5]

    def leaf_prims(slot):
        """Yield (ref_index, valid) pairs for a leaf slot (static count)."""
        if leaf_first is None:
            yield slot, jnp.bool_(True)
        else:
            first = leaf_first[slot]
            cnt = leaf_count[slot]
            for j in range(max_leaf_size):
                yield (jnp.minimum(first + j, n_refs - 1), j < cnt)

    def body(s):
        node, sp, stack, best_t, best_leaf, done = s
        is_leaf = node >= leaf_base

        # ---- leaf: intersect its primitive(s), update best
        slot = jnp.maximum(node - leaf_base, 0)
        for ref, valid in leaf_prims(slot):
            pid = prim_ids[ref]
            t, u, v, hit = prim_isect(o, d, pid)
            if hit_filter is not None:
                hit = hit_filter(pid, t, u, v, hit)
            closer = is_leaf & valid & hit & (t >= 0.0) & (t < best_t)
            best_t = jnp.where(closer, t, best_t)
            best_leaf = jnp.where(closer, ref, best_leaf)
        found_any = (best_leaf >= 0) & any_hit_mode

        # ---- internal: test both children (intersect.inl:64-101)
        lc = left[jnp.minimum(node, leaf_base - 1)]
        rc = right[jnp.minimum(node, leaf_base - 1)]
        tn1, tf1, h1 = intersect_aabb(o, inv_d, node_lo[lc], node_hi[lc])
        tn2, tf2, h2 = intersect_aabb(o, inv_d, node_lo[rc], node_hi[rc])
        # is_closer for aabb (update_if.h:62-66): hit && tnear < best_t && tfar >= 0
        b1 = (~is_leaf) & h1 & (tn1 < best_t) & (tf1 >= 0.0)
        b2 = (~is_leaf) & h2 & (tn2 < best_t) & (tf2 >= 0.0)

        both = b1 & b2
        near_is_l = tn1 < tn2
        near = jnp.where(near_is_l, lc, rc)
        far = jnp.where(near_is_l, rc, lc)

        # push far child when both hit
        stack = jax.lax.cond(
            both, lambda st: st.at[jnp.minimum(sp, STACK_DEPTH - 1)].set(far),
            lambda st: st, stack)
        sp_after_push = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        next_node = jnp.where(
            both, near, jnp.where(b1, lc, jnp.where(b2, rc, -1)))

        # pop when: leaf processed, or no child hit
        need_pop = is_leaf | (next_node < 0)
        can_pop = sp_after_push > 0
        popped = stack[jnp.maximum(sp_after_push - 1, 0)]
        new_node = jnp.where(need_pop, jnp.where(can_pop, popped, 0),
                             next_node)
        new_sp = jnp.where(need_pop & can_pop, sp_after_push - 1,
                           sp_after_push)
        new_done = done | (need_pop & ~can_pop) | found_any
        return (new_node, new_sp, stack, best_t, best_leaf, new_done)

    _, _, _, best_t, best_leaf, _ = jax.lax.while_loop(cond, body, state)
    return best_t, best_leaf, best_leaf >= 0


def _tri_isect(mesh):
    """Per-ray triangle leaf intersector over a mesh's corner arrays."""
    v1, e1, e2 = mesh.corners()

    def isect(o, d, pid):
        return intersect_triangle(o, d, v1[pid], e1[pid], e2[pid])

    return isect


def _sphere_isect(spheres):
    """Per-ray sphere leaf intersector (u = v = 0, as in the brute sweep)."""
    from visionaray_tpu.ops.intersect import intersect_sphere
    center, radius = spheres.center, spheres.radius

    def isect(o, d, pid):
        t, hit = intersect_sphere(o, d, center[pid], radius[pid])
        z = jnp.zeros_like(t)
        return t, z, z, hit

    return isect


def _traverse_batch_isect(ray: Ray, bvh, prim_isect, max_t,
                          any_hit_mode: bool, hit_filter=None):
    """Generic batched traversal over any leaf intersector."""
    if bvh.num_nodes == 1:
        # degenerate tree (one leaf): intersect its primitive(s) directly
        bs = ray.batch_shape
        best_t = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), bs)
        best_ref = jnp.full(bs, -1, jnp.int32)
        for ref in range(bvh.num_prims):
            pid = bvh.prim_ids[ref]
            t, u, v, hit = prim_isect(ray.ori, ray.dir, pid)
            if hit_filter is not None:
                hit = hit_filter(jnp.full(t.shape, pid), t, u, v, hit)
            closer = hit & (t >= 0.0) & (t < best_t)
            best_t = jnp.where(closer, t, best_t)
            best_ref = jnp.where(closer, ref, best_ref)
        valid = best_ref >= 0
        return (jnp.where(valid, best_t, FLT_MAX), best_ref, valid)
    f = partial(_traverse_one,
                node_lo=bvh.node_lo, node_hi=bvh.node_hi,
                left=bvh.left, right=bvh.right,
                prim_isect=prim_isect, prim_ids=bvh.prim_ids,
                any_hit_mode=any_hit_mode, hit_filter=hit_filter,
                leaf_first=bvh.leaf_first, leaf_count=bvh.leaf_count,
                max_leaf_size=bvh.max_leaf_size)
    o = ray.ori.reshape(-1, 3)
    d = ray.dir.reshape(-1, 3)
    mt = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32),
                          o.shape[:1]).reshape(-1)
    best_t, best_leaf, hit = jax.vmap(lambda oo, dd, m: f(oo, dd, max_t=m))(
        o, d, mt)
    bs = ray.batch_shape
    return best_t.reshape(bs), best_leaf.reshape(bs), hit.reshape(bs)


def _traverse_batch(ray: Ray, bvh, mesh, max_t, any_hit_mode: bool,
                    hit_filter=None):
    return _traverse_batch_isect(ray, bvh, _tri_isect(mesh), max_t,
                                 any_hit_mode, hit_filter=hit_filter)


def bvh_closest_hit(ray: Ray, bvh, mesh, max_t=FLT_MAX,
                    hit_filter=None) -> HitRecord:
    """Closest hit through the BVH, differentiable by recompute.

    Phase 1 (stop_gradient): stack traversal finds the winning primitive.
    Phase 2 (differentiable): re-evaluate Moeller-Trumbore at that primitive
    so t/u/v carry gradients w.r.t. mesh.vertices and the ray.
    """
    sg = jax.lax.stop_gradient
    _, best_leaf, hit = _traverse_batch(
        Ray(sg(ray.ori), sg(ray.dir)),
        jax.tree_util.tree_map(sg, bvh),
        jax.tree_util.tree_map(sg, mesh), max_t, any_hit_mode=False,
        hit_filter=hit_filter)

    pid = jnp.take(bvh.prim_ids, jnp.maximum(best_leaf, 0))
    v1, e1, e2 = mesh.corners()
    t, u, v, _ = intersect_triangle(
        ray.ori, ray.dir,
        jnp.take(v1, pid, axis=0), jnp.take(e1, pid, axis=0),
        jnp.take(e2, pid, axis=0))
    return HitRecord(
        hit=hit,
        t=jnp.where(hit, t, FLT_MAX),
        prim_id=jnp.where(hit, pid, 0).astype(jnp.int32),
        geom_id=jnp.take(mesh.geom_ids, jnp.where(hit, pid, 0)),
        u=jnp.where(hit, u, 0.0),
        v=jnp.where(hit, v, 0.0),
    )


def _traverse_one_multi(o, d, node_lo, node_hi, left, right, tri_v1, tri_e1,
                        tri_e2, prim_ids, max_t, k: int, hit_filter=None):
    """Single-ray multi-hit traversal keeping a sorted K-array of hits.

    The reference's multi_hit traversal (traverse_linear.inl:333-380) with
    update_if = insert_sorted (detail/multi_hit.h:159-204): every leaf hit
    inserts into a t-sorted array of K records, and node culling tests
    tnear against the CURRENT WORST kept t (the array's last slot) instead
    of the single best — the array itself is the occlusion bound.

    Returns (ts (K,), leaves (K,)) with FLT_MAX / -1 in unused slots.
    """
    n = prim_ids.shape[0]
    leaf_base = n - 1
    inv_d = 1.0 / d
    idx_k = jnp.arange(k)

    stack = jnp.zeros((STACK_DEPTH,), jnp.int32)
    ts0 = jnp.full((k,), jnp.float32(max_t))
    ls0 = jnp.full((k,), -1, jnp.int32)
    root = jnp.int32(0 if n > 1 else leaf_base)
    state = (root, jnp.int32(0), stack, ts0, ls0, jnp.bool_(False))

    def insert_sorted(ts, ls, t, leaf, do):
        pos = jnp.sum((t >= ts).astype(jnp.int32))
        take = do & (pos < k)
        ts_shift = ts[jnp.maximum(idx_k - 1, 0)]
        new_ts = jnp.where(idx_k < pos, ts,
                           jnp.where(idx_k == pos, t, ts_shift))
        ls_shift = ls[jnp.maximum(idx_k - 1, 0)]
        new_ls = jnp.where(idx_k < pos, ls,
                           jnp.where(idx_k == pos, leaf, ls_shift))
        return (jnp.where(take, new_ts, ts), jnp.where(take, new_ls, ls))

    def cond(s):
        return ~s[5]

    def body(s):
        node, sp, stack, ts, ls, done = s
        is_leaf = node >= leaf_base

        sorted_idx = jnp.maximum(node - leaf_base, 0)
        pid = prim_ids[sorted_idx]
        t, u, v, hit = intersect_triangle(
            o, d, tri_v1[pid], tri_e1[pid], tri_e2[pid])
        if hit_filter is not None:
            hit = hit_filter(pid, t, u, v, hit)
        do = is_leaf & hit & (t >= 0.0) & (t < ts[k - 1])
        ts, ls = insert_sorted(ts, ls, t, sorted_idx, do)

        worst = ts[k - 1]
        lc = left[jnp.minimum(node, leaf_base - 1)]
        rc = right[jnp.minimum(node, leaf_base - 1)]
        tn1, tf1, h1 = intersect_aabb(o, inv_d, node_lo[lc], node_hi[lc])
        tn2, tf2, h2 = intersect_aabb(o, inv_d, node_lo[rc], node_hi[rc])
        b1 = (~is_leaf) & h1 & (tn1 < worst) & (tf1 >= 0.0)
        b2 = (~is_leaf) & h2 & (tn2 < worst) & (tf2 >= 0.0)

        both = b1 & b2
        near_is_l = tn1 < tn2
        near = jnp.where(near_is_l, lc, rc)
        far = jnp.where(near_is_l, rc, lc)
        stack = jax.lax.cond(
            both, lambda st: st.at[jnp.minimum(sp, STACK_DEPTH - 1)].set(far),
            lambda st: st, stack)
        sp_after_push = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH), sp)
        next_node = jnp.where(
            both, near, jnp.where(b1, lc, jnp.where(b2, rc, -1)))

        need_pop = is_leaf | (next_node < 0)
        can_pop = sp_after_push > 0
        popped = stack[jnp.maximum(sp_after_push - 1, 0)]
        new_node = jnp.where(need_pop, jnp.where(can_pop, popped, 0),
                             next_node)
        new_sp = jnp.where(need_pop & can_pop, sp_after_push - 1,
                           sp_after_push)
        new_done = done | (need_pop & ~can_pop)
        return (new_node, new_sp, stack, ts, ls, new_done)

    _, _, _, ts, ls, _ = jax.lax.while_loop(cond, body, state)
    return jnp.where(ls >= 0, ts, FLT_MAX), ls


def bvh_multi_hit(ray: Ray, bvh, mesh, k: int, max_t=FLT_MAX,
                  hit_filter=None) -> HitRecord:
    """Top-K nearest triangle hits through the BVH, sorted by t.

    Fields carry a trailing K axis; unused slots have hit=False, t=FLT_MAX.
    Differentiable by recompute at each recorded primitive.
    """
    sg = jax.lax.stop_gradient
    assert bvh.leaf_first is None, \
        "multi_hit needs a 1:1-leaf BVH (lbvh/sah); SBVH spatial splits " \
        "would record duplicated references"
    v1, e1, e2 = mesh.corners()
    f = partial(_traverse_one_multi,
                node_lo=sg(bvh.node_lo), node_hi=sg(bvh.node_hi),
                left=bvh.left, right=bvh.right,
                tri_v1=sg(v1), tri_e1=sg(e1), tri_e2=sg(e2),
                prim_ids=bvh.prim_ids, k=k, hit_filter=hit_filter)
    o = sg(ray.ori).reshape(-1, 3)
    d = sg(ray.dir).reshape(-1, 3)
    mt = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32),
                          o.shape[:1]).reshape(-1)
    ts, leaves = jax.vmap(lambda oo, dd, m: f(oo, dd, max_t=m))(o, d, mt)
    bs = ray.batch_shape
    leaves = leaves.reshape(bs + (k,))
    hit = leaves >= 0
    pid = jnp.take(bvh.prim_ids, jnp.maximum(leaves, 0))
    # differentiable recompute at each of the K recorded primitives
    t, u, v, _ = intersect_triangle(
        ray.ori[..., None, :], ray.dir[..., None, :],
        jnp.take(v1, pid, axis=0), jnp.take(e1, pid, axis=0),
        jnp.take(e2, pid, axis=0))
    return HitRecord(
        hit=hit,
        t=jnp.where(hit, t, FLT_MAX),
        prim_id=jnp.where(hit, pid, 0).astype(jnp.int32),
        geom_id=jnp.take(mesh.geom_ids, jnp.where(hit, pid, 0)),
        u=jnp.where(hit, u, 0.0),
        v=jnp.where(hit, v, 0.0),
    )


def bvh_any_hit(ray: Ray, bvh, mesh, max_t, hit_filter=None) -> HitRecord:
    """Occlusion query with early exit (exit_traversal.h:47-56 analogue)."""
    sg = jax.lax.stop_gradient
    best_t, best_leaf, hit = _traverse_batch(
        Ray(sg(ray.ori), sg(ray.dir)),
        jax.tree_util.tree_map(sg, bvh),
        jax.tree_util.tree_map(sg, mesh), max_t, any_hit_mode=True,
        hit_filter=hit_filter)
    pid = jnp.take(bvh.prim_ids, jnp.maximum(best_leaf, 0))
    return HitRecord(
        hit=hit,
        t=jnp.where(hit, best_t, FLT_MAX),
        prim_id=jnp.where(hit, pid, 0).astype(jnp.int32),
        geom_id=jnp.take(mesh.geom_ids, jnp.where(hit, pid, 0)),
        u=jnp.zeros_like(best_t), v=jnp.zeros_like(best_t),
    )


# ----------------------------------------------------------------------------
# Sphere BVH: the reference's build() is generic over primitive type — it
# builds (and traverses) BVHs over spheres too, including degenerate radii
# (bvh.h:438-448, detail/bvh/build.inl:165, test/unittests/bvh/build.cpp:
# 69-116).  build_lbvh_from_aabbs already accepts any AABBs; these wire the
# sphere leaf intersector into the same stack traversal.


def build_sphere_bvh(spheres):
    """LBVH over a Spheres group (lo/hi = center -/+ radius)."""
    from visionaray_tpu.ops.lbvh import build_lbvh_from_aabbs
    r = spheres.radius[:, None]
    return build_lbvh_from_aabbs(spheres.center - r, spheres.center + r)


def sphere_bvh_closest_hit(ray: Ray, bvh, spheres, max_t=FLT_MAX,
                           prim_offset: int = 0) -> HitRecord:
    """Closest sphere hit through the BVH, differentiable by recompute.

    ``prim_offset``: global prim-id base of the sphere group (scene ids run
    triangles -> spheres -> planes, core/scene.py docstring).
    """
    from visionaray_tpu.ops.intersect import intersect_sphere
    sg = jax.lax.stop_gradient
    _, best_leaf, hit = _traverse_batch_isect(
        Ray(sg(ray.ori), sg(ray.dir)),
        jax.tree_util.tree_map(sg, bvh),
        _sphere_isect(jax.tree_util.tree_map(sg, spheres)),
        max_t, any_hit_mode=False)
    pid = jnp.take(bvh.prim_ids, jnp.maximum(best_leaf, 0))
    # differentiable recompute at the winning sphere (fixed topology)
    t, _ = intersect_sphere(ray.ori, ray.dir,
                            jnp.take(spheres.center, pid, axis=0),
                            jnp.take(spheres.radius, pid))
    return HitRecord(
        hit=hit,
        t=jnp.where(hit, t, FLT_MAX),
        prim_id=jnp.where(hit, pid + prim_offset, 0).astype(jnp.int32),
        geom_id=jnp.take(spheres.geom_ids, jnp.where(hit, pid, 0)),
        u=jnp.zeros_like(t), v=jnp.zeros_like(t),
    )


def sphere_bvh_any_hit(ray: Ray, bvh, spheres, max_t,
                       prim_offset: int = 0) -> HitRecord:
    """Sphere occlusion query through the BVH with early exit."""
    sg = jax.lax.stop_gradient
    best_t, best_leaf, hit = _traverse_batch_isect(
        Ray(sg(ray.ori), sg(ray.dir)),
        jax.tree_util.tree_map(sg, bvh),
        _sphere_isect(jax.tree_util.tree_map(sg, spheres)),
        max_t, any_hit_mode=True)
    pid = jnp.take(bvh.prim_ids, jnp.maximum(best_leaf, 0))
    return HitRecord(
        hit=hit,
        t=jnp.where(hit, best_t, FLT_MAX),
        prim_id=jnp.where(hit, pid + prim_offset, 0).astype(jnp.int32),
        geom_id=jnp.take(spheres.geom_ids, jnp.where(hit, pid, 0)),
        u=jnp.zeros_like(best_t), v=jnp.zeros_like(best_t),
    )
