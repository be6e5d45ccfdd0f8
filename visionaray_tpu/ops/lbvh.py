"""LBVH: on-device linear BVH construction (morton sort + Karras'12 linking).

The reference builds a binned-SAH BVH recursively on the host
(detail/bvh/build.inl:29-81, detail/bvh/sah.h:150-763).  Recursive
partitioning is TPU-hostile (dynamic shapes, host round-trips), so the
TPU-native builder is an LBVH: every stage is an O(N) or O(N log N) data-
parallel primitive that XLA maps onto the chip:

  1. primitive AABBs + centroids                 (elementwise)
  2. 30-bit morton codes of normalized centroids (elementwise bit tricks)
  3. sort prims by code                          (jnp.argsort / lax.sort)
  4. Karras'12 radix-tree linking: each internal node found independently by
     binary search over common-prefix lengths    (vectorized, no recursion)
  5. bottom-up AABB refit by fixpoint sweeps     (gather + min/max, ~tree
     height iterations inside a while_loop)

Node layout (SoA, matching the reference's 32-byte bvh_node density goals,
bvh.h:52-119, but struct-of-arrays for TPU lanes):
  - internal nodes occupy indices [0, N-1); leaves [N-1, 2N-1).
  - ``left``/``right`` index into the unified node array.
  - leaf k (node index N-1+k) references primitive ``prim_ids[k]``.

An optional host-side binned-SAH builder for maximum tree quality lives in
ops/sah.py (native C++ path); both produce this same BVH pytree.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from visionaray_tpu.core.types import pytree_dataclass


@pytree_dataclass(static=("max_leaf_size",))
class BVH:
    """Flat SoA BVH over one primitive group.

    Two leaf conventions share this container:
    - 1:1 (LBVH, plain SAH): ``leaf_first is None``; leaf slot s owns
      primitive ``prim_ids[s]`` — N leaves, N prims.
    - generalized (SBVH, ops/sah.py:build_sbvh): leaf slot s covers
      ``prim_ids[leaf_first[s] : leaf_first[s]+leaf_count[s]]``; spatial
      splits may reference one primitive from several leaves, so
      ``len(prim_ids) >= num_leaves`` (reference: sah.h:430-615 spatial
      duplication, build.inl:139 max_leaf_size).
    """

    node_lo: Any    # (2L-1, 3) f32
    node_hi: Any    # (2L-1, 3) f32
    left: Any       # (L-1,) i32 child node index
    right: Any      # (L-1,) i32
    parent: Any     # (2L-1,) i32 (root = -1); for refit/traverse_parents
    prim_ids: Any   # 1:1 -> (L,) i32; generalized -> (R,) i32 refs
    leaf_first: Any = None   # (L,) i32 or None (1:1 convention)
    leaf_count: Any = None   # (L,) i32 or None
    max_leaf_size: int = 1   # static bound on leaf_count

    @property
    def num_prims(self):
        return self.prim_ids.shape[0]

    @property
    def num_leaves(self):
        return (self.node_lo.shape[0] + 1) // 2

    @property
    def num_nodes(self):
        return self.node_lo.shape[0]


def _expand_bits(v):
    """Spread 10 bits to every 3rd position (standard morton bit trick)."""
    v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
    v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
    v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
    v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
    return v


def morton3d(p):
    """30-bit morton code of points p in [0,1)^3. p: (..., 3) -> uint32."""
    q = jnp.clip(p * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (_expand_bits(q[..., 0]) << 2) | (_expand_bits(q[..., 1]) << 1) \
        | _expand_bits(q[..., 2])


def triangle_aabbs(v1, e1, e2):
    """Per-triangle AABBs from v1/e1/e2 form."""
    p0 = v1
    p1 = v1 + e1
    p2 = v1 + e2
    lo = jnp.minimum(jnp.minimum(p0, p1), p2)
    hi = jnp.maximum(jnp.maximum(p0, p1), p2)
    return lo, hi


def _delta_fn(codes, idx):
    """delta(i, j): length of common prefix of keys i and j, with the sorted
    index as tiebreak for equal codes (Karras'12 §4).  Out-of-range j -> -1.

    Returns a function delta(i, j) over int32 arrays.
    """
    n = codes.shape[0]

    def delta(i, j):
        valid = (j >= 0) & (j < n)
        jc = jnp.clip(j, 0, n - 1)
        ci = codes[i]
        cj = codes[jc]
        x = ci ^ cj
        d = jax.lax.clz(x.astype(jnp.int32)).astype(jnp.int32)
        # equal codes: tiebreak on index bits (adds 32)
        xi = (idx[i] ^ idx[jc]).astype(jnp.int32)
        d_eq = 32 + jax.lax.clz(xi)
        d = jnp.where(x == 0, d_eq, d)
        return jnp.where(valid, d, -1)

    return delta


def build_radix_tree(codes_sorted):
    """Karras'12 parallel radix-tree linking.

    Returns (left, right, parent): left/right are node indices in the unified
    layout (internal [0, N-1), leaves [N-1, 2N-1)); parent covers all nodes.
    """
    n = codes_sorted.shape[0]
    if n == 1:
        return (jnp.zeros((0,), jnp.int32), jnp.zeros((0,), jnp.int32),
                jnp.array([-1], jnp.int32))
    i = jnp.arange(n - 1, dtype=jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    delta = _delta_fn(codes_sorted, idx)

    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    delta_min = delta(i, i - d)

    # upper bound for range length: double until delta drops (clamped to
    # avoid int32 overflow; 2n always suffices)
    n_doublings = max(2, int(np.ceil(np.log2(max(n, 2)))) + 1)
    lmax = jnp.full_like(i, 2)
    for _ in range(n_doublings):
        cond = delta(i, i + lmax * d) > delta_min
        lmax = jnp.where(cond, jnp.minimum(lmax * 2, 2 * n), lmax)

    # binary search the exact other end j = i + l*d
    l = jnp.zeros_like(i)
    t = lmax // 2
    for _ in range(n_doublings + 1):
        cond = (t >= 1) & (delta(i, i + (l + t) * d) > delta_min)
        l = jnp.where(cond, l + t, l)
        t = t // 2
    j = i + l * d

    # binary search the split position
    delta_node = delta(i, j)
    s = jnp.zeros_like(i)
    t = (l + 1) // 2  # ceil(l/2)
    for _ in range(n_doublings + 1):
        cond = (t >= 1) & (delta(i, i + (s + t) * d) > delta_node)
        s = jnp.where(cond, s + t, s)
        # t = ceil(t/2) but stop at 1 (then 0)
        t = jnp.where(t > 1, (t + 1) // 2, 0)
    gamma = i + s * d + jnp.minimum(d, 0)

    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    # child is a leaf iff it covers a single sorted position
    left_is_leaf = lo == gamma
    right_is_leaf = hi == gamma + 1
    leaf_base = jnp.int32(n - 1)
    left = jnp.where(left_is_leaf, leaf_base + gamma, gamma).astype(jnp.int32)
    right = jnp.where(right_is_leaf, leaf_base + gamma + 1,
                      gamma + 1).astype(jnp.int32)

    parent = jnp.full((2 * n - 1,), -1, jnp.int32)
    parent = parent.at[left].set(i)
    parent = parent.at[right].set(i)
    return left, right, parent


def refit(left, right, leaf_lo, leaf_hi, max_iters: int = 64):
    """Bottom-up AABB fit by fixpoint sweeps.

    Internal boxes start empty; sweep k makes all nodes of height <= k
    correct; loop exits when a sweep changes nothing (tree height reached).
    Atomics-free alternative to the per-node-counter scheme GPUs use.
    """
    n = leaf_lo.shape[0]
    if n == 1:
        return leaf_lo, leaf_hi
    big = jnp.float32(3.4e38)
    int_lo = jnp.full((n - 1, 3), big)
    int_hi = jnp.full((n - 1, 3), -big)

    def sweep(state):
        lo, hi, _, it = state
        cl = jnp.take(lo, left, axis=0)
        ch = jnp.take(hi, left, axis=0)
        rl = jnp.take(lo, right, axis=0)
        rh = jnp.take(hi, right, axis=0)
        new_int_lo = jnp.minimum(cl, rl)
        new_int_hi = jnp.maximum(ch, rh)
        new_lo = lo.at[: n - 1].set(new_int_lo)
        new_hi = hi.at[: n - 1].set(new_int_hi)
        changed = jnp.any(new_lo != lo) | jnp.any(new_hi != hi)
        return new_lo, new_hi, changed, it + 1

    lo0 = jnp.concatenate([int_lo, leaf_lo], axis=0)
    hi0 = jnp.concatenate([int_hi, leaf_hi], axis=0)
    lo, hi, _, _ = jax.lax.while_loop(
        lambda s: s[2] & (s[3] < max_iters),
        sweep, (lo0, hi0, jnp.bool_(True), jnp.int32(0)))
    return lo, hi


def build_lbvh_from_aabbs(prim_lo, prim_hi) -> BVH:
    """Build an LBVH over primitive AABBs (any primitive type)."""
    prim_lo = jax.lax.stop_gradient(prim_lo)
    prim_hi = jax.lax.stop_gradient(prim_hi)
    n = prim_lo.shape[0]
    centroid = 0.5 * (prim_lo + prim_hi)
    scene_lo = jnp.min(prim_lo, axis=0)
    scene_hi = jnp.max(prim_hi, axis=0)
    extent = jnp.maximum(scene_hi - scene_lo, 1e-9)
    codes = morton3d((centroid - scene_lo) / extent)

    order = jnp.argsort(codes).astype(jnp.int32)
    codes_sorted = jnp.take(codes, order)

    left, right, parent = build_radix_tree(codes_sorted)
    leaf_lo = jnp.take(prim_lo, order, axis=0)
    leaf_hi = jnp.take(prim_hi, order, axis=0)
    node_lo, node_hi = refit(left, right, leaf_lo, leaf_hi)
    return BVH(node_lo=node_lo, node_hi=node_hi, left=left, right=right,
               parent=parent, prim_ids=order)


def build_lbvh(mesh) -> BVH:
    """Build an LBVH over a TriangleMesh (the config-#4 on-device build)."""
    v1, e1, e2 = mesh.corners()
    lo, hi = triangle_aabbs(v1, e1, e2)
    return build_lbvh_from_aabbs(lo, hi)


# ----------------------------------------------------------------------------
# Introspection / quality metrics (reference detail/bvh/statistics.h:38-103
# and traverse.h depth-first utilities) — host-side, for tests and tuning.


def sah_cost(bvh: BVH, ci: float = 1.2, ct: float = 1.0) -> float:
    """Surface-area-heuristic cost of the built tree (statistics.h:38,
    Karras-Aila'13 constants: ci=1.2 per-intersection)."""
    lo = np.asarray(bvh.node_lo)
    hi = np.asarray(bvh.node_hi)
    ext = np.maximum(hi - lo, 0.0)
    area = 2.0 * (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
                  + ext[:, 2] * ext[:, 0])
    nl = bvh.num_leaves
    root_area = max(float(area[0] if nl > 1 else area[-1]), 1e-30)
    internal = area[: nl - 1].sum() / root_area if nl > 1 else 0.0
    if bvh.leaf_count is None:
        leaves = area[nl - 1:].sum() / root_area
    else:
        # generalized leaves: each leaf pays ci per primitive it holds
        cnt = np.asarray(bvh.leaf_count, np.float64)
        leaves = (area[nl - 1:] * cnt).sum() / root_area
    return float(ct * internal + ci * leaves)


def validate(bvh: BVH, prim_lo, prim_hi) -> dict:
    """Structural invariants (analogue of test/unittests/bvh/build.cpp):
    every prim in exactly one leaf; parent boxes contain children; every
    non-root node has exactly one parent."""
    n = bvh.num_prims
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    lo = np.asarray(bvh.node_lo)
    hi = np.asarray(bvh.node_hi)
    out = {}
    out["prims_permutation"] = (
        np.sort(np.asarray(bvh.prim_ids)) == np.arange(n)).all()
    if n > 1:
        children = np.concatenate([left, right])
        out["each_node_one_parent"] = (
            np.sort(children) == np.arange(1, 2 * n - 1)).all()
        cl_lo = lo[left]
        cr_lo = lo[right]
        cl_hi = hi[left]
        cr_hi = hi[right]
        out["parent_contains_children"] = bool(
            (lo[: n - 1] <= np.minimum(cl_lo, cr_lo) + 1e-6).all()
            and (hi[: n - 1] >= np.maximum(cl_hi, cr_hi) - 1e-6).all())
    plo = np.asarray(prim_lo)[np.asarray(bvh.prim_ids)]
    phi = np.asarray(prim_hi)[np.asarray(bvh.prim_ids)]
    out["leaves_match_prims"] = bool(
        np.allclose(lo[n - 1:], plo) and np.allclose(hi[n - 1:], phi))
    return out


def traverse_depth_first(bvh: BVH, visit, node: int = 0):
    """Host-side depth-first walk calling ``visit(node_index, is_leaf)``
    (reference detail/bvh/traverse.h:34-58, stack<64> variant).

    Left child first, like the reference's ordered push.  Debug/statistics
    utility — runs in python on fetched arrays, not under jit.
    """
    import numpy as np

    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    n_internal = left.shape[0]
    stack = [int(node)]
    while stack:
        n = stack.pop()
        is_leaf = n >= n_internal
        visit(n, is_leaf)
        if not is_leaf:
            stack.append(int(right[n]))   # right popped after left
            stack.append(int(left[n]))


def traverse_leaves(bvh: BVH, visit, node: int = 0):
    """Visit only leaves, depth first (traverse.h:61-70)."""
    traverse_depth_first(
        bvh, lambda n, is_leaf: visit(n) if is_leaf else None, node)


def traverse_parents(bvh: BVH, node: int, visit):
    """Walk parent links from ``node`` to the root (traverse.h:149-169)."""
    import numpy as np

    parent = np.asarray(bvh.parent)
    n = int(parent[node])
    while n >= 0:
        visit(n)
        n = int(parent[n])
