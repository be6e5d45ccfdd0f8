"""Cluster BVH: the Pallas-tier acceleration structure.

The reference's CUDA path is a 1-thread-per-ray megakernel over a deep
per-primitive BVH (detail/cuda_sched.inl:60-99 + bvh/intersect.inl).  A
TPU has (8,128) vector lanes, no per-lane control flow, and pays dearly for
random gathers — so the fast path restructures the tree instead of porting
the traversal:

- primitives are morton-sorted (reusing the LBVH order) and grouped into
  fixed-size clusters of K consecutive prims;
- a *small* LBVH is built over cluster AABBs — small enough that its packed
  node table lives entirely in SMEM (scalar memory);
- a ray tile traverses the top tree in consensus (one shared interval-hull
  frustum per tile, like the reference's packet traversal,
  bvh/intersect.inl:84-101), and for each visited leaf DMAs the cluster's K
  triangles (contiguous in HBM because of the sort) into SMEM and
  brute-force intersects all lanes against them — dense VPU work instead of
  divergent pointer chasing.

Treelets (``treelet_size`` > 0) — the incoherent-ray fix: the tree is built
as a composite whose shape guarantees every run of T consecutive clusters
(a *treelet*) is a complete subtree:

    rows [0, S-1)                    top radix tree over the S treelets
    rows [S-1, S-1 + S*(T-1))        per-treelet radix trees (T-1 rows each)
    rows [C-1, 2C-1)                 cluster leaves (same as before)

Same row count (2C-1), same kernel: entering at row 0 traverses everything
(the coherent path); entering at a treelet's root confines the traversal to
that treelet.  ops/pallas/traverse.py's binned path exploits this by
re-binning bounce rays per treelet and advancing their origins to the
treelet entry point, so each tile's interval hull covers one treelet's
neighbourhood instead of the whole scene.  This is the ray-stream
re-binning formulation (cf. the ray-stream tracing literature in
PAPERS.md).

Node table layout — one node per sublane row (Mosaic requires lane-dim
slices to be 128-aligned, so the lane offset must be static):
  nodes[n, c] for c in 0..7 = [lo.x lo.y lo.z hi.x hi.y hi.z left right]
  left/right child indices are stored as float *values* (exact for < 2^24
  nodes; value-cast avoids any denormal-flush hazard a bitcast would risk).
  Node n < C-1 is internal; n >= C-1 is the leaf of cluster n-(C-1).

Triangle table: 16-float records, 8 per 128-lane row so a cluster is a
fully lane-aligned HBM block (Mosaic DMA slices must be 128-aligned on the
lane dim):  tris[c, k // 8, (k % 8)*16 + j] with record
[v1 e1 e2 prim_id pad*6]; prim_id as a float value.  Padding prims have
e1 = e2 = 0 -> Moller-Trumbore div == 0 -> never hit.  Padding clusters
(tail of the last treelet) have empty (+inf/-inf) boxes -> never visited.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from visionaray_tpu.core.types import pytree_dataclass
from visionaray_tpu.ops.lbvh import (
    build_radix_tree, morton3d, refit, triangle_aabbs,
)

DEFAULT_CLUSTER_SIZE = 32
DEFAULT_TREELET_SIZE = 32
_SMEM_NODE_BUDGET = 750_000   # bytes of the 1 MiB SMEM granted to the
                              # node table (traverse.py keeps it in SMEM)
_MORTON_PAD = np.uint32((1 << 30) - 1)  # sorts padding clusters last


def pick_cluster_size(num_prims: int) -> int:
    """Smallest multiple-of-8 cluster size whose node table fits SMEM.

    Smaller clusters mean less wasted leaf work per visit (measured: K=32
    beats K=64/128 on the sponza-class scene); the floor is the SMEM
    budget: nodes = (2*ceil(F/K) - 1) rows of 28 bytes (6 f32 box cols +
    one packed i32 child col, traverse.py:_cluster_traverse).
    """
    k = 8
    while (2 * -(-num_prims // k) - 1) * 28 > _SMEM_NODE_BUDGET:
        k += 8
    return max(k, DEFAULT_CLUSTER_SIZE) if k > DEFAULT_CLUSTER_SIZE         else DEFAULT_CLUSTER_SIZE


@pytree_dataclass(static=("num_clusters", "cluster_size", "treelet_size",
                          "num_treelets", "heap", "half_boxes"))
class ClusterBVH:
    nodes: Any          # (2C-1, 8) f32 node table (one node per row)
    tris: Any           # (C, K//8, 128) f32: 8 x 16-float tri records per row
    num_clusters: int   # C (padded to num_treelets * treelet_size)
    cluster_size: int   # K
    treelet_size: int = 0        # T; 0 = single global tree (no treelets)
    num_treelets: int = 0        # S
    treelet_lo: Any = None       # (S, 3) treelet AABBs (binning pass 1)
    treelet_hi: Any = None       # (S, 3)
    treelet_roots: Any = None    # (S,) i32 node-table rows of treelet roots
    heap: bool = False           # complete-heap layout (kd build): children
                                 # of i at 2i+1/2i+2; enables BVH4 descent
    half_boxes: bool = False     # records 0/1 pad cols 10..15 carry the
                                 # two half-cluster AABBs (kernel half-skip)

    @property
    def num_prims(self):
        return self.num_clusters * self.cluster_size  # incl. padding

    def tri_records(self):
        """View the packed table as (C, K, 16) records (tests/debug)."""
        C = self.num_clusters
        K = self.cluster_size
        return self.tris.reshape(C, K // 8, 8, 16).reshape(C, K, 16)


def _sorted_cluster_data(v1, e1, e2, K: int):
    """Morton-sort prims, group into K-clusters; returns (C, tri_cols,
    cl_lo, cl_hi, cl_codes) with clusters sorted by their own codes."""
    v1 = jax.lax.stop_gradient(v1)
    e1 = jax.lax.stop_gradient(e1)
    e2 = jax.lax.stop_gradient(e2)
    F = v1.shape[0]
    lo, hi = triangle_aabbs(v1, e1, e2)

    centroid = 0.5 * (lo + hi)
    scene_lo = jnp.min(lo, axis=0)
    scene_hi = jnp.max(hi, axis=0)
    extent = jnp.maximum(scene_hi - scene_lo, 1e-9)
    codes = morton3d((centroid - scene_lo) / extent)
    order = jnp.argsort(codes).astype(jnp.int32)

    C = -(-F // K)
    pad = C * K - F
    gather = lambda a: jnp.take(a, order, axis=0)
    v1s, e1s, e2s = gather(v1), gather(e1), gather(e2)
    prim_ids = order
    if pad:
        padv = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        v1s, e1s, e2s = padv(v1s), padv(e1s), padv(e2s)
        prim_ids = jnp.concatenate(
            [prim_ids, jnp.zeros((pad,), jnp.int32)], axis=0)
        los = jnp.concatenate(
            [gather(lo), jnp.full((pad, 3), jnp.inf, jnp.float32)], axis=0)
        his = jnp.concatenate(
            [gather(hi), jnp.full((pad, 3), -jnp.inf, jnp.float32)], axis=0)
    else:
        los, his = gather(lo), gather(hi)

    cl_lo = jnp.min(los.reshape(C, K, 3), axis=1)
    cl_hi = jnp.max(his.reshape(C, K, 3), axis=1)
    cl_lo = jnp.where(jnp.isfinite(cl_lo), cl_lo, 0.0)
    cl_hi = jnp.where(jnp.isfinite(cl_hi), cl_hi, 0.0)

    cl_centroid = 0.5 * (cl_lo + cl_hi)
    cl_codes = morton3d((cl_centroid - scene_lo) / extent)
    cl_order = jnp.argsort(cl_codes).astype(jnp.int32)

    assert K % 8 == 0, "cluster_size must be a multiple of 8"
    tri_cols = jnp.concatenate([
        v1s.reshape(C, K, 3), e1s.reshape(C, K, 3), e2s.reshape(C, K, 3),
        prim_ids.reshape(C, K, 1).astype(jnp.float32),
        jnp.zeros((C, K, 6), jnp.float32),
    ], axis=-1)  # (C, K, 16)
    tri_cols = jnp.take(tri_cols, cl_order, axis=0)
    cl_lo = jnp.take(cl_lo, cl_order, axis=0)
    cl_hi = jnp.take(cl_hi, cl_order, axis=0)
    cl_codes = jnp.take(cl_codes, cl_order)
    return C, tri_cols, cl_lo, cl_hi, cl_codes


def build_cluster_bvh(mesh, cluster_size: int = 0,
                      treelet_size: int = 0,
                      sah_axis: bool = True) -> ClusterBVH:
    """Build the cluster structure on device (jit-compatible).

    ``cluster_size`` 0 = auto (pick_cluster_size: smallest K whose node
    table fits the SMEM budget).  ``treelet_size`` T > 0 builds the
    treelet-composite tree (see module docstring); 0 keeps one global
    radix tree (the round-1 structure).  ``sah_axis``: SAH-scored axis
    choice per kd split (_kd_sort; measured faster, keep on).
    """
    v1, e1, e2 = mesh.corners()
    return build_cluster_bvh_from_corners(v1, e1, e2,
                                          cluster_size=cluster_size,
                                          treelet_size=treelet_size,
                                          sah_axis=sah_axis)


def build_cluster_bvh_from_corners(v1, e1, e2, cluster_size: int = 0,
                                   treelet_size: int = 0,
                                   sah_axis: bool = True) -> ClusterBVH:
    """build_cluster_bvh over raw (v1, e1, e2) corner arrays — the entry
    point for per-shard soup meshes (parallel/ring.py); vmappable."""
    K = cluster_size or pick_cluster_size(v1.shape[0])
    # prim ids ride the kernel as f32 VALUES (exact only below 2^24);
    # larger meshes must be geometry-sharded (parallel/ring.py) so each
    # shard stays under the limit
    if v1.shape[0] >= (1 << 24):
        raise ValueError(
            f"ClusterBVH holds prim ids as f32 (exact < 2^24); got "
            f"{v1.shape[0]} prims — shard the geometry instead "
            f"(visionaray_tpu.parallel.ring)")
    if treelet_size > 0:
        return _build_kd_tree(v1, e1, e2, K, treelet_size,
                              sah_axis=sah_axis)
    C, tri_cols, cl_lo, cl_hi, cl_codes = _sorted_cluster_data(v1, e1, e2, K)
    return _build_single_tree(C, K, tri_cols, cl_lo, cl_hi, cl_codes)


def _build_single_tree(C, K, tri_cols, cl_lo, cl_hi, cl_codes):
    left, right, _parent = build_radix_tree(cl_codes)
    node_lo, node_hi = refit(left, right, cl_lo, cl_hi)
    if C > 1:
        lf = jnp.concatenate([left.astype(jnp.float32),
                              jnp.zeros((C,), jnp.float32)])
        rf = jnp.concatenate([right.astype(jnp.float32),
                              jnp.zeros((C,), jnp.float32)])
    else:
        lf = jnp.zeros((1,), jnp.float32)
        rf = jnp.zeros((1,), jnp.float32)
    nodes = jnp.stack([
        node_lo[:, 0], node_lo[:, 1], node_lo[:, 2],
        node_hi[:, 0], node_hi[:, 1], node_hi[:, 2],
        lf, rf,
    ], axis=1)
    tris = tri_cols.reshape(C, K // 8, 128)
    return ClusterBVH(nodes=nodes, tris=tris, num_clusters=int(C),
                      cluster_size=K)


def _kd_sort(cent, levels: int, tri_lo=None, tri_hi=None):
    """Balanced kd permutation: recursively median-split equal segments.

    Morton-run clusters/treelets were measured useless on architectural
    scenes: treelet boxes overlapped 4.2x (a random interior point sat
    inside ~4.2 of them; one treelet spanned 25% of the scene), so the
    binned path's entry-distance culling never fired.  Median splits give
    compact, minimally-overlapping boxes at every granularity and the
    recursion tree IS the BVH (a complete binary heap).

    Axis choice: with ``tri_lo``/``tri_hi`` given, each segment evaluates
    the median split on ALL THREE axes and keeps the one minimizing the
    children's summed surface area — the SAH objective restricted to
    equal-count splits (the equal-count restriction keeps the heap
    complete; cf. the reference's binned SAH sweep, detail/bvh/sah.h:
    308-367, which also scores candidate partitions by child SA).
    Without them, the axis is the segment's longest centroid extent (the
    classic kd heuristic; cheaper, looser boxes).

    ``cent``: (n, 3) centroids, n divisible by 2^levels; padding entries
    must carry +3e38 (and tri_lo=+inf / tri_hi=-inf) so they sink to the
    tail segment and never dilate a box.  Returns (n,) perm.
    """
    n = cent.shape[0]
    perm = jnp.arange(n, dtype=jnp.int32)
    use_sah = tri_lo is not None

    def half_sa(lo_h, hi_h):
        d = jnp.maximum(jnp.max(hi_h, axis=1) - jnp.min(lo_h, axis=1), 0.0)
        return (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                + d[..., 2] * d[..., 0])

    for lvl in range(levels):
        n_seg = 1 << lvl
        seg = n // n_seg
        c = jnp.take(cent, perm, axis=0).reshape(n_seg, seg, 3)
        if use_sah and seg >= 2:
            lo_p = jnp.take(tri_lo, perm, axis=0).reshape(n_seg, seg, 3)
            hi_p = jnp.take(tri_hi, perm, axis=0).reshape(n_seg, seg, 3)
            half = seg // 2
            orders = []
            costs = []
            for a in range(3):
                order_a = jnp.argsort(c[..., a], axis=1).astype(jnp.int32)
                lo_s = jnp.take_along_axis(lo_p, order_a[..., None], axis=1)
                hi_s = jnp.take_along_axis(hi_p, order_a[..., None], axis=1)
                costs.append(half_sa(lo_s[:, :half], hi_s[:, :half])
                             + half_sa(lo_s[:, half:], hi_s[:, half:]))
                orders.append(order_a)
            best = jnp.argmin(jnp.stack(costs), axis=0)   # (n_seg,)
            order = jnp.where(
                (best == 0)[:, None], orders[0],
                jnp.where((best == 1)[:, None], orders[1], orders[2]))
        else:
            finite = c[..., 0] < 1e38
            lo = jnp.where(finite[..., None], c, 3e38).min(axis=1)
            hi = jnp.where(finite[..., None], c, -3e38).max(axis=1)
            axis = jnp.argmax(hi - lo, axis=-1)
            key = jnp.take_along_axis(
                c, axis[:, None, None].astype(jnp.int32), axis=-1)[..., 0]
            order = jnp.argsort(key, axis=1)
        perm = jnp.take_along_axis(
            perm.reshape(n_seg, seg), order, axis=1).reshape(-1)
    return perm


def _build_kd_tree(v1, e1, e2, K: int, T: int,
                   sah_axis: bool = True) -> ClusterBVH:
    """Full kd build: triangles kd-sorted into 2^L clusters of K, the tree
    a complete binary heap over the clusters.

    Heap layout coincides exactly with the kernel's unified layout:
    internal nodes [0, C-1), leaf of cluster c at row (C-1)+c, children of
    internal i at 2i+1 / 2i+2.  Depth log2(C) <= 14 (stack-safe), treelet
    roots are simply the heap level with S nodes.
    """
    assert T & (T - 1) == 0, "treelet_size must be a power of two"
    F = v1.shape[0]
    Cp = 1 << max(1, int(np.ceil(np.log2(-(-F // K)))))
    S = Cp // T
    if S <= 1:
        C, tri_cols, cl_lo, cl_hi, cl_codes = _sorted_cluster_data(
            v1, e1, e2, K)
        return _build_single_tree(C, K, tri_cols, cl_lo, cl_hi, cl_codes)
    Fp = Cp * K

    v1 = jax.lax.stop_gradient(v1)
    e1 = jax.lax.stop_gradient(e1)
    e2 = jax.lax.stop_gradient(e2)
    lo, hi = triangle_aabbs(v1, e1, e2)
    cent = 0.5 * (lo + hi)
    pad = Fp - F
    if pad:
        padv = lambda a, val: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], val, a.dtype)], axis=0)
        v1 = padv(v1, 0.0)
        e1 = padv(e1, 0.0)   # zero edges: Moller-Trumbore div==0, never hit
        e2 = padv(e2, 0.0)
        lo = padv(lo, jnp.inf)
        hi = padv(hi, -jnp.inf)
        cent = padv(cent, 3e38)  # sinks padding to the tail segment

    perm = _kd_sort(cent, int(np.log2(Cp)),
                    tri_lo=lo if sah_axis else None,
                    tri_hi=hi if sah_axis else None)
    take = lambda a: jnp.take(a, perm, axis=0)
    v1s, e1s, e2s = take(v1), take(e1), take(e2)
    prim_ids = jnp.where(perm < F, perm, 0)
    los, his = take(lo), take(hi)

    cl_lo = jnp.min(los.reshape(Cp, K, 3), axis=1)
    cl_hi = jnp.max(his.reshape(Cp, K, 3), axis=1)
    cl_lo = jnp.where(jnp.isfinite(cl_lo), cl_lo, 1e30)
    cl_hi = jnp.where(jnp.isfinite(cl_hi), cl_hi, -1e30)

    left = 2 * jnp.arange(Cp - 1, dtype=jnp.int32) + 1
    right = 2 * jnp.arange(Cp - 1, dtype=jnp.int32) + 2
    node_lo, node_hi = refit(left, right, cl_lo, cl_hi)
    node_lo = jnp.where(jnp.isfinite(node_lo), node_lo, 1e30)
    node_hi = jnp.where(jnp.isfinite(node_hi), node_hi, -1e30)

    assert K % 8 == 0, "cluster_size must be a multiple of 8"
    tri_cols = jnp.concatenate([
        v1s.reshape(Cp, K, 3), e1s.reshape(Cp, K, 3), e2s.reshape(Cp, K, 3),
        prim_ids.reshape(Cp, K, 1).astype(jnp.float32),
        jnp.zeros((Cp, K, 6), jnp.float32),
    ], axis=-1)
    half_boxes = K >= 16
    if half_boxes:
        # the kd order makes the cluster's two K/2 halves its own kd
        # children — spatially compact sub-boxes.  Ride them in the pad
        # cols of records 0/1 (10..15 = lo.xyz hi.xyz) so the leaf DMA
        # delivers them to SMEM for the kernel's half-skip test; padding
        # halves get EMPTY boxes (lo > hi), so their MT skips for free.
        h_lo = los.reshape(Cp, 2, K // 2, 3).min(axis=2)
        h_hi = his.reshape(Cp, 2, K // 2, 3).max(axis=2)
        h_lo = jnp.where(jnp.isfinite(h_lo), h_lo, 1e30)
        h_hi = jnp.where(jnp.isfinite(h_hi), h_hi, -1e30)
        for h in range(2):
            tri_cols = tri_cols.at[:, h, 10:13].set(h_lo[:, h])
            tri_cols = tri_cols.at[:, h, 13:16].set(h_hi[:, h])
    tris = tri_cols.reshape(Cp, K // 8, 128)

    lf = jnp.concatenate([left.astype(jnp.float32),
                          jnp.zeros((Cp,), jnp.float32)])
    rf = jnp.concatenate([right.astype(jnp.float32),
                          jnp.zeros((Cp,), jnp.float32)])
    nodes = jnp.stack([
        node_lo[:, 0], node_lo[:, 1], node_lo[:, 2],
        node_hi[:, 0], node_hi[:, 1], node_hi[:, 2],
        lf, rf,
    ], axis=1)  # (2Cp-1, 8)

    troot_rows = (S - 1) + jnp.arange(S, dtype=jnp.int32)
    return ClusterBVH(
        nodes=nodes, tris=tris, num_clusters=int(Cp), cluster_size=K,
        treelet_size=int(T), num_treelets=int(S),
        treelet_lo=node_lo[S - 1: 2 * S - 1],
        treelet_hi=node_hi[S - 1: 2 * S - 1],
        treelet_roots=troot_rows, heap=True, half_boxes=bool(half_boxes),
    )
