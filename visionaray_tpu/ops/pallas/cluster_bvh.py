"""Cluster BVH: the Pallas-tier acceleration structure.

The reference's CUDA path is a 1-thread-per-ray megakernel over a deep
per-primitive BVH (detail/cuda_sched.inl:60-99 + bvh/intersect.inl).  A
TPU has (8,128) vector lanes, no per-lane control flow, and pays dearly for
random gathers — so the fast path restructures the tree instead of porting
the traversal:

- primitives are morton-sorted (reusing the LBVH order) and grouped into
  fixed-size clusters of K consecutive prims;
- a *small* LBVH is built over cluster AABBs — small enough that its packed
  node table lives entirely in VMEM;
- a ray tile traverses the top tree in consensus (one shared stack per tile,
  like the reference's packet traversal, bvh/intersect.inl:84-101), and for
  each visited leaf DMAs the cluster's K triangles (contiguous in HBM
  because of the sort) into VMEM and brute-force intersects all lanes
  against them — dense VPU work instead of divergent pointer chasing.

This is the "ray-stream / cluster" formulation of BVH traversal (cf. the
quantized-structures + ray-stream tracing literature in PAPERS.md).

Node table layout — one node per sublane row (Mosaic requires lane-dim
slices to be 128-aligned, so the lane offset must be static):
  nodes[n, c] for c in 0..7 = [lo.x lo.y lo.z hi.x hi.y hi.z left right]
  left/right child indices are stored as float *values* (exact for < 2^24
  nodes; value-cast avoids any denormal-flush hazard a bitcast would risk).
  Node n < C-1 is internal; n >= C-1 is the leaf of cluster n-(C-1) —
  clusters are permuted so leaf j owns cluster j.
  VMEM cost: lane padding makes each row 128 lanes -> 512 B/node; K=64
  keeps the tree small (2*ceil(F/64)-1 nodes; ~4 MB at 260k tris).

Triangle table: 16-float records, 8 per 128-lane row so a cluster is a
fully lane-aligned HBM block (Mosaic DMA slices must be 128-aligned on the
lane dim):  tris[c, k // 8, (k % 8)*16 + j] with record
[v1 e1 e2 prim_id pad*6]; prim_id as a float value.  Padding prims have
e1 = e2 = 0 -> Moller-Trumbore div == 0 -> never hit.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from visionaray_tpu.core.types import pytree_dataclass
from visionaray_tpu.ops.lbvh import (
    build_radix_tree, morton3d, refit, triangle_aabbs,
)

DEFAULT_CLUSTER_SIZE = 32
_SMEM_NODE_BUDGET = 750_000   # bytes of the 1 MiB SMEM granted to the
                              # node table (traverse.py keeps it in SMEM)


def pick_cluster_size(num_prims: int) -> int:
    """Smallest multiple-of-8 cluster size whose node table fits SMEM.

    Smaller clusters mean less wasted leaf work per visit (measured: K=32
    beats K=64/128 on the sponza-class scene); the floor is the SMEM
    budget: nodes = (2*ceil(F/K) - 1) rows of 32 bytes.
    """
    k = 8
    while (2 * -(-num_prims // k) - 1) * 32 > _SMEM_NODE_BUDGET:
        k += 8
    return max(k, DEFAULT_CLUSTER_SIZE) if k > DEFAULT_CLUSTER_SIZE         else DEFAULT_CLUSTER_SIZE


@pytree_dataclass(static=("num_clusters", "cluster_size"))
class ClusterBVH:
    nodes: Any          # (2C-1, 8) f32 node table (one node per row)
    tris: Any           # (C, K//8, 128) f32: 8 x 16-float tri records per row
    num_clusters: int
    cluster_size: int

    @property
    def num_prims(self):
        return self.num_clusters * self.cluster_size  # incl. padding

    def tri_records(self):
        """View the packed table as (C, K, 16) records (tests/debug)."""
        C = self.num_clusters
        K = self.cluster_size
        return self.tris.reshape(C, K // 8, 8, 16).reshape(C, K, 16)


def build_cluster_bvh(mesh, cluster_size: int = 0) -> ClusterBVH:
    """Build the two-level structure on device (jit-compatible).

    ``cluster_size`` 0 = auto (pick_cluster_size: smallest K whose node
    table fits the SMEM budget).
    """
    K = cluster_size or pick_cluster_size(mesh.faces.shape[0])
    v1, e1, e2 = mesh.corners()
    v1 = jax.lax.stop_gradient(v1)
    e1 = jax.lax.stop_gradient(e1)
    e2 = jax.lax.stop_gradient(e2)
    F = v1.shape[0]
    lo, hi = triangle_aabbs(v1, e1, e2)

    # morton order over primitive centroids
    centroid = 0.5 * (lo + hi)
    scene_lo = jnp.min(lo, axis=0)
    scene_hi = jnp.max(hi, axis=0)
    extent = jnp.maximum(scene_hi - scene_lo, 1e-9)
    codes = morton3d((centroid - scene_lo) / extent)
    order = jnp.argsort(codes).astype(jnp.int32)

    # pad to a multiple of K with degenerate prims (never hit)
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

    # cluster AABBs (empty-padded slots ignored by min/max with +-inf)
    cl_lo = jnp.min(los.reshape(C, K, 3), axis=1)
    cl_hi = jnp.max(his.reshape(C, K, 3), axis=1)
    # guard all-padding clusters (can't happen: last cluster has >=1 real prim)
    cl_lo = jnp.where(jnp.isfinite(cl_lo), cl_lo, 0.0)
    cl_hi = jnp.where(jnp.isfinite(cl_hi), cl_hi, 0.0)

    # top-level LBVH over clusters
    cl_centroid = 0.5 * (cl_lo + cl_hi)
    cl_codes = morton3d((cl_centroid - scene_lo) / extent)
    cl_order = jnp.argsort(cl_codes).astype(jnp.int32)
    codes_sorted = jnp.take(cl_codes, cl_order)
    left, right, _parent = build_radix_tree(codes_sorted)
    leaf_lo = jnp.take(cl_lo, cl_order, axis=0)
    leaf_hi = jnp.take(cl_hi, cl_order, axis=0)
    node_lo, node_hi = refit(left, right, leaf_lo, leaf_hi)

    # permute clusters so leaf j owns cluster j; pack 16-float records,
    # 8 per 128-lane row
    assert K % 8 == 0, "cluster_size must be a multiple of 8"
    tri_cols = jnp.concatenate([
        v1s.reshape(C, K, 3), e1s.reshape(C, K, 3), e2s.reshape(C, K, 3),
        prim_ids.reshape(C, K, 1).astype(jnp.float32),
        jnp.zeros((C, K, 6), jnp.float32),
    ], axis=-1)  # (C, K, 16)
    tris = jnp.take(tri_cols, cl_order, axis=0).reshape(C, K // 8, 128)

    # node table: one node per row, 8 components in the lane dim
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
    ], axis=1)  # (2C-1, 8)
    return ClusterBVH(nodes=nodes, tris=tris, num_clusters=int(C),
                      cluster_size=K)
