"""Pallas TPU traversal kernel over the ClusterBVH.

The fast-path analogue of the reference's CUDA megakernel
(detail/cuda_sched.inl:60-99): grid = ray tiles, one kernel instance owns a
(8, 128) = 1024-ray tile resident in vector registers.

Per tile:
- consensus traversal of the VMEM-resident top tree with one shared stack
  (SMEM): descend a child if ANY lane's slab test passes with
  tnear < that lane's current best t (the packet idiom of the reference's
  bvh/intersect.inl:84-101, widened from 4-16 SIMD lanes to 1024);
- near-child-first ordering by the masked minimum of lane tnear values;
- at a leaf: DMA the cluster's K triangles (one contiguous HBM block,
  thanks to the morton sort) into VMEM scratch and brute-force
  Moeller-Trumbore all 1024 lanes against each of the K triangles —
  dense VPU work instead of divergent per-lane pointer chasing.

Node fetch: one node per sublane row (cluster_bvh.py); a dynamic
sublane-dim slice `nodes_ref[ds(n, 1), :]` yields the node's 8 floats,
followed by static-index extracts (Mosaic requires lane-dim offsets to be
static/128-aligned).

Backward: not needed here — the jnp wrapper (`cluster_closest_hit`)
follows the recompute pattern (ops/traversal.py): the kernel runs under
stop_gradient and the winning primitive is re-intersected differentiably.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from visionaray_tpu.core.types import FLT_MAX, HitRecord, Ray
from visionaray_tpu.ops.intersect import intersect_triangle
from visionaray_tpu.ops.pallas.cluster_bvh import ClusterBVH

TILE = 1024          # rays per kernel instance: one (8, 128) vreg set
STACK_DEPTH = 48     # top-tree depth bound (tree over <= ~1M clusters)


def _traverse_kernel(rays_ref, nodes_ref, tris_hbm, out_t_ref, out_prim_ref,
                     tri_scratch, stack_ref, dma_sem, *, num_clusters: int,
                     cluster_size: int, any_hit: bool):
    C = num_clusters
    K = cluster_size
    leaf_base = C - 1

    ox = rays_ref[0, 0]
    oy = rays_ref[1, 0]
    oz = rays_ref[2, 0]
    dx = rays_ref[3, 0]
    dy = rays_ref[4, 0]
    dz = rays_ref[5, 0]
    max_t = rays_ref[6, 0]

    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    def fetch_node(n):
        """Return node n's 8 floats as a (1, 8) block (static lane start)."""
        return nodes_ref[pl.ds(n, 1), :]

    def slab(vals, best_t):
        """Vector slab test of all lanes vs one node box (scalar broadcast).

        want = hit && tfar >= 0 && tnear < best_t  (update_if.h:62-66).
        """
        t1x = (vals[0, 0] - ox) * inv_dx
        t2x = (vals[0, 3] - ox) * inv_dx
        t1y = (vals[0, 1] - oy) * inv_dy
        t2y = (vals[0, 4] - oy) * inv_dy
        t1z = (vals[0, 2] - oz) * inv_dz
        t2z = (vals[0, 5] - oz) * inv_dz
        tn = jnp.maximum(jnp.minimum(t1x, t2x),
                         jnp.maximum(jnp.minimum(t1y, t2y),
                                     jnp.minimum(t1z, t2z)))
        tf = jnp.minimum(jnp.maximum(t1x, t2x),
                         jnp.minimum(jnp.maximum(t1y, t2y),
                                     jnp.maximum(t1z, t2z)))
        want = (tf >= tn) & (tf >= 0.0) & (tn < best_t)
        return want, tn

    def intersect_cluster(c, best_t, best_prim, done_mask):
        """DMA cluster c and intersect its K triangles against all lanes.

        The cluster block is (K//8, 128): 8 x 16-float tri records per row.
        Outer fori over rows (dynamic sublane slice — allowed); inner
        python loop over the 8 records with STATIC lane offsets (Mosaic
        requires static lane indexing).
        """
        dma = pltpu.make_async_copy(tris_hbm.at[c], tri_scratch, dma_sem)
        dma.start()
        dma.wait()

        def row_body(r, carry):
            bt, bp = carry
            row = tri_scratch[pl.ds(r, 1), :]   # (1, 128)
            for j in range(8):                   # static lane offsets
                o8 = j * 16
                v1x = row[0, o8 + 0]
                v1y = row[0, o8 + 1]
                v1z = row[0, o8 + 2]
                e1x = row[0, o8 + 3]
                e1y = row[0, o8 + 4]
                e1z = row[0, o8 + 5]
                e2x = row[0, o8 + 6]
                e2y = row[0, o8 + 7]
                e2z = row[0, o8 + 8]
                pid = row[0, o8 + 9]

                # Moller-Trumbore, scalar triangle broadcast over lanes
                s1x = dy * e2z - dz * e2y
                s1y = dz * e2x - dx * e2z
                s1z = dx * e2y - dy * e2x
                div = s1x * e1x + s1y * e1y + s1z * e1z
                ok = div != 0.0
                inv_div = 1.0 / jnp.where(ok, div, 1.0)
                ddx = ox - v1x
                ddy = oy - v1y
                ddz = oz - v1z
                b1 = (ddx * s1x + ddy * s1y + ddz * s1z) * inv_div
                ok = ok & (b1 >= 0.0) & (b1 <= 1.0)
                s2x = ddy * e1z - ddz * e1y
                s2y = ddz * e1x - ddx * e1z
                s2z = ddx * e1y - ddy * e1x
                b2 = (dx * s2x + dy * s2y + dz * s2z) * inv_div
                ok = ok & (b2 >= 0.0) & (b1 + b2 <= 1.0)
                t = (e2x * s2x + e2y * s2y + e2z * s2z) * inv_div
                closer = ok & (t >= 0.0) & (t < bt) & (~done_mask)
                bt = jnp.where(closer, t, bt)
                bp = jnp.where(closer, pid, bp)
            return bt, bp

        return jax.lax.fori_loop(0, K // 8, row_body, (best_t, best_prim))

    best_t0 = max_t
    best_prim0 = jnp.full((8, 128), -1.0, jnp.float32)
    # prim ids carried as float values (exact < 2^24); -1 = no hit

    if C == 1:
        best_t, best_prim = intersect_cluster(
            0, best_t0, best_prim0, jnp.zeros((8, 128), jnp.bool_))
    else:
        def cond(state):
            return ~state[0]

        def body(state):
            done, node, sp, best_t, best_prim = state
            is_leaf = node >= leaf_base

            # --- leaf path
            def do_leaf(args):
                bt, bp = args
                done_mask = (bt < max_t) if any_hit else \
                    jnp.zeros((8, 128), jnp.bool_)
                return intersect_cluster(
                    jnp.maximum(node - leaf_base, 0), bt, bp, done_mask)

            best_t, best_prim = jax.lax.cond(
                is_leaf, do_leaf, lambda a: a, (best_t, best_prim))

            # --- internal path
            safe = jnp.minimum(node, jnp.int32(max(leaf_base - 1, 0)))
            vals = fetch_node(safe)
            left = vals[0, 6].astype(jnp.int32)
            right = vals[0, 7].astype(jnp.int32)
            w1, tn1 = slab(fetch_node(left), best_t)
            w2, tn2 = slab(fetch_node(right), best_t)
            if any_hit:
                live = best_t >= max_t
                w1 = w1 & live
                w2 = w2 & live
            a1 = jnp.any(w1) & (~is_leaf)
            a2 = jnp.any(w2) & (~is_leaf)
            # consensus near-child: min of masked tnear over lanes
            m1 = jnp.min(jnp.where(w1, tn1, jnp.float32(FLT_MAX)))
            m2 = jnp.min(jnp.where(w2, tn2, jnp.float32(FLT_MAX)))
            near_is_l = m1 <= m2
            near = jnp.where(near_is_l, left, right)
            far = jnp.where(near_is_l, right, left)

            both = a1 & a2

            @pl.when(both)
            def _():
                stack_ref[jnp.minimum(sp, STACK_DEPTH - 1)] = far

            sp2 = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH), sp)
            next_node = jnp.where(
                both, near,
                jnp.where(a1, left, jnp.where(a2, right, -1)))

            need_pop = is_leaf | (next_node < 0)
            early = jnp.bool_(False)
            if any_hit:
                # whole-tile early exit: every lane found an occluder
                early = jnp.all(best_t < max_t)
            can_pop = sp2 > 0
            popped = stack_ref[jnp.maximum(sp2 - 1, 0)]
            new_node = jnp.where(need_pop,
                                 jnp.where(can_pop, popped, 0), next_node)
            new_sp = jnp.where(need_pop & can_pop, sp2 - 1, sp2)
            new_done = (need_pop & (~can_pop)) | early
            return (new_done, new_node, new_sp, best_t, best_prim)

        init = (jnp.bool_(False), jnp.int32(0), jnp.int32(0),
                best_t0, best_prim0)
        _, _, _, best_t, best_prim = jax.lax.while_loop(cond, body, init)

    out_t_ref[0] = best_t
    out_prim_ref[0] = best_prim


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("num_clusters", "cluster_size",
                                             "any_hit", "interpret"))
def _cluster_traverse(rays8, nodes, tris, num_clusters: int,
                      cluster_size: int, any_hit: bool = False,
                      interpret: bool = False):
    """rays8: (8, n_tiles, 8, 128) rows [ox oy oz dx dy dz maxt pad].

    Returns (t, prim_f) each (n_tiles, 8, 128); prim_f = -1 where no hit.
    """
    n_tiles = rays8.shape[1]
    kernel = functools.partial(
        _traverse_kernel, num_clusters=num_clusters,
        cluster_size=cluster_size, any_hit=any_hit)
    out_t, out_prim = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # packed nodes, whole
            pl.BlockSpec(memory_space=pltpu.ANY),    # tris stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((cluster_size // 8, 128), jnp.float32),
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(rays8, nodes, tris)
    return out_t, out_prim


def _pack_rays(o, d, mt, n, npad, n_tiles, pad_maxt):
    def comp(a, fill=0.0):
        return jnp.pad(a, (0, npad - n), constant_values=fill
                       ).reshape(n_tiles, 8, 128)

    return jnp.stack([
        comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
        comp(d[:, 0], 1.0), comp(d[:, 1], 1.0), comp(d[:, 2], 1.0),
        comp(mt, pad_maxt),
        jnp.zeros((n_tiles, 8, 128), jnp.float32),
    ], axis=0)


def cluster_closest_hit(ray: Ray, cbvh: ClusterBVH, mesh, max_t=FLT_MAX,
                        interpret: bool = False) -> HitRecord:
    """Closest hit via the Pallas kernel; differentiable by recompute."""
    sg = jax.lax.stop_gradient
    o = sg(ray.ori.reshape(-1, 3))
    d = sg(ray.dir.reshape(-1, 3))
    n = o.shape[0]
    npad = _round_up(max(n, TILE), TILE)
    n_tiles = npad // TILE
    mt = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), (n,))
    rays8 = _pack_rays(o, d, mt, n, npad, n_tiles, pad_maxt=-1.0)

    t_tiles, prim_f = _cluster_traverse(
        rays8, sg(cbvh.nodes), sg(cbvh.tris), cbvh.num_clusters,
        cbvh.cluster_size, any_hit=False, interpret=interpret)
    prim_flat = prim_f.reshape(-1)[:n]
    bs = ray.batch_shape
    hit = (prim_flat >= 0.0).reshape(bs)
    pid = jnp.where(hit, prim_flat.reshape(bs).astype(jnp.int32), 0)

    # differentiable recompute at the winning primitive
    v1, e1, e2 = mesh.corners()
    t_rec, u, v, _ = intersect_triangle(
        ray.ori, ray.dir,
        jnp.take(v1, pid, axis=0), jnp.take(e1, pid, axis=0),
        jnp.take(e2, pid, axis=0))
    return HitRecord(
        hit=hit,
        t=jnp.where(hit, t_rec, FLT_MAX),
        prim_id=pid.astype(jnp.int32),
        geom_id=jnp.take(mesh.geom_ids, pid),
        u=jnp.where(hit, u, 0.0),
        v=jnp.where(hit, v, 0.0),
    )


def cluster_any_hit(ray: Ray, cbvh: ClusterBVH, mesh, max_t,
                    interpret: bool = False) -> HitRecord:
    """Occlusion query with whole-tile early exit."""
    sg = jax.lax.stop_gradient
    o = sg(ray.ori.reshape(-1, 3))
    d = sg(ray.dir.reshape(-1, 3))
    n = o.shape[0]
    npad = _round_up(max(n, TILE), TILE)
    n_tiles = npad // TILE
    mt = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), ray.batch_shape
                          ).reshape(-1)
    rays8 = _pack_rays(o, d, mt, n, npad, n_tiles, pad_maxt=-1.0)
    t_tiles, prim_f = _cluster_traverse(
        rays8, sg(cbvh.nodes), sg(cbvh.tris), cbvh.num_clusters,
        cbvh.cluster_size, any_hit=True, interpret=interpret)
    bs = ray.batch_shape
    prim_flat = prim_f.reshape(-1)[:n].reshape(bs)
    t = t_tiles.reshape(-1)[:n].reshape(bs)
    hit = prim_flat >= 0.0
    pid = jnp.where(hit, prim_flat.astype(jnp.int32), 0)
    return HitRecord(
        hit=hit, t=jnp.where(hit, t, FLT_MAX),
        prim_id=pid.astype(jnp.int32),
        geom_id=jnp.take(mesh.geom_ids, pid),
        u=jnp.zeros_like(t), v=jnp.zeros_like(t),
    )
