"""Pallas TPU traversal kernel over the ClusterBVH.

The fast-path analogue of the reference's CUDA megakernel
(detail/cuda_sched.inl:60-99), restructured for a machine with one scalar
unit driving (8,128)-lane vector units.

The packet idiom of the reference's SIMD traversal (bvh/intersect.inl:
84-101) descends a node if ANY lane's slab test passes — which on TPU
costs a cross-lane reduction (a vector->scalar sync) at EVERY node, and
every node fetch is a dynamic VMEM slice followed by vector->scalar
extracts.  Measurement shows those scalar<->vector round trips dominate.
The design here keeps the ENTIRE descend decision on the scalar unit:

- the packed node table lives in SMEM (scalar memory): node fetches are
  plain dynamic scalar loads, no vector unit involvement at all;
- per tile, the ray set is reduced ONCE to an interval hull (origin lo/hi,
  1/direction lo/hi) and internal nodes are tested with conservative
  scalar interval arithmetic — a superset of "any lane's slab test
  passes" (update_if.h:62-66), looser only when rays are incoherent;
- at a leaf, the cluster's K triangles are DMA'd (one contiguous HBM
  block, thanks to the morton sort) into SMEM, and Moeller-Trumbore runs
  as scalar-broadcast vector ops over all rows*128 lanes — the only
  vector work in the loop — followed by ONE cross-lane max(best_t)
  reduction to refresh the tile's scalar occlusion bound.  Syncs scale
  with leaves visited, not nodes visited.

This is frustum-packet traversal re-derived for TPU: the frustum is an
interval hull (valid for ANY ray set), descent order is near-first by the
frustum's conservative tnear, and occlusion culling uses tile-max best_t.

INTERLEAVE > 1 processes several independent tiles per kernel instance so
one tile's leaf DMA + vector work overlaps another's scalar traversal.

SMEM budget (1 MiB/core): node table 64*C bytes (C clusters) + G triangle
slots of 64*K bytes; cluster_bvh.pick_cluster_size keeps C <= ~12k.

Backward: not needed here — the jnp wrapper (`cluster_closest_hit`)
follows the recompute pattern (ops/traversal.py): the kernel runs under
stop_gradient and the winning primitive is re-intersected differentiably.
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax.ad_checkpoint import checkpoint_name

from visionaray_tpu.core.types import FLT_MAX, HitRecord, Ray
from visionaray_tpu.ops.intersect import intersect_triangle
from visionaray_tpu.ops.pallas.cluster_bvh import ClusterBVH
from visionaray_tpu.ops.lbvh import morton3d

TILE_ROWS = 32       # sublane rows per ray tile; tile = TILE_ROWS*128 rays
INTERLEAVE = 2       # independent tiles per kernel instance
# Top-tree depth bound.  64 is PROVABLY sufficient for any input, not a
# heuristic clamp: along any root-to-leaf path of a Karras'12 radix tree the
# range's common-prefix length (delta) strictly increases; delta takes at
# most 30 values for distinct 30-bit morton codes (lbvh.morton3d) plus at
# most 32 index-tiebreak values for duplicate codes (lbvh._delta_fn), so
# depth <= 63 regardless of prim count or degenerate layouts.  The
# adversarial case (all-identical centroids) is exercised by
# tests/test_lbvh.py::test_degenerate_layout_stack_bound.
STACK_DEPTH = 64
_INV_CLAMP = 1e18    # keeps interval products finite (no inf*0 NaNs)


# Sorting networks (ascending) for the multi-way descend frontier.
_SORT_NET = {
    2: [(0, 1)],
    4: [(0, 1), (2, 3), (0, 2), (1, 3), (1, 2)],
    8: [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6), (0, 4), (1, 5), (2, 6), (3, 7), (2, 4), (3, 5),
        (1, 2), (3, 4), (5, 6)],
}


def _traverse_kernel(rays_ref, boxes_ref, kids_ref, roots_ref, splits_ref,
                     tris_hbm, out_t_ref, out_prim_ref, out_u_ref,
                     out_v_ref, tri_smem, stack_ref, dma_sem, *,
                     num_clusters: int, cluster_size: int, any_hit: bool,
                     rows: int, group: int, fanout: int = 2,
                     heap: bool = False, half_skip: bool = False):
    C = num_clusters
    K = cluster_size
    G = group
    leaf_base = C - 1
    lanes = (rows, 128)
    chunk_lanes = rows * 128
    pid0 = pl.program_id(0)

    def ray_comp(c, g):
        return rays_ref[c, 0, g]

    def clamp_inv(d):
        return jnp.clip(1.0 / d, -_INV_CLAMP, _INV_CLAMP)

    # TWO-PASS tiles (contiguous sorted layout, no segment padding): lanes
    # [0, split) belong to the tile's first treelet segment and traverse
    # from roots_ref[0] (pass 0); lanes [split, chunk) hold the remainder
    # (the next segment, or several small ones) and traverse from
    # roots_ref[1] (their own treelet root, or the heap LCA of the spanned
    # treelets) as pass 1.  split == chunk means single-segment: pass 1 is
    # empty.  The coherent path passes split = chunk everywhere.
    lane_idx = (jax.lax.broadcasted_iota(jnp.int32, lanes, 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, lanes, 1))
    split_g = [splits_ref[0, pid0 * G + g] for g in range(G)]
    rootA_g = [roots_ref[0, pid0 * G + g] for g in range(G)]
    rootB_g = [roots_ref[1, pid0 * G + g] for g in range(G)]

    def sel_of(g, p):
        """Lane mask of pass p (0/1) in tile g; p may be a traced scalar.

        Formulated as mask XOR, not jnp.where: Mosaic cannot legalize
        arith.select with vector<i1> operands (the round-3 HEAD compile
        failure), but xor on masks lowers fine.  p==0 -> in_a, else ~in_a.
        """
        in_a = lane_idx < split_g[g]
        return in_a ^ (p != 0)

    # --- per-pass interval hulls (one-time reductions; scalars thereafter).
    # DEAD lanes (max_t < 0: padding, culled pairs) and the other pass's
    # lanes are masked out — placeholder origins would otherwise inflate
    # the hull and the tile would scan far beyond its rays (measured 13x
    # slowdown on the binned path before masking).
    o_iv = []   # o_iv[g][pass][axis] = (lo, hi)
    i_iv = []
    maxt0 = []  # maxt0[g][pass]
    for g in range(G):
        o_iv.append([])
        i_iv.append([])
        maxt0.append([])
        for p in range(2):
            alive = (ray_comp(6, g) >= 0.0) & sel_of(g, p)
            o_iv[g].append(
                [(jnp.min(jnp.where(alive, ray_comp(c, g), 3e38)),
                  jnp.max(jnp.where(alive, ray_comp(c, g), -3e38)))
                 for c in range(3)])
            i_iv[g].append(
                [(jnp.min(jnp.where(alive, clamp_inv(ray_comp(3 + c, g)),
                                    _INV_CLAMP)),
                  jnp.max(jnp.where(alive, clamp_inv(ray_comp(3 + c, g)),
                                    -_INV_CLAMP)))
                 for c in range(3)])
            maxt0[g].append(jnp.max(jnp.where(alive, ray_comp(6, g),
                                              -1.0)))

    def node_f(n, c):
        """Scalar load of box component c (0..5) of node n (SMEM)."""
        return boxes_ref[0, n * 6 + c]

    def node_kids(n):
        """(left, right) of internal node n.

        Heap-built trees (the kd/treelet composite) need no table at all:
        children of i sit at 2i+1 / 2i+2 — two scalar adds instead of an
        SMEM load.  Radix trees unpack one packed i32 column (28 B/node;
        16-bit halves are exact because the SMEM budget already caps the
        node count well under 2^16).
        """
        if heap:
            return 2 * n + 1, 2 * n + 2
        kid = kids_ref[0, n]
        # Logical shift semantics: i32 >> is arithmetic, so left >= 32768
        # (left<<16 setting the sign bit) would sign-extend to a negative
        # node index.  Mask after shifting to recover the unsigned half.
        return (kid >> 16) & 0xFFFF, kid & 0xFFFF

    def cur_ivs(g, p):
        """Scalar-select tile g's hull intervals for traced pass p."""
        sel = p == 0

        def pick(pair_a, pair_b):
            return (jnp.where(sel, pair_a[0], pair_b[0]),
                    jnp.where(sel, pair_a[1], pair_b[1]))

        o_c = [pick(o_iv[g][0][a], o_iv[g][1][a]) for a in range(3)]
        i_c = [pick(i_iv[g][0][a], i_iv[g][1][a]) for a in range(3)]
        return (o_c, i_c)

    def box_test(ivs, load, maxt):
        """Scalar conservative slab test of a pass hull vs a box given by
        ``load(c)`` (c in 0..5 = lo.xyz hi.xyz).

        Returns (descend?, conservative tnear): a superset of "any lane's
        slab test passes with tnear < its best t".
        """
        o_ivs, i_ivs = ivs
        tn = jnp.float32(-3e38)
        tf = jnp.float32(3e38)
        for a in range(3):
            blo = load(a)
            bhi = load(3 + a)
            (olo, ohi) = o_ivs[a]
            (ilo, ihi) = i_ivs[a]
            axis_lo = jnp.float32(3e38)
            axis_hi = jnp.float32(-3e38)
            for b in (blo, bhi):
                u1 = b - ohi
                u2 = b - olo
                p1 = u1 * ilo
                p2 = u1 * ihi
                p3 = u2 * ilo
                p4 = u2 * ihi
                axis_lo = jnp.minimum(
                    axis_lo, jnp.minimum(jnp.minimum(p1, p2),
                                         jnp.minimum(p3, p4)))
                axis_hi = jnp.maximum(
                    axis_hi, jnp.maximum(jnp.maximum(p1, p2),
                                         jnp.maximum(p3, p4)))
            tn = jnp.maximum(tn, axis_lo)
            tf = jnp.minimum(tf, axis_hi)
        want = (tf >= tn) & (tf >= 0.0) & (tn < maxt)
        return want, tn

    def frustum_test(ivs, n, maxt):
        return box_test(ivs, lambda c: node_f(n, c), maxt)

    def dma_for(g, c):
        return pltpu.make_async_copy(
            tris_hbm.at[c], tri_smem.at[g], dma_sem.at[g])

    def intersect_cluster(g, best_t, best_prim, best_u, best_v, done_mask,
                          k0=0, k1=None):
        """Tile g (vector lanes) vs triangles [k0, k1) in its SMEM slot.

        Triangle components are scalar SMEM loads broadcast into vector
        Moeller-Trumbore over all rows*128 lanes — no vector->scalar
        extracts anywhere.
        """
        oxg = ray_comp(0, g)
        oyg = ray_comp(1, g)
        ozg = ray_comp(2, g)
        dxg = ray_comp(3, g)
        dyg = ray_comp(4, g)
        dzg = ray_comp(5, g)

        def tri_body(k, carry):
            bt, bp, bu, bv = carry
            r = k >> 3
            o16 = (k & 7) * 16

            def tf(j):
                return tri_smem[g, r, o16 + j]

            v1x, v1y, v1z = tf(0), tf(1), tf(2)
            e1x, e1y, e1z = tf(3), tf(4), tf(5)
            e2x, e2y, e2z = tf(6), tf(7), tf(8)
            pid = tf(9)

            s1x = dyg * e2z - dzg * e2y
            s1y = dzg * e2x - dxg * e2z
            s1z = dxg * e2y - dyg * e2x
            div = s1x * e1x + s1y * e1y + s1z * e1z
            ok = div != 0.0
            inv_div = 1.0 / jnp.where(ok, div, 1.0)
            ddx = oxg - v1x
            ddy = oyg - v1y
            ddz = ozg - v1z
            b1 = (ddx * s1x + ddy * s1y + ddz * s1z) * inv_div
            ok = ok & (b1 >= 0.0) & (b1 <= 1.0)
            s2x = ddy * e1z - ddz * e1y
            s2y = ddz * e1x - ddx * e1z
            s2z = ddx * e1y - ddy * e1x
            b2 = (dxg * s2x + dyg * s2y + dzg * s2z) * inv_div
            ok = ok & (b2 >= 0.0) & (b1 + b2 <= 1.0)
            t = (e2x * s2x + e2y * s2y + e2z * s2z) * inv_div
            closer = ok & (t >= 0.0) & (t < bt) & (~done_mask)
            bt = jnp.where(closer, t, bt)
            bp = jnp.where(closer, pid, bp)
            if not any_hit:
                # occlusion queries never read barycentrics; skipping the
                # two selects trims the flop-bound MT loop on shadow traces
                bu = jnp.where(closer, b1, bu)
                bv = jnp.where(closer, b2, bv)
            return bt, bp, bu, bv

        # static unroll: SMEM offsets become compile-time constants and the
        # per-triangle arithmetic (independent until the final min-fold)
        # software-pipelines across triangles instead of serializing on a
        # fori carry
        carry = (best_t, best_prim, best_u, best_v)
        for k in range(k0, K if k1 is None else k1):
            carry = tri_body(k, carry)
        return carry

    best_t0 = [ray_comp(6, g) for g in range(G)]
    best_prim0 = [jnp.full(lanes, -1.0, jnp.float32) for _ in range(G)]
    best_u0 = [jnp.zeros(lanes, jnp.float32) for _ in range(G)]
    best_v0 = [jnp.zeros(lanes, jnp.float32) for _ in range(G)]
    # prim ids carried as float values (exact < 2^24); -1 = no hit

    if C == 1:
        for g in range(G):
            dma_for(g, 0).start()
        best_t = []
        best_prim = []
        best_u = []
        best_v = []
        for g in range(G):
            dma_for(g, 0).wait()
            bt, bp, bu, bv = intersect_cluster(
                g, best_t0[g], best_prim0[g], best_u0[g], best_v0[g],
                jnp.zeros(lanes, jnp.bool_))
            best_t.append(bt)
            best_prim.append(bp)
            best_u.append(bu)
            best_v.append(bv)
    else:
        def cond(state):
            done = state[0]
            alive = ~done[0]
            for g in range(1, G):
                alive = alive | (~done[g])
            return alive

        def body(state):
            (done, node, sp, maxt, pas, best_t, best_prim, best_u,
             best_v) = [list(x) for x in state]

            # pass A: detect leaves, launch all leaf DMAs up front so they
            # overlap the scalar traversal below
            is_leaf = []
            for g in range(G):
                il = (~done[g]) & (node[g] >= leaf_base)
                is_leaf.append(il)

                @pl.when(il)
                def _(g=g):
                    dma_for(g, jnp.maximum(node[g] - leaf_base, 0)).start()

            # pass B: per-tile step
            new_state = ([], [], [], [], [], [], [], [], [])
            for g in range(G):
                ivs = cur_ivs(g, pas[g])

                # --- leaf path: wait DMA, dense vector intersect, refresh
                # the scalar occlusion bound (the only vector work + the
                # only vector->scalar sync in the loop)
                def do_leaf(args, g=g, pas_g=pas[g], ivs=ivs):
                    bt, bp, bu, bv, mt_ = args
                    dma_for(g, jnp.maximum(node[g] - leaf_base, 0)).wait()
                    sel = sel_of(g, pas_g)
                    done_mask = ~sel
                    if any_hit:
                        done_mask = done_mask | (bt < ray_comp(6, g))
                    if half_skip:
                        # kd half-cluster AABBs ride the record padding
                        # (cluster_bvh: record h's cols 10..15); a scalar
                        # hull test against each half skips 16 triangles
                        # of vector MT when the tile's frustum misses it
                        # (padding halves carry empty boxes, so their MT
                        # is skipped for free too)
                        for h in range(2):
                            okh, _ = box_test(
                                ivs,
                                lambda c, h=h: tri_smem[g, 0, 16 * h
                                                        + 10 + c],
                                mt_)
                            bt, bp, bu, bv = jax.lax.cond(
                                okh,
                                lambda a, h=h: intersect_cluster(
                                    g, *a, done_mask,
                                    k0=h * (K // 2), k1=(h + 1) * (K // 2)),
                                lambda a: a,
                                (bt, bp, bu, bv))
                    else:
                        bt, bp, bu, bv = intersect_cluster(
                            g, bt, bp, bu, bv, done_mask)
                    if any_hit:
                        # remaining-work bound: max max_t over THIS pass's
                        # lanes still unoccluded (dead lanes max_t < 0)
                        mt_ = jnp.max(jnp.where(
                            sel & ~(bt < ray_comp(6, g)),
                            ray_comp(6, g), jnp.float32(-1.0)))
                    else:
                        mt_ = jnp.max(jnp.where(sel, bt,
                                                jnp.float32(-1.0)))
                    return bt, bp, bu, bv, mt_

                bt, bp, bu, bv, mt_ = jax.lax.cond(
                    is_leaf[g], do_leaf, lambda a: a,
                    (best_t[g], best_prim[g], best_u[g], best_v[g],
                     maxt[g]))

                # --- internal path: pure scalar frustum tests over the
                # BVH<fanout> frontier.  fanout = 4 collapses two heap
                # levels per iteration (the grandchildren of the current
                # node, with already-leaf children kept as-is): the box
                # tests per level stay the same but the per-iteration
                # fixed costs — leaf-detect cond, stack/pass logic, the
                # G-tile lockstep — are paid half as often.
                safe = jnp.minimum(node[g],
                                   jnp.int32(max(leaf_base - 1, 0)))
                l0, r0 = node_kids(safe)
                cands = [l0, r0]
                for _ in range(fanout.bit_length() - 2):
                    nxt = []
                    for c in cands:
                        at_leaf = (c >= leaf_base) | (c < 0)
                        cc = jnp.clip(c, 0, max(leaf_base - 1, 0))
                        k0, k1 = node_kids(cc)
                        nxt.append(jnp.where(at_leaf, c, k0))
                        nxt.append(jnp.where(at_leaf, jnp.int32(-1), k1))
                    cands = nxt
                keys = []
                idxs = list(cands)
                for c in cands:
                    wc, tnc = frustum_test(ivs, jnp.maximum(c, 0), mt_)
                    wc = wc & (c >= 0) & (~is_leaf[g])
                    # wanted implies tnc < maxt < inf, so +inf marks "not
                    # wanted" unambiguously and sorts to the tail
                    keys.append(jnp.where(wc, tnc, jnp.float32(jnp.inf)))
                for (i, j) in _SORT_NET[fanout]:
                    swp = keys[i] > keys[j]
                    keys[i], keys[j] = (jnp.where(swp, keys[j], keys[i]),
                                        jnp.where(swp, keys[i], keys[j]))
                    idxs[i], idxs[j] = (jnp.where(swp, idxs[j], idxs[i]),
                                        jnp.where(swp, idxs[i], idxs[j]))
                cnt = keys[0] < jnp.inf
                cnt = cnt.astype(jnp.int32)
                for k in keys[1:]:
                    cnt = cnt + (k < jnp.inf).astype(jnp.int32)
                npush = jnp.maximum(cnt - 1, 0)
                # push far-to-near: s_j lands at sp + npush - j so the
                # nearest pushed child (s1) is on top and pops first
                for j in range(1, fanout):
                    @pl.when(cnt >= j + 1)
                    def _(g=g, sp_g=sp[g], npush=npush, j=j, idx=idxs[j]):
                        stack_ref[g, jnp.clip(sp_g + npush - j, 0,
                                              STACK_DEPTH - 1)] = idx

                sp2 = jnp.minimum(sp[g] + npush, STACK_DEPTH)
                next_node = jnp.where(cnt > 0, idxs[0], jnp.int32(-1))

                need_pop = is_leaf[g] | (next_node < 0)
                early = jnp.bool_(False)
                if any_hit:
                    # whole-pass early exit: every live lane occluded
                    early = mt_ < 0.0
                can_pop = sp2 > 0
                popped = stack_ref[g, jnp.maximum(sp2 - 1, 0)]
                exhausted = (need_pop & (~can_pop)) | early
                # pass switch: first segment exhausted -> traverse the
                # remainder lanes from roots_ref[1] with a fresh stack
                has_b = (split_g[g] < chunk_lanes) & \
                    (maxt0[g][1] >= 0.0)
                to_b = exhausted & (pas[g] == 0) & has_b
                nd = exhausted & (~to_b)
                nn = jnp.where(
                    to_b, rootB_g[g],
                    jnp.where(need_pop,
                              jnp.where(can_pop, popped, 0), next_node))
                nsp = jnp.where(to_b, 0,
                                jnp.where(need_pop & can_pop, sp2 - 1,
                                          sp2))
                mt_ = jnp.where(to_b, maxt0[g][1], mt_)
                npas = jnp.where(to_b, 1, pas[g])

                new_state[0].append(done[g] | nd)
                new_state[1].append(jnp.where(done[g], node[g], nn))
                new_state[2].append(jnp.where(done[g], sp[g], nsp))
                new_state[3].append(mt_)
                new_state[4].append(jnp.where(done[g], pas[g], npas))
                new_state[5].append(bt)
                new_state[6].append(bp)
                new_state[7].append(bu)
                new_state[8].append(bv)
            return tuple(tuple(x) for x in new_state)

        # Per-tile start nodes/splits (SMEM scalar rows; Mosaic needs SMEM
        # blocks (8,128)-divisible or full-size) indexed by grid position.
        # A tile whose pass-A hull is empty (maxt0 < 0) starts on pass B if
        # that has live lanes, else starts done: an empty masked hull is
        # the empty interval whose frustum arithmetic degenerates.  Dead
        # lanes sort after live ones, so pass A is only empty when the
        # whole tile is dead — the pass-B fallback is defensive.
        a_dead = [maxt0[g][0] < 0.0 for g in range(G)]
        b_live = [maxt0[g][1] >= 0.0 for g in range(G)]
        init = (
            tuple(a_dead[g] & (~b_live[g]) for g in range(G)),
            tuple(jnp.where(a_dead[g], rootB_g[g], rootA_g[g])
                  for g in range(G)),
            tuple(jnp.int32(0) for _ in range(G)),
            tuple(jnp.where(a_dead[g], maxt0[g][1], maxt0[g][0])
                  for g in range(G)),
            tuple(jnp.where(a_dead[g], 1, 0) for g in range(G)),
            tuple(best_t0), tuple(best_prim0),
            tuple(best_u0), tuple(best_v0))
        (_, _, _, _, _, best_t, best_prim, best_u,
         best_v) = jax.lax.while_loop(cond, body, init)

    for g in range(G):
        out_t_ref[0, g] = best_t[g]
        out_prim_ref[0, g] = best_prim[g]
        out_u_ref[0, g] = best_u[g]
        out_v_ref[0, g] = best_v[g]


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("num_clusters", "cluster_size",
                                             "any_hit", "interpret",
                                             "fanout", "heap", "half_skip"))
def _cluster_traverse(rays8, nodes, tris, num_clusters: int,
                      cluster_size: int, any_hit: bool = False,
                      interpret: bool = False, tile_roots=None,
                      tile_splits=None, fanout: int = 2,
                      heap: bool = False, half_skip: bool = False):
    """rays8: (8, n_groups, G, R, 128) rows [ox oy oz dx dy dz maxt pad].

    ``tile_roots``: optional (2, n_groups, G) i32 start nodes per tile
    (pass A / pass B of the two-pass contiguous layout); None = global
    root everywhere.  ``tile_splits``: optional (n_groups, G) i32 lane
    index where pass B starts; None = R*128 (single-pass tiles).
    Returns (t, prim_f, u, v) each (n_groups, G, R, 128); prim_f = -1 if
    no hit.
    """
    n_groups = rays8.shape[1]
    group = rays8.shape[2]
    rows = rays8.shape[3]
    if tile_roots is None:
        tile_roots = jnp.zeros((2, n_groups, group), jnp.int32)
    if tile_splits is None:
        tile_splits = jnp.full((n_groups, group), rows * 128, jnp.int32)
    tile_roots = tile_roots.reshape(2, n_groups * group)
    tile_splits = tile_splits.reshape(1, n_groups * group)
    assert fanout in _SORT_NET, f"fanout must be one of {set(_SORT_NET)}"
    # fanout > 2 pushes up to fanout-1 nodes per descend; the 64-entry
    # stack bound is only proven for binary radix trees, so wide descent
    # requires the complete-heap build (depth <= log2(C) <= 15 under the
    # packed-kids cap, worst-case stack 3*8 = 24 at fanout 4)
    assert fanout == 2 or heap, "fanout > 2 requires a heap-built tree"
    kernel = functools.partial(
        _traverse_kernel, num_clusters=num_clusters,
        cluster_size=cluster_size, any_hit=any_hit, rows=rows, group=group,
        fanout=fanout, heap=heap, half_skip=half_skip)
    # Node table flattened to SMEM rows (SMEM rows pad to 128 lanes, so
    # (N, k) would waste; (1, N*k) is dense).  Boxes (6 f32) and packed
    # children (1 i32: left<<16 | right) ride separately — 28 B/node
    # instead of 32, which is what floors the SMEM-bound cluster size.
    # 16-bit halves are exact: the same SMEM capacity caps 2C-1 << 2^16.
    assert 2 * num_clusters - 1 < (1 << 16), \
        "packed child indices need 2C-1 < 65536 (SMEM already forces this)"
    boxes_flat = nodes[:, :6].reshape(1, -1)
    kids_flat = ((nodes[:, 6].astype(jnp.int32) << 16)
                 | nodes[:, 7].astype(jnp.int32)).reshape(1, -1)
    out_t, out_prim, out_u, out_v = pl.pallas_call(
        kernel,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((8, 1, group, rows, 128),
                         lambda i: (0, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # box table (scalars)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # packed children
            pl.BlockSpec(memory_space=pltpu.SMEM),   # per-tile start nodes
            pl.BlockSpec(memory_space=pltpu.SMEM),   # per-tile pass splits
            pl.BlockSpec(memory_space=pl.ANY),       # tris stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, group, rows, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_groups, group, rows, 128), jnp.float32)
            for _ in range(4)
        ],
        scratch_shapes=[
            pltpu.SMEM((group, cluster_size // 8, 128), jnp.float32),
            pltpu.SMEM((group, STACK_DEPTH), jnp.int32),
            pltpu.SemaphoreType.DMA((group,)),
        ],
        interpret=interpret,
    )(rays8, boxes_flat, kids_flat, tile_roots, tile_splits, tris)
    return out_t, out_prim, out_u, out_v


def _pack_rays(o, d, mt, n, npad, n_groups, group, rows, pad_maxt):
    def comp(a, fill=0.0):
        return jnp.pad(a, (0, npad - n), constant_values=fill
                       ).reshape(n_groups, group, rows, 128)

    return jnp.stack([
        comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
        comp(d[:, 0], 1.0), comp(d[:, 1], 1.0), comp(d[:, 2], 1.0),
        comp(mt, pad_maxt),
        jnp.zeros((n_groups, group, rows, 128), jnp.float32),
    ], axis=0)


def _recompute_tuv(o, d, tbl, pid):
    """Differentiable (t, u, v) of the recorded winning primitive.

    One wide-row gather of the fused, 16-column-padded corner table
    instead of three narrow ones: row gathers are fast when rows are
    32B-aligned power-of-two strides (profiled: three separate takes cost
    more than the traversal kernel itself; a 9-column table falls off the
    aligned fast path).
    """
    rows_g = jnp.take(tbl, pid, axis=0)                     # (..., 16)
    t, u, v, _ = intersect_triangle(
        o, d, rows_g[..., 0:3], rows_g[..., 3:6], rows_g[..., 6:9])
    return t, u, v


@jax.custom_vjp
def _hit_tuv(o, d, tbl, pid, kt, ku, kv):
    """(t, u, v) at the winning primitive.

    Primal values come straight from the traversal kernel (kt/ku/kv) — no
    gather in the forward pass.  The VJP re-derives them differentiably
    from (ray, corner table, prim id) — the recompute pattern: traversal
    finds *which* primitive under stop_gradient; analytic intersection
    gradients are taken at that fixed primitive only (docs/diff.md).
    """
    return kt, ku, kv


def _hit_tuv_fwd(o, d, tbl, pid, kt, ku, kv):
    return (kt, ku, kv), (o, d, tbl, pid)


def _hit_tuv_bwd(res, cts):
    o, d, tbl, pid = res
    _, vjp = jax.vjp(lambda o_, d_, t_: _recompute_tuv(o_, d_, t_, pid),
                     o, d, tbl)
    do, dd, dtbl = vjp(cts)
    return do, dd, dtbl, None, None, None, None


_hit_tuv.defvjp(_hit_tuv_fwd, _hit_tuv_bwd)


def _coherence_perm(o, d, root_lo, root_hi):
    """Sort key: direction octant (3b) | origin morton (29b).

    Groups rays into tiles whose interval hulls stay tight: identical
    direction signs (finite 1/d hull) and nearby origins.  Refining the
    key with in-octant direction bits was measured SLOWER on the sponza
    bench — origin locality dominates the hull volume.  Primary rays from
    one camera share an origin, so the stable sort preserves any
    caller-side pixel-block order within each octant.
    Returns (perm, inv_perm).
    """
    ext = jnp.maximum(root_hi - root_lo, 1e-9)
    q = jnp.clip((o - root_lo) / ext, 0.0, 1.0)
    m = morton3d(q).astype(jnp.uint32)
    octant = ((d[:, 0] < 0).astype(jnp.uint32)
              + ((d[:, 1] < 0).astype(jnp.uint32) << 1)
              + ((d[:, 2] < 0).astype(jnp.uint32) << 2))
    key = (octant << 29) | (m >> 1)
    perm = jnp.argsort(key)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype))
    return perm, inv


TWO_PASS_CAP_FRAC = 0.08   # pass-1 ray length cap, fraction of scene diag
_FANOUT_ENV = os.environ.get("VSNRAY_FANOUT", "")


def _fanout_for(cbvh):
    """(fanout, heap) statics for a ClusterBVH.

    Heap-built trees use arithmetic children (2i+1/2i+2, no kids-table
    load) and can descend 4/8-wide (VSNRAY_FANOUT).  The BVH4 collapse
    MEASURED NEGATIVE at the step config (round 5, fetch-forced, sponza
    260k / K=32 T=128 M=6 BROWS=16): binned closest 2.40 -> 2.17 Mrays/s,
    binned any-hit 4.62 -> 4.20, global incoherent 0.51 -> 0.48 — treelet
    -entry traversal is leaf-iteration dominated, so halving internal
    iterations buys less than the wider iteration costs (4 box tests +
    5-comparator sort + up to 3 predicated pushes).  Default stays
    binary; the machinery remains for deeper-tree workloads.
    """
    if getattr(cbvh, "heap", False):
        return (int(_FANOUT_ENV) if _FANOUT_ENV else 2), True
    return 2, False


# Half-cluster MT skip: MEASURED NEGATIVE at the step config (round 5,
# fetch-forced): binned closest 2.40 -> 2.25 Mrays/s — the per-leaf pair
# of scalar box tests + lax.cond overhead costs more than the skipped
# half-MT saves (tile hulls usually overlap both kd halves).  OFF by
# default; the machinery and its conservative-correctness test remain
# (VSNRAY_HALFSKIP=1 to A/B on other scenes).
_HALFSKIP_ENV = os.environ.get("VSNRAY_HALFSKIP", "0") == "1"


def _half_skip_for(cbvh):
    return _HALFSKIP_ENV and getattr(cbvh, "half_boxes", False)


def _traverse_sorted(o, d, mt, n, cbvh, interpret):
    """Run the kernel on pre-sorted rays; returns (n, 4) [t prim u v]."""
    sg = jax.lax.stop_gradient
    chunk = TILE_ROWS * 128 * INTERLEAVE
    npad = _round_up(max(n, chunk), chunk)
    n_groups = npad // chunk
    rays8 = _pack_rays(o, d, mt, n, npad, n_groups, INTERLEAVE, TILE_ROWS,
                       pad_maxt=-1.0)
    fo, hp = _fanout_for(cbvh)
    t_tiles, prim_f, u_tiles, v_tiles = _cluster_traverse(
        rays8, sg(cbvh.nodes), sg(cbvh.tris), cbvh.num_clusters,
        cbvh.cluster_size, any_hit=False, interpret=interpret,
        fanout=fo, heap=hp, half_skip=_half_skip_for(cbvh))
    return jnp.stack([t_tiles.reshape(-1)[:n], prim_f.reshape(-1)[:n],
                      u_tiles.reshape(-1)[:n], v_tiles.reshape(-1)[:n]],
                     axis=1)


def cluster_closest_hit(ray: Ray, cbvh: ClusterBVH, mesh, max_t=FLT_MAX,
                        interpret: bool = False,
                        sort_rays: bool = True,
                        two_pass: bool = False) -> HitRecord:
    """Closest hit via the Pallas kernel; differentiable by recompute.

    ``two_pass``: optimization for ENCLOSED scenes (most rays hit within
    a short range; off by default — in open scenes sky-bound rays pay for
    both passes).  Pass 1 traces with a
    per-ray length cap (a fraction of the scene diagonal): the tile-wide
    occlusion bound then confines each tile's traversal to the
    neighbourhood of its origins, which is what makes diffuse bounce rays
    tractable under consensus traversal.  A hit under the cap is already
    the global closest (anything else is farther by construction); only
    capped MISSES re-trace at full range in pass 2, sorted to the front so
    fully-resolved tiles retire on their first frustum test.
    """
    sg = jax.lax.stop_gradient
    o = sg(ray.ori.reshape(-1, 3))
    d = sg(ray.dir.reshape(-1, 3))
    n = o.shape[0]
    chunk = TILE_ROWS * 128 * INTERLEAVE
    npad = _round_up(max(n, chunk), chunk)
    n_groups = npad // chunk
    mt = sg(jnp.broadcast_to(jnp.asarray(max_t, jnp.float32),
                             ray.batch_shape).reshape(-1))
    root_lo = sg(cbvh.nodes[0, 0:3])
    root_hi = sg(cbvh.nodes[0, 3:6])
    if sort_rays and n > chunk:
        perm, inv = _coherence_perm(o, d, root_lo, root_hi)
        rt = jnp.take(jnp.concatenate(
            [o, d, mt[:, None], jnp.zeros((n, 1), o.dtype)], axis=1),
            perm, axis=0)
        o, d, mt = rt[:, 0:3], rt[:, 3:6], rt[:, 6]
    else:
        inv = None

    if two_pass:  # independent of the sort: pass 2 builds its own packing
        diag = jnp.linalg.norm(root_hi - root_lo)
        cap = TWO_PASS_CAP_FRAC * diag
        outs1 = _traverse_sorted(o, d, jnp.minimum(mt, cap), n, cbvh,
                                 interpret)
        missed = (outs1[:, 1] < 0.0) & (mt > cap)
        # pass 2: full range for capped misses only; resolved lanes carry
        # max_t = -1 so their tiles terminate immediately.  Stable sort on
        # miss-ness packs the misses densely while preserving coherence.
        perm2 = jnp.argsort((~missed).astype(jnp.int32), stable=True)
        inv2 = jnp.zeros_like(perm2).at[perm2].set(
            jnp.arange(n, dtype=perm2.dtype))
        mt2 = jnp.where(missed, mt, -1.0)
        rt2 = jnp.take(jnp.concatenate(
            [o, d, mt2[:, None], jnp.zeros((n, 1), o.dtype)], axis=1),
            perm2, axis=0)
        outs2 = _traverse_sorted(rt2[:, 0:3], rt2[:, 3:6], rt2[:, 6], n,
                                 cbvh, interpret)
        outs2 = jnp.take(outs2, inv2, axis=0)
        outs = jnp.where(missed[:, None], outs2, outs1)
    else:
        outs = _traverse_sorted(o, d, mt, n, cbvh, interpret)

    # name the kernel outputs so a remat'd caller can save them instead of
    # re-running the traversal in the backward sweep
    # (jax.checkpoint_policies.save_only_these_names("traced_hits"))
    outs = checkpoint_name(outs, "traced_hits")
    if inv is not None:
        outs = jnp.take(outs, inv, axis=0)
    bs = ray.batch_shape
    prim_flat = outs[:, 1]
    hit = (prim_flat >= 0.0).reshape(bs)
    pid = jnp.where(hit, prim_flat.reshape(bs).astype(jnp.int32), 0)
    kt = outs[:, 0].reshape(bs)
    ku = outs[:, 2].reshape(bs)
    kv = outs[:, 3].reshape(bs)

    v1, e1, e2 = mesh.corners()
    tbl = jnp.concatenate(
        [v1, e1, e2, jnp.zeros(v1.shape[:-1] + (7,), v1.dtype)], axis=-1)
    t, u, v = _hit_tuv(ray.ori, ray.dir, tbl, pid, kt, ku, kv)
    return HitRecord(
        hit=hit,
        t=jnp.where(hit, t, FLT_MAX),
        prim_id=pid.astype(jnp.int32),
        geom_id=jnp.take(mesh.geom_ids, pid),
        u=jnp.where(hit, u, 0.0),
        v=jnp.where(hit, v, 0.0),
    )


# ---------------------------------------------------------------------------
# Treelet-binned traversal — the incoherent-ray path.
#
# Consensus (interval-hull) traversal collapses when a tile's rays diverge:
# the hull covers the whole scene and every leaf is intersected by every
# lane (round-1 measured a 60x cliff, docs/PERF.md).  The fix is to make
# tiles agree on WHAT they traverse instead of hoping they agree on WHERE
# they go: bin (ray, treelet) pairs per treelet, advance each pair's origin
# to its treelet entry point, and traverse only that treelet's subtree.
# Tiles then hold rays that (a) start on one treelet's boundary and (b)
# visit only its <=T clusters — tight hulls, bounded leaf work.

BIN_M = 6            # treelet slots per ray (last doubles as overflow
                     # slot).  Swept under the two-pass contiguous layout
                     # (round 4, fetch-forced): closest 5/6/7/8 ->
                     # 2.21/2.41/2.38/2.27 Mrays/s; any-hit 4/6/8 ->
                     # 3.65/4.65/4.47.  M=6 peaks both (the old padded
                     # layout preferred 8).
BINNED_ROWS = 16     # sublane rows per binned-path tile: 2048-ray tiles
                     # measured 2.47 vs 2.40 Mrays/s at 32 rows (tighter
                     # per-tile hulls + half the segment padding); the
                     # coherent path keeps TILE_ROWS=32 (tuned there)
_ENTRY_CHUNK = 1 << 15   # rays per entry-test chunk (bounds the N x S matrix)
_DIR_BITS = int(os.environ.get("VSNRAY_DIRBITS", "0"))


def _treelet_entries(o, d, mt, tlo, thi, m: int):
    """Entry distances of each ray into its m nearest treelets.

    Returns (ent (N, m) ascending, inf = empty slot; slot (N, m) i32
    treelet index with -1 = "whole tree").  Overflow (ray overlaps more
    than m treelets): the last slot becomes a whole-tree pass starting at
    the m-th nearest entry — every treelet outside the first m-1 has entry
    >= that by construction of top_k, so coverage stays exact.
    """
    n = o.shape[0]

    def chunk_fn(args):
        oc, dc, mc = args
        inv = jnp.clip(1.0 / dc, -_INV_CLAMP, _INV_CLAMP)
        t1 = (tlo[None, :, :] - oc[:, None, :]) * inv[:, None, :]
        t2 = (thi[None, :, :] - oc[:, None, :]) * inv[:, None, :]
        tn = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit = (tf >= tn) & (tf >= 0.0) & (tn < mc[:, None])
        ent_all = jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf)
        # m smallest entries in ascending order via m argmin/mask passes:
        # lax.top_k lowers to a full per-row sort on TPU, measured slower
        # than m cheap VPU reduction passes over the (chunk, S) matrix
        s_iota = jnp.arange(ent_all.shape[-1], dtype=jnp.int32)[None, :]
        work = ent_all
        ents = []
        slots = []
        for _ in range(m):
            idx_r = jnp.argmin(work, axis=-1).astype(jnp.int32)
            ents.append(jnp.min(work, axis=-1))
            slots.append(idx_r)
            work = jnp.where(s_iota == idx_r[:, None], jnp.inf, work)
        ent = jnp.stack(ents, axis=-1)
        slot = jnp.stack(slots, axis=-1)
        ovf = jnp.sum(hit, axis=-1) > m
        slot = slot.at[:, m - 1].set(
            jnp.where(ovf, -1, slot[:, m - 1]))
        return ent, slot

    if n <= _ENTRY_CHUNK:
        return chunk_fn((o, d, mt))
    npad = _round_up(n, _ENTRY_CHUNK)
    pad = npad - n
    op = jnp.pad(o, ((0, pad), (0, 0)))
    dp = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    mp = jnp.pad(mt, (0, pad), constant_values=-1.0)
    nc = npad // _ENTRY_CHUNK
    ent, slot = jax.lax.map(
        chunk_fn, (op.reshape(nc, _ENTRY_CHUNK, 3),
                   dp.reshape(nc, _ENTRY_CHUNK, 3),
                   mp.reshape(nc, _ENTRY_CHUNK)))
    return ent.reshape(npad, m)[:n], slot.reshape(npad, m)[:n]


def _two_pass_tile_meta(skey_s, troots, S: int, n_tiles: int, chunk: int,
                        lca_steps: int, npad: int):
    """Per-tile two-pass metadata from the sorted segment keys.

    ``skey_s``: (npad,) i32 sorted segment key per lane — treelet index in
    [0, S), S for whole-tree slots, S+1 for dead/padding lanes.  Returns
    (split, rootA, rootB), each (n_tiles,) i32:

    - ``split``: lane where pass B starts — the end of the tile's FIRST
      segment (clipped to [1, chunk]; chunk = single-pass tile).
    - ``rootA``: pass-A start node — the first segment's treelet root, or
      the global root 0 for whole-tree/dead-leading tiles.
    - ``rootB``: pass-B start node — the single remaining treelet's root,
      the heap LCA of the spanned treelets, or root 0 when any whole-tree
      slot lands in pass B.  Dead (padding) lanes never traverse (their
      max_t is -1), so they cannot widen rootB: the last LIVE lane bounds
      the spanned range.

    Factored out of _round_live so the CPU suite can pin the metadata for
    straddling tiles directly (VERDICT r3 #9).
    """
    tile_iota = jnp.arange(n_tiles, dtype=jnp.int32)
    # segstart[k] = first sorted position with key >= k, for k in [0, S+2]
    segstart = jnp.searchsorted(
        skey_s, jnp.arange(S + 3, dtype=jnp.int32)).astype(jnp.int32)
    tile0 = skey_s.reshape(n_tiles, chunk)[:, 0]
    n_live_tot = segstart[S + 1]
    idx_ll = jnp.clip(jnp.minimum((tile_iota + 1) * chunk, n_live_tot)
                      - 1, 0, npad - 1)
    tile_ll = jnp.take(skey_s, idx_ll)      # last LIVE seg in tile
    split = jnp.clip(
        jnp.take(segstart, jnp.minimum(tile0 + 1, S + 2))
        - tile_iota * chunk, 1, chunk).astype(jnp.int32)
    rootA = jnp.where(tile0 < S,
                      jnp.take(troots, jnp.clip(tile0, 0, S - 1)),
                      0).astype(jnp.int32)
    second = tile0 + 1
    wt = (second >= S) | (tile_ll >= S)     # whole-tree slot in B
    x = (S - 1) + jnp.clip(second, 0, S - 1)
    y = (S - 1) + jnp.clip(tile_ll, 0, S - 1)
    for _ in range(lca_steps):
        ne = x != y
        x, y = (jnp.where(ne, (x - 1) >> 1, x),
                jnp.where(ne, (y - 1) >> 1, y))
    rootB = jnp.where(wt, 0, x).astype(jnp.int32)
    return split, rootA, rootB


def _binned_trace(ray: Ray, cbvh: ClusterBVH, max_t, interpret: bool,
                  m: int, any_hit: bool):
    """Shared binned driver; returns per-RAY outs (n, 4) [t prim u v] with
    t the GLOBAL distance (treelet entry + local t).

    Slots are processed as SEQUENTIAL ROUNDS in entry order with best-t
    culling between rounds: round r traces only lanes whose r-th nearest
    treelet entry is still in front of their current best hit.  In an
    occluded (interior) scene most rays resolve in their nearest treelet
    and every later round retires on its first frustum test — this
    occlusion sequencing is what a one-shot pair expansion lacks (measured
    6x SLOWER than unbinned: interior rays overlap >m treelets, so nearly
    every ray also paid a whole-tree overflow pass).
    """
    sg = jax.lax.stop_gradient
    m = min(m, cbvh.num_treelets)
    o = sg(ray.ori.reshape(-1, 3))
    d = sg(ray.dir.reshape(-1, 3))
    n = o.shape[0]
    mt = sg(jnp.broadcast_to(jnp.asarray(max_t, jnp.float32),
                             ray.batch_shape).reshape(-1))
    tlo = sg(cbvh.treelet_lo)
    thi = sg(cbvh.treelet_hi)
    troots = sg(cbvh.treelet_roots)
    root_lo = sg(cbvh.nodes[0, 0:3])
    root_hi = sg(cbvh.nodes[0, 3:6])
    ext = jnp.maximum(root_hi - root_lo, 1e-9)

    ent, slot = _treelet_entries(o, d, mt, tlo, thi, m)

    S = cbvh.num_treelets
    troots = sg(cbvh.treelet_roots)
    rows = BINNED_ROWS
    chunk = rows * 128
    # CONTIGUOUS SORTED LAYOUT (round-3 rewrite): pairs are sorted
    # treelet-major (dead rays last) and the kernel consumes them densely —
    # no per-segment padding, no scatter/spread-gather routing.  A tile
    # whose lanes straddle a segment boundary runs TWO masked passes
    # inside the kernel: pass A for the first treelet's lanes (its root),
    # pass B for the remainder (the second treelet's root, or — when
    # several small segments share the tile — the heap LCA of the spanned
    # treelets; any whole-tree (-1) slot in the remainder forces root 0).
    # Traversing a pair from an ancestor of its assigned treelet is
    # conservative-correct: results combine by global-t min, and the
    # pass hull masks to exactly the remainder lanes.  This replaced the
    # round-2 chunk-aligned padded-segment layout, whose routing cost two
    # scatters + two row gathers per live round.
    npad = _round_up(max(n, chunk * INTERLEAVE), chunk * INTERLEAVE)
    n_groups = npad // (chunk * INTERLEAVE)
    n_tiles = npad // chunk
    lca_steps = max(1, int(np.ceil(np.log2(max(S, 2)))) + 1)

    # static across rounds: direction octant + per-pair index payload
    iota_np = jnp.arange(npad, dtype=jnp.int32)
    octant = ((d[:, 0] < 0).astype(jnp.uint32)
              + ((d[:, 1] < 0).astype(jnp.uint32) << 1)
              + ((d[:, 2] < 0).astype(jnp.uint32) << 2))

    def round_fn(r, carry):
        bt, bp, bu, bv = carry
        ent_r = jax.lax.dynamic_slice_in_dim(ent, r, 1, axis=1)[:, 0]
        slot_r = jax.lax.dynamic_slice_in_dim(slot, r, 1, axis=1)[:, 0]
        cap = jnp.minimum(mt, bt)
        live = jnp.isfinite(ent_r) & (ent_r < cap)
        if any_hit:
            live = live & (bp < 0.0)  # already occluded: skip all rounds
        # whole-round skip: once best-t culling kills every pair of round
        # r, rounds r+1.. are dead too on typical (occluded) workloads —
        # the branch saves their full sort+route+kernel cost at run time
        return jax.lax.cond(jnp.any(live), _round_live,
                            lambda c, *_: c, carry, live, ent_r, slot_r,
                            cap)

    def _round_live(carry, live, ent_r, slot_r, cap):
        bt, bp, bu, bv = carry
        ent_c = jnp.where(live, ent_r, 0.0)
        op = o + d * ent_c[:, None]
        mtp = jnp.where(live, cap - ent_c, -1.0)

        # sort: treelet-major (dead rays last), within a treelet by
        # direction octant + entry-point morton so hulls stay tight.
        # lax.sort with the index as payload — one pass, no argsort+take.
        # _DIR_BITS > 0 trades the LOWEST morton bits for in-octant
        # direction bits: when one morton cell overfills a tile, sub-tiles
        # split by direction instead of arbitrarily (the round-2 "replace
        # morton with dir bits" experiment lost origin locality and
        # measured 2x worse; this keeps morton dominant).
        q = jnp.clip((op - root_lo) / ext, 0.0, 1.0)
        mbits = 19 - _DIR_BITS
        mor = morton3d(q).astype(jnp.uint32) >> jnp.uint32(30 - mbits)
        if _DIR_BITS:
            dk = morton3d(jnp.abs(d)).astype(jnp.uint32) \
                >> jnp.uint32(30 - _DIR_BITS)
            mor = (mor << jnp.uint32(_DIR_BITS)) | dk
        skey = jnp.where(live, jnp.where(slot_r < 0, S, slot_r),
                         S + 1).astype(jnp.uint32)
        key = (skey << jnp.uint32(22)) | (octant << jnp.uint32(19)) | mor
        key_p = jnp.concatenate(
            [key, jnp.full((npad - n,), jnp.uint32((S + 1) << 22))]) \
            if npad > n else key
        key_s, perm = jax.lax.sort((key_p, iota_np), num_keys=1,
                                   is_stable=True)
        skey_s = (key_s >> jnp.uint32(22)).astype(jnp.int32)

        # ONE fused 32B-row gather routes pairs into the sorted contiguous
        # layout (an (n,8)-row-scatter variant measured 40% SLOWER — TPU
        # row scatters cost more per row than row gathers); padding rows
        # carry max_t = -1 so they never traverse.
        tbl8 = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                          d[:, 0], d[:, 1], d[:, 2], ent_c, mtp], axis=1)
        if npad > n:
            pad_row = jnp.concatenate(
                [jnp.zeros((3,)), jnp.ones((3,)), jnp.zeros((1,)),
                 jnp.full((1,), -1.0)]).astype(jnp.float32)
            tbl8 = jnp.concatenate(
                [tbl8, jnp.broadcast_to(pad_row, (npad - n, 8))], axis=0)
        g8 = jnp.take(tbl8, perm, axis=0)               # (npad, 8)
        op_k = g8[:, 0:3] + g8[:, 3:6] * g8[:, 6:7]
        d_k = g8[:, 3:6]
        mt_k = g8[:, 7]

        split, rootA, rootB = _two_pass_tile_meta(
            skey_s, troots, S, n_tiles, chunk, lca_steps, npad)
        tile_roots = jnp.stack([rootA, rootB]).reshape(
            2, n_groups, INTERLEAVE)
        tile_splits = split.reshape(n_groups, INTERLEAVE)

        rays8 = _pack_rays(op_k, d_k, mt_k, npad, npad, n_groups,
                           INTERLEAVE, rows, pad_maxt=-1.0)
        fo, hp = _fanout_for(cbvh)
        t_t, prim_t, u_t, v_t = _cluster_traverse(
            rays8, sg(cbvh.nodes), sg(cbvh.tris), cbvh.num_clusters,
            cbvh.cluster_size, any_hit=any_hit, interpret=interpret,
            tile_roots=tile_roots, tile_splits=tile_splits,
            fanout=fo, heap=hp, half_skip=_half_skip_for(cbvh))

        # un-sort: ONE sort keyed by the carried original pair index puts
        # the outputs back in ray order (replaces the round-2
        # scatter + row-gather pair).  any_hit never writes u/v in the
        # kernel, so the shadow path drops those two payload columns.
        if any_hit:
            _, t_o, p_o = jax.lax.sort(
                (perm, t_t.reshape(-1), prim_t.reshape(-1)), num_keys=1)
            u_o = v_o = jnp.zeros_like(t_o)
        else:
            _, t_o, p_o, u_o, v_o = jax.lax.sort(
                (perm, t_t.reshape(-1), prim_t.reshape(-1),
                 u_t.reshape(-1), v_t.reshape(-1)), num_keys=1)
        res = jnp.stack([t_o[:n], p_o[:n], u_o[:n], v_o[:n]], axis=1)
        prim_r = res[:, 1]
        hit_r = live & (prim_r >= 0.0)
        tg = ent_c + res[:, 0]
        upd = hit_r & (tg < bt)
        bt = jnp.where(upd, tg, bt)
        bp = jnp.where(upd, prim_r, bp)
        bu = jnp.where(upd, res[:, 2], bu)
        bv = jnp.where(upd, res[:, 3], bv)
        return bt, bp, bu, bv

    init = (jnp.full((n,), FLT_MAX, jnp.float32),
            jnp.full((n,), -1.0, jnp.float32),
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32))
    bt, bp, bu, bv = jax.lax.fori_loop(0, m, round_fn, init)
    outs = jnp.stack([bt, bp, bu, bv], axis=1)
    outs = checkpoint_name(outs, "traced_hits")
    return outs


def binned_closest_hit(ray: Ray, cbvh: ClusterBVH, mesh, max_t=FLT_MAX,
                       interpret: bool = False, m: int = BIN_M) -> HitRecord:
    """Closest hit via treelet binning; differentiable by recompute."""
    assert cbvh.treelet_size > 0, \
        "binned traversal needs a treelet-built ClusterBVH " \
        "(build_cluster_bvh(..., treelet_size=T))"
    outs = _binned_trace(ray, cbvh, max_t, interpret, m, any_hit=False)
    bs = ray.batch_shape
    prim_flat = outs[:, 1]
    hit = (prim_flat >= 0.0).reshape(bs)
    pid = jnp.where(hit, prim_flat.reshape(bs).astype(jnp.int32), 0)
    kt = outs[:, 0].reshape(bs)
    ku = outs[:, 2].reshape(bs)
    kv = outs[:, 3].reshape(bs)
    v1, e1, e2 = mesh.corners()
    tbl = jnp.concatenate(
        [v1, e1, e2, jnp.zeros(v1.shape[:-1] + (7,), v1.dtype)], axis=-1)
    t, u, v = _hit_tuv(ray.ori, ray.dir, tbl, pid, kt, ku, kv)
    return HitRecord(
        hit=hit,
        t=jnp.where(hit, t, FLT_MAX),
        prim_id=pid.astype(jnp.int32),
        geom_id=jnp.take(mesh.geom_ids, pid),
        u=jnp.where(hit, u, 0.0),
        v=jnp.where(hit, v, 0.0),
    )


def binned_any_hit(ray: Ray, cbvh: ClusterBVH, mesh, max_t,
                   interpret: bool = False, m: int = BIN_M) -> HitRecord:
    """Occlusion query via treelet binning (any pair hit occludes)."""
    assert cbvh.treelet_size > 0
    outs = _binned_trace(ray, cbvh, max_t, interpret, m, any_hit=True)
    bs = ray.batch_shape
    prim_flat = outs[:, 1].reshape(bs)
    t = outs[:, 0].reshape(bs)
    hit = prim_flat >= 0.0
    pid = jnp.where(hit, prim_flat.astype(jnp.int32), 0)
    return HitRecord(
        hit=hit, t=jnp.where(hit, t, FLT_MAX),
        prim_id=pid.astype(jnp.int32),
        geom_id=jnp.take(mesh.geom_ids, pid),
        u=jnp.zeros_like(t), v=jnp.zeros_like(t),
    )


def cluster_any_hit(ray: Ray, cbvh: ClusterBVH, mesh, max_t,
                    interpret: bool = False,
                    sort_rays: bool = True) -> HitRecord:
    """Occlusion query with whole-tile early exit."""
    sg = jax.lax.stop_gradient
    o = sg(ray.ori.reshape(-1, 3))
    d = sg(ray.dir.reshape(-1, 3))
    n = o.shape[0]
    chunk = TILE_ROWS * 128 * INTERLEAVE
    npad = _round_up(max(n, chunk), chunk)
    n_groups = npad // chunk
    mt = sg(jnp.broadcast_to(jnp.asarray(max_t, jnp.float32),
                             ray.batch_shape).reshape(-1))
    if sort_rays and n > chunk:
        perm, inv = _coherence_perm(o, d, sg(cbvh.nodes[0, 0:3]),
                                    sg(cbvh.nodes[0, 3:6]))
        rt = jnp.take(jnp.concatenate(
            [o, d, mt[:, None], jnp.zeros((n, 1), o.dtype)], axis=1),
            perm, axis=0)
        o, d, mt = rt[:, 0:3], rt[:, 3:6], rt[:, 6]
    else:
        inv = None
    rays8 = _pack_rays(o, d, mt, n, npad, n_groups, INTERLEAVE, TILE_ROWS,
                       pad_maxt=-1.0)
    fo, hp = _fanout_for(cbvh)
    t_tiles, prim_f, _, _ = _cluster_traverse(
        rays8, sg(cbvh.nodes), sg(cbvh.tris), cbvh.num_clusters,
        cbvh.cluster_size, any_hit=True, interpret=interpret,
        fanout=fo, heap=hp, half_skip=_half_skip_for(cbvh))
    t_tiles, prim_f = checkpoint_name((t_tiles, prim_f), "traced_hits")
    outs = jnp.stack([t_tiles.reshape(-1)[:n], prim_f.reshape(-1)[:n]],
                     axis=1)
    if inv is not None:
        outs = jnp.take(outs, inv, axis=0)
    bs = ray.batch_shape
    prim_flat = outs[:, 1].reshape(bs)
    t = outs[:, 0].reshape(bs)
    hit = prim_flat >= 0.0
    pid = jnp.where(hit, prim_flat.astype(jnp.int32), 0)
    return HitRecord(
        hit=hit, t=jnp.where(hit, t, FLT_MAX),
        prim_id=pid.astype(jnp.int32),
        geom_id=jnp.take(mesh.geom_ids, pid),
        u=jnp.zeros_like(t), v=jnp.zeros_like(t),
    )
