"""Unit tests pinning the two-pass tile metadata (_two_pass_tile_meta).

The binned traversal's contiguous sorted layout assigns each kernel tile
(split, rootA, rootB): pass A traverses the tile's first treelet segment
from its root, pass B the remainder from its own root / the heap LCA of
the spanned treelets / the global root when a whole-tree slot lands in
pass B.  These cases are exercised natively only through the full binned
path; this pins the metadata itself on CPU (VERDICT r3 #9: a tile
straddling a segment boundary with a whole-tree slot in pass B).

Key encoding (one sorted i32 per lane): treelet index in [0, S);
S = whole-tree (overflow) slot; S+1 = dead/padding lane.
Top-tree layout: complete heap, treelet s's root at node row (S-1)+s
(cluster_bvh.py:364).
"""

import jax.numpy as jnp
import numpy as np

from visionaray_tpu.ops.pallas.traverse import _two_pass_tile_meta

S = 4                       # treelets -> heap leaves at rows 3..6
TROOTS = jnp.arange(S, dtype=jnp.int32) + (S - 1)
CHUNK = 8                   # tiny synthetic tiles (the helper is generic)
LCA_STEPS = 3


def _meta(skey_rows):
    skey_s = jnp.asarray(np.concatenate(skey_rows), jnp.int32)
    npad = int(skey_s.shape[0])
    n_tiles = npad // CHUNK
    split, rootA, rootB = _two_pass_tile_meta(
        skey_s, TROOTS, S, n_tiles, CHUNK, LCA_STEPS, npad)
    return (np.asarray(split), np.asarray(rootA), np.asarray(rootB))


def test_single_segment_tile():
    """One treelet fills the tile: split == chunk (pass B empty)."""
    split, rootA, _ = _meta([[0] * CHUNK])
    assert split[0] == CHUNK
    assert rootA[0] == 3            # troots[0]


def test_straddle_adjacent_treelets():
    """Tile straddles treelets 0|1: split at the boundary, rootB = the
    second treelet's own root (LCA of a single leaf is itself)."""
    split, rootA, rootB = _meta([[0, 0, 0, 1, 1, 1, 1, 1]])
    assert split[0] == 3
    assert rootA[0] == 3            # troots[0]
    assert rootB[0] == 4            # troots[1]


def test_straddle_multi_segment_lca():
    """Pass B spans treelets 2..3 (heap leaves 5, 6): rootB is their heap
    LCA, internal node 2 — not the global root."""
    split, rootA, rootB = _meta([[1, 1, 2, 2, 3, 3, 3, 3]])
    assert split[0] == 2
    assert rootA[0] == 4            # troots[1]
    assert rootB[0] == 2            # parent of leaves 5 and 6


def test_straddle_whole_tree_slot_in_pass_b():
    """THE VERDICT case: tile straddles a segment boundary and pass B
    contains a whole-tree (overflow) slot -> rootB must be the global
    root 0.  Trailing dead lanes must not affect it."""
    split, rootA, rootB = _meta([[0, 0, 0, 0, S, S, S + 1, S + 1]])
    assert split[0] == 4
    assert rootA[0] == 3            # troots[0]
    assert rootB[0] == 0            # whole-tree => global root


def test_dead_lanes_do_not_widen_root_b():
    """Pass B = treelet 1 followed by dead padding: the last LIVE lane
    bounds the span, so rootB stays treelet 1's root (dead lanes carry
    max_t = -1 and never traverse, but a widened root would still cost
    frustum work)."""
    split, _, rootB = _meta([[0, 0, 1, 1, S + 1, S + 1, S + 1, S + 1]])
    assert split[0] == 2
    assert rootB[0] == 4            # troots[1], NOT an ancestor


def test_whole_tree_leading_tile():
    """Tile made entirely of whole-tree slots: pass A from the global
    root, split covers the whole segment."""
    split, rootA, _ = _meta([[S] * CHUNK])
    assert rootA[0] == 0
    assert split[0] == CHUNK


def test_multi_tile_mixed():
    """Two tiles over one sorted array: segment spilling across the tile
    boundary gives tile 1 a single-pass layout of the SAME treelet."""
    split, rootA, rootB = _meta([[0, 0, 0, 0, 0, 0, 1, 1],
                                 [1, 1, 1, 1, 2, 2, 2, 2]])
    # tile 0: treelet 0 then 1
    assert split[0] == 6 and rootA[0] == 3 and rootB[0] == 4
    # tile 1: treelet 1 continues (4 lanes), then treelet 2
    assert split[1] == 4 and rootA[1] == 4 and rootB[1] == 5


def test_all_dead_tile():
    """Padding-only tile: rootA falls back to the global root and split
    stays in [1, chunk] (the kernel retires it on the first frustum
    test via max_t = -1)."""
    split, rootA, _ = _meta([[0] * CHUNK, [S + 1] * CHUNK])
    assert rootA[1] == 0
    assert 1 <= split[1] <= CHUNK
