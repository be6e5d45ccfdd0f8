"""Native SBVH builder: spatial splits + multi-prim leaves.

Reference semantics: detail/bvh/sah.h:430-615 (spatial bins, chopped
triangles, duplication), sah.h:651 (alpha * SA(root) gate),
detail/bvh/build.inl:139 (max_leaf_size=4 default).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.core.scene import TriangleMesh
from visionaray_tpu.core.types import Ray
from visionaray_tpu.ops import sah
from visionaray_tpu.ops.lbvh import build_lbvh, sah_cost
from visionaray_tpu.ops.traversal import bvh_any_hit, bvh_closest_hit

pytestmark = pytest.mark.skipif(not sah.available(),
                                reason="native builder unavailable")


def _mesh(vertices, faces):
    return TriangleMesh(
        vertices=jnp.asarray(vertices, jnp.float32),
        faces=jnp.asarray(faces, jnp.int32),
        normals=None, corner_normals=None, tex_coords=None,
        geom_ids=jnp.zeros((len(faces),), jnp.int32))


def _random_mesh(n, seed=0, diag_frac=0.25):
    """Random small tris + a fraction of long diagonal slivers (the case
    where spatial splits beat object splits)."""
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    small = v0[:, None, :] + rng.uniform(
        0.01, 0.08, (n, 2, 3)).astype(np.float32)
    tris = np.concatenate([v0[:, None, :], small], axis=1)
    ndiag = int(n * diag_frac)
    for i in range(ndiag):
        a = rng.uniform(0, 1, 3)
        b = a + rng.uniform(0.3, 0.9, 3) * rng.choice([-1, 1], 3)
        c = a + rng.uniform(0.0, 0.05, 3)
        tris[i] = np.stack([a, b, c]).astype(np.float32)
    verts = tris.reshape(-1, 3)
    faces = np.arange(3 * n).reshape(n, 3)
    return _mesh(verts, faces)


def _brute_closest(mesh, o, d):
    from visionaray_tpu.ops.intersect import intersect_triangle
    v1, e1, e2 = mesh.corners()
    t, u, v, hit = intersect_triangle(
        o[:, None, :], d[:, None, :], v1[None], e1[None], e2[None])
    t = jnp.where(hit & (t >= 0.0), t, jnp.inf)
    ti = jnp.argmin(t, axis=1)
    tb = jnp.take_along_axis(t, ti[:, None], axis=1)[:, 0]
    return tb, ti


def test_sbvh_structure():
    mesh = _random_mesh(200)
    bvh = sah.build_sbvh(mesh, max_leaf_size=4)
    L = bvh.num_leaves
    assert bvh.node_lo.shape[0] == 2 * L - 1
    first = np.asarray(bvh.leaf_first)
    cnt = np.asarray(bvh.leaf_count)
    assert (cnt >= 1).all() and (cnt <= 4).all()
    # leaf ranges tile prim_refs exactly
    order = np.argsort(first)
    assert (first[order] + cnt[order])[:-1].tolist() == \
        first[order][1:].tolist()
    assert first[order][0] == 0
    assert first[order][-1] + cnt[order][-1] == bvh.num_prims
    # every original primitive appears at least once
    assert set(np.asarray(bvh.prim_ids).tolist()) == set(range(200))
    # children inside parents
    lo = np.asarray(bvh.node_lo)
    hi = np.asarray(bvh.node_hi)
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    for ch in (left, right):
        assert (lo[: L - 1] <= lo[ch] + 1e-5).all()
        assert (hi[: L - 1] >= hi[ch] - 1e-5).all()


def test_sbvh_uses_spatial_splits():
    mesh = _random_mesh(300, seed=1, diag_frac=0.4)
    bvh = sah.build_sbvh(mesh, alpha=1e-5, max_leaf_size=4)
    # duplication happened (refs > prims) on a sliver-heavy scene
    assert bvh.num_prims > 300


def test_sbvh_closest_hit_matches_brute_force():
    mesh = _random_mesh(150, seed=2)
    bvh = sah.build_sbvh(mesh, max_leaf_size=4)
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.uniform(-0.2, 1.2, (256, 3)).astype(np.float32))
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    hr = bvh_closest_hit(Ray(o, d), bvh, mesh)
    tb, ib = _brute_closest(mesh, o, d)
    hit_b = np.isfinite(np.asarray(tb))
    np.testing.assert_array_equal(np.asarray(hr.hit), hit_b)
    np.testing.assert_allclose(np.asarray(hr.t)[hit_b],
                               np.asarray(tb)[hit_b], rtol=1e-4)


def test_sbvh_any_hit_matches_closest():
    mesh = _random_mesh(100, seed=4)
    bvh = sah.build_sbvh(mesh, max_leaf_size=4)
    rng = np.random.default_rng(5)
    o = jnp.asarray(rng.uniform(0, 1, (128, 3)).astype(np.float32))
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    ch = bvh_closest_hit(Ray(o, d), bvh, mesh)
    ah = bvh_any_hit(Ray(o, d), bvh, mesh, max_t=jnp.float32(1e30))
    np.testing.assert_array_equal(np.asarray(ah.hit), np.asarray(ch.hit))


def test_sbvh_cost_beats_lbvh():
    mesh = _random_mesh(400, seed=6, diag_frac=0.3)
    lb = build_lbvh(mesh)
    sb = sah.build_sbvh(mesh, max_leaf_size=4)
    c_l = sah_cost(lb)
    c_s = sah_cost(sb)
    assert c_s < c_l, (c_s, c_l)


def test_sbvh_single_leaf_degenerate():
    mesh = _random_mesh(3, seed=7, diag_frac=0.0)
    bvh = sah.build_sbvh(mesh, max_leaf_size=4)
    rng = np.random.default_rng(8)
    o = jnp.asarray(rng.uniform(-0.2, 1.2, (32, 3)).astype(np.float32))
    d = rng.normal(size=(32, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    hr = bvh_closest_hit(Ray(o, d), bvh, mesh)
    tb, _ = _brute_closest(mesh, o, d)
    hit_b = np.isfinite(np.asarray(tb))
    np.testing.assert_array_equal(np.asarray(hr.hit), hit_b)
