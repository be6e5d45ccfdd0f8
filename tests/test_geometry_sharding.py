"""Real geometry sharding (VERDICT round 1 Missing #6 / Next #4).

8-device CPU mesh: spatially partitioned shards with LOCAL buffers and
per-shard acceleration structures must match the replicated result at
100k-triangle scale, with per-shard memory ~1/D and gradients recomputed
in the same ring pass (no second rotation)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.core.scene import TriangleMesh
from visionaray_tpu.core.types import FLT_MAX, Ray
from visionaray_tpu.parallel.ring import (
    geometry_sharded_any_hit, geometry_sharded_closest_hit, shard_geometry,
)
from visionaray_tpu.parallel.tile_sharding import make_mesh
from visionaray_tpu.scenes import random_triangles


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def _rays(n, extent, seed=3, toward=None):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    if toward is None:
        d = rng.normal(size=(n, 3)).astype(np.float32)
    else:
        d = (toward[rng.integers(0, len(toward), n)] - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Ray(jnp.asarray(o), jnp.asarray(d))


class TestGeometryShardingSmall:
    """64-tri brute-force backend: exact semantics, fast on CI."""

    @pytest.fixture(scope="class")
    def setup(self):
        verts, faces = random_triangles(64, seed=2, extent=3.0, tri_size=0.8)
        tm = TriangleMesh.create(verts, faces,
                                 geom_ids=np.arange(64, dtype=np.int32) % 5)
        geo = shard_geometry(tm, 8, backend="brute")
        cent = verts.reshape(-1, 3, 3).mean(axis=1)
        ray = _rays(128, 2.5, toward=cent)
        return tm, geo, ray

    def test_matches_unsharded(self, setup, mesh8):
        tm, geo, ray = setup
        from visionaray_tpu.ops.trace import intersect_triangles_brute
        v1, e1, e2 = tm.corners()
        ref = intersect_triangles_brute(ray, v1, e1, e2, tm.geom_ids)
        got = geometry_sharded_closest_hit(ray, geo, mesh8)
        np.testing.assert_array_equal(np.asarray(got.hit),
                                      np.asarray(ref.hit))
        m = np.asarray(ref.hit)
        np.testing.assert_allclose(np.asarray(got.t)[m],
                                   np.asarray(ref.t)[m], rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(got.geom_id)[m],
                                      np.asarray(ref.geom_id)[m])
        # global prim ids map back to the original faces
        per = geo.prims_per_shard
        pid = np.asarray(got.prim_id)[m]
        orig = np.asarray(geo.prim_ids).reshape(-1)[pid]
        np.testing.assert_array_equal(orig, np.asarray(ref.prim_id)[m])

    def test_any_hit(self, setup, mesh8):
        tm, geo, ray = setup
        from visionaray_tpu.ops.trace import intersect_triangles_brute
        v1, e1, e2 = tm.corners()
        ref = intersect_triangles_brute(ray, v1, e1, e2, tm.geom_ids)
        got = geometry_sharded_any_hit(ray, jnp.float32(1e30), geo, mesh8)
        np.testing.assert_array_equal(np.asarray(got.hit),
                                      np.asarray(ref.hit))
        # max_t below the first hit -> unoccluded
        tmax = jnp.where(ref.hit, ref.t * 0.9, 1e30)
        got2 = geometry_sharded_any_hit(ray, tmax, geo, mesh8)
        assert not np.asarray(got2.hit)[np.asarray(ref.hit)].any()

    def test_fused_grads_match_unsharded(self, setup, mesh8):
        """Gradients come out of the SAME ring pass (fused recompute) and
        must match the unsharded recompute gradient, mapped through the
        shard permutation."""
        tm, geo, ray = setup
        F = tm.num_prims

        def loss(soup_v1, soup_e1, soup_e2):
            geo2 = dataclasses.replace(
                geo, soup=dataclasses.replace(
                    geo.soup, v1=soup_v1, e1=soup_e1, e2=soup_e2))
            hr = geometry_sharded_closest_hit(ray, geo2, mesh8)
            return jnp.sum(jnp.where(hr.hit, hr.t, 0.0))

        g1, ge1, ge2 = jax.grad(loss, argnums=(0, 1, 2))(
            geo.soup.v1, geo.soup.e1, geo.soup.e2)
        assert np.isfinite(np.asarray(g1)).all()

        from visionaray_tpu.ops.trace import intersect_triangles_brute
        v1, e1, e2 = tm.corners()

        def loss_ref(v1, e1, e2):
            hr = intersect_triangles_brute(ray, v1, e1, e2, tm.geom_ids)
            return jnp.sum(jnp.where(hr.hit, hr.t, 0.0))

        r1, re1, re2 = jax.grad(loss_ref, argnums=(0, 1, 2))(v1, e1, e2)

        # scatter soup grads back to original face order (pad slots repeat
        # the last face; only the winning copy carries grad)
        def back(g):
            return np.asarray(
                jnp.zeros((F, 3)).at[geo.prim_ids.reshape(-1)].add(
                    g.reshape(-1, 3)))

        for got_g, ref_g in ((g1, r1), (ge1, re1), (ge2, re2)):
            a, b = back(got_g), np.asarray(ref_g)
            close = np.isclose(a, b, rtol=1e-4, atol=1e-6)
            # closest-hit ties (shard visit order vs index order) may move
            # a grad to an equally-valid coincident triangle
            assert close.mean() > 0.97, f"only {close.mean():.3f} match"


class TestGeometryShardingScale:
    """100k triangles, per-shard LBVH backend (VERDICT acceptance test)."""

    @pytest.fixture(scope="class")
    def setup(self):
        verts, faces = random_triangles(100_000, seed=11, extent=10.0,
                                        tri_size=0.25)
        tm = TriangleMesh.create(verts, faces)
        geo = shard_geometry(tm, 8, backend="lbvh")
        cent = verts.reshape(-1, 3, 3).mean(axis=1)
        ray = _rays(1024, 9.0, seed=5, toward=cent[::7])
        return tm, geo, ray

    def test_memory_is_sharded(self, setup):
        tm, geo, _ = setup
        F = tm.num_prims
        D = geo.num_shards
        # per-shard soup holds ceil(F/D) records — nothing is broadcast
        assert geo.soup.v1.shape == (D, -(-F // D), 3)
        assert geo.bvh.node_lo.shape[0] == D
        # spatial partition: shard boxes are compact (mean shard volume a
        # small fraction of the scene box, not ~equal to it)
        lo = np.asarray(geo.shard_lo)
        hi = np.asarray(geo.shard_hi)
        svol = np.prod(hi - lo, axis=1)
        scene_vol = np.prod(hi.max(0) - lo.min(0))
        assert svol.mean() < 0.35 * scene_vol

    def test_matches_replicated_lbvh(self, setup, mesh8):
        tm, geo, ray = setup
        from visionaray_tpu.ops.lbvh import build_lbvh
        from visionaray_tpu.ops.traversal import bvh_closest_hit
        ref = bvh_closest_hit(ray, build_lbvh(tm), tm)
        got = geometry_sharded_closest_hit(ray, geo, mesh8)
        np.testing.assert_array_equal(np.asarray(got.hit),
                                      np.asarray(ref.hit))
        m = np.asarray(ref.hit)
        assert m.sum() > 100
        # rtol 1e-4: winner recompute order differs between the sharded and
        # replicated paths, so near-coincident surfaces can flip to an
        # equally-valid triangle one f32 ulp away
        np.testing.assert_allclose(np.asarray(got.t)[m],
                                   np.asarray(ref.t)[m], rtol=1e-4)
