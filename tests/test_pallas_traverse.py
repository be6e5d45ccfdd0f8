"""Pallas cluster-BVH traversal vs brute force (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.core.scene import TriangleMesh
from visionaray_tpu.core.types import Ray
from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
from visionaray_tpu.ops.pallas.traverse import (
    cluster_any_hit, cluster_closest_hit,
)
from visionaray_tpu.ops.trace import intersect_triangles_brute
from visionaray_tpu.scenes import random_triangles


N_TRIS = 48  # small: interpret-mode Pallas is very slow on the CI CPU


@pytest.fixture(scope="module")
def setup():
    verts, faces = random_triangles(N_TRIS, seed=5, extent=3.0, tri_size=1.0)
    mesh = TriangleMesh.create(verts, faces)
    build = jax.jit(build_cluster_bvh, static_argnames=("cluster_size",))
    cbvh = build(mesh, cluster_size=16)
    # aim rays at triangle centroids (guaranteed hits) plus some misses
    rng = np.random.default_rng(1)
    cent = verts.reshape(-1, 3, 3).mean(axis=1)
    targets = cent[rng.integers(0, len(cent), 24)]
    o = np.stack([rng.uniform(-1, 1, 32), rng.uniform(-1, 1, 32),
                  np.full(32, -9.0)], -1).astype(np.float32)
    d = np.zeros_like(o)
    d[:24] = targets - o[:24]
    d[24:] = [0.0, 0.0, 1.0]
    d[24:, :2] += rng.uniform(5, 9, (8, 2))  # shoot far off to the side
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ray = Ray(jnp.asarray(o), jnp.asarray(d))
    return mesh, cbvh, ray


def test_structure(setup):
    mesh, cbvh, _ = setup
    assert cbvh.num_clusters == -(-N_TRIS // 16)
    assert cbvh.tris.shape == (cbvh.num_clusters, 16 // 8, 128)
    # every real prim id appears exactly once
    rec = np.asarray(cbvh.tri_records())
    pids = rec[..., 9].astype(np.int64).ravel()
    e1 = rec[..., 3:6].reshape(-1, 3)
    real = (np.abs(e1).sum(-1) > 0)
    assert np.sort(pids[real]).tolist() == list(range(N_TRIS))


def test_closest_matches_brute(setup):
    mesh, cbvh, ray = setup
    v1, e1, e2 = mesh.corners()
    ref = intersect_triangles_brute(ray, v1, e1, e2, mesh.geom_ids)
    assert np.asarray(ref.hit).sum() >= 20, "fixture must produce hits"
    got = cluster_closest_hit(ray, cbvh, mesh, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.prim_id)[m],
                                  np.asarray(ref.prim_id)[m])


def test_any_hit(setup):
    mesh, cbvh, ray = setup
    v1, e1, e2 = mesh.corners()
    ref = intersect_triangles_brute(ray, v1, e1, e2, mesh.geom_ids)
    got = cluster_any_hit(ray, cbvh, mesh, max_t=jnp.float32(1e30),
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    # cut max_t below first hit -> no occlusion reported
    tmax = jnp.where(ref.hit, ref.t * 0.9, 1e30)
    got2 = cluster_any_hit(ray, cbvh, mesh, max_t=tmax, interpret=True)
    assert not np.asarray(got2.hit)[np.asarray(ref.hit)].any()


def test_gradients_via_recompute(setup):
    mesh, cbvh, ray = setup

    def loss(verts):
        import dataclasses
        m2 = dataclasses.replace(mesh, vertices=verts)
        hr = cluster_closest_hit(ray, cbvh, m2, interpret=True)
        return jnp.sum(jnp.where(hr.hit, hr.t, 0.0))

    g = jax.grad(loss)(mesh.vertices)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0.0
