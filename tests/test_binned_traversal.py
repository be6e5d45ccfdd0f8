"""Treelet-composite ClusterBVH + binned traversal vs brute force
(interpret mode on CPU — sizes kept tiny, interpret Pallas is slow)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.core.scene import TriangleMesh
from visionaray_tpu.core.types import Ray
from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
from visionaray_tpu.ops.pallas.traverse import (
    binned_any_hit, binned_closest_hit, cluster_closest_hit,
)
from visionaray_tpu.ops.trace import intersect_triangles_brute
from visionaray_tpu.scenes import random_triangles

N_TRIS = 96


@pytest.fixture(scope="module")
def setup():
    verts, faces = random_triangles(N_TRIS, seed=7, extent=3.0, tri_size=0.8)
    mesh = TriangleMesh.create(verts, faces)
    build = jax.jit(build_cluster_bvh,
                    static_argnames=("cluster_size", "treelet_size"))
    cbvh = build(mesh, cluster_size=8, treelet_size=4)
    # incoherent rays: random origins inside the scene, most aimed at
    # random triangle centroids (guaranteed hits), the rest random misses
    rng = np.random.default_rng(3)
    n = 40
    o = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    cent = verts.reshape(-1, 3, 3).mean(axis=1)
    targets = cent[rng.integers(0, len(cent), n)]
    d = (targets - o).astype(np.float32)
    d[32:] = rng.normal(size=(n - 32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ray = Ray(jnp.asarray(o), jnp.asarray(d))
    return mesh, cbvh, ray


def test_treelet_structure(setup):
    mesh, cbvh, _ = setup
    C = cbvh.num_clusters
    S = cbvh.num_treelets
    T = cbvh.treelet_size
    assert C == S * T
    assert cbvh.nodes.shape == (2 * C - 1, 8)
    assert cbvh.treelet_roots.shape == (S,)
    # every real prim id appears exactly once in the packed table
    rec = np.asarray(cbvh.tri_records())
    pids = rec[..., 9].astype(np.int64).ravel()
    e1 = rec[..., 3:6].reshape(-1, 3)
    real = np.abs(e1).sum(-1) > 0
    assert np.sort(pids[real]).tolist() == list(range(N_TRIS))
    # every treelet root's box contains its clusters' boxes
    nodes = np.asarray(cbvh.nodes)
    tlo = np.asarray(cbvh.treelet_lo)
    thi = np.asarray(cbvh.treelet_hi)
    leaf0 = C - 1
    for s in range(S):
        for j in range(T):
            row = nodes[leaf0 + s * T + j]
            if row[0] > row[3]:  # empty padding cluster
                continue
            assert (tlo[s] <= row[0:3] + 1e-5).all()
            assert (thi[s] >= row[3:6] - 1e-5).all()


def test_global_entry_still_correct(setup):
    """Entering the composite tree at row 0 must behave like the round-1
    single tree (the coherent path is unchanged)."""
    mesh, cbvh, ray = setup
    v1, e1, e2 = mesh.corners()
    ref = intersect_triangles_brute(ray, v1, e1, e2, mesh.geom_ids)
    got = cluster_closest_hit(ray, cbvh, mesh, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-5)


def test_binned_closest_matches_brute(setup):
    mesh, cbvh, ray = setup
    v1, e1, e2 = mesh.corners()
    ref = intersect_triangles_brute(ray, v1, e1, e2, mesh.geom_ids)
    assert np.asarray(ref.hit).sum() >= 10, "fixture must produce hits"
    got = binned_closest_hit(ray, cbvh, mesh, interpret=True, m=4)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.prim_id)[m],
                                  np.asarray(ref.prim_id)[m])


def test_binned_overflow_slot(setup):
    """m=2 forces the whole-tree overflow slot for almost every ray;
    results must still be exact."""
    mesh, cbvh, ray = setup
    v1, e1, e2 = mesh.corners()
    ref = intersect_triangles_brute(ray, v1, e1, e2, mesh.geom_ids)
    got = binned_closest_hit(ray, cbvh, mesh, interpret=True, m=2)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4)


def test_binned_any_hit(setup):
    mesh, cbvh, ray = setup
    v1, e1, e2 = mesh.corners()
    ref = intersect_triangles_brute(ray, v1, e1, e2, mesh.geom_ids)
    got = binned_any_hit(ray, cbvh, mesh, max_t=jnp.float32(1e30),
                         interpret=True, m=4)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    tmax = jnp.where(ref.hit, ref.t * 0.9, 1e30)
    got2 = binned_any_hit(ray, cbvh, mesh, max_t=tmax, interpret=True, m=4)
    assert not np.asarray(got2.hit)[np.asarray(ref.hit)].any()


def test_pathtracing_binned_matches_lbvh_tier(setup):
    """Full PT through the hoisted-bounce-0 + binned-scan path must match
    the jnp LBVH tier bit-for-bit-ish (same RNG, same estimator)."""
    from visionaray_tpu.core.scene import Scene
    from visionaray_tpu.core.camera import Pinhole
    from visionaray_tpu.ops.lbvh import build_lbvh
    from visionaray_tpu.shading.lights import PointLights
    from visionaray_tpu.shading.materials import Materials
    from visionaray_tpu.sched.render import render

    mesh, cbvh, _ = setup
    mats = Materials.matte(cd=(0.7, 0.5, 0.3))
    lights = PointLights.create(position=[[0.0, 5.0, 5.0]],
                                cl=(1.0, 1.0, 1.0), kl=1.0)
    base = Scene.create(mesh=mesh, materials=mats, lights=lights)
    s_cluster = dataclasses.replace(base, bvh=cbvh)
    s_lbvh = dataclasses.replace(base, bvh=build_lbvh(mesh))
    cam = Pinhole.create(eye=(0, 1, 9), center=(0, 0, 0),
                         fovy=np.deg2rad(45), aspect=1.0)
    rt_c = render(s_cluster, cam, 16, 16, algo="pathtracing", spp=1,
                  bounces=3, nee=True)
    rt_j = render(s_lbvh, cam, 16, 16, algo="pathtracing", spp=1,
                  bounces=3, nee=True)
    np.testing.assert_allclose(np.asarray(rt_c.color),
                               np.asarray(rt_j.color), atol=1e-4)


def test_binned_gradients(setup):
    mesh, cbvh, ray = setup

    def loss(verts):
        m2 = dataclasses.replace(mesh, vertices=verts)
        hr = binned_closest_hit(ray, cbvh, m2, interpret=True, m=4)
        return jnp.sum(jnp.where(hr.hit, hr.t, 0.0))

    g = jax.grad(loss)(mesh.vertices)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0.0


def test_half_skip_matches_brute():
    """K=16 kd build carries half-cluster AABBs (half_boxes): the kernel's
    half-skip MT gating must not change any hit (skipping a half whose box
    misses the tile hull is conservative-correct)."""
    from visionaray_tpu.ops.pallas.traverse import (
        binned_closest_hit, cluster_closest_hit,
    )
    verts, faces = random_triangles(160, seed=11, extent=3.0, tri_size=0.7)
    mesh = TriangleMesh.create(verts, faces)
    build = jax.jit(build_cluster_bvh,
                    static_argnames=("cluster_size", "treelet_size"))
    cbvh = build(mesh, cluster_size=16, treelet_size=4)
    assert cbvh.half_boxes
    import visionaray_tpu.ops.pallas.traverse as trav
    monkey_prev = trav._HALFSKIP_ENV
    trav._HALFSKIP_ENV = True   # the skip is off by default (PERF r5)
    rng = np.random.default_rng(5)
    n = 48
    o = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    cent = verts.reshape(-1, 3, 3).mean(axis=1)
    d = (cent[rng.integers(0, len(cent), n)] - o).astype(np.float32)
    d[40:] = rng.normal(size=(n - 40, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ray = Ray(jnp.asarray(o), jnp.asarray(d))
    try:
        v1, e1, e2 = mesh.corners()
        ref = intersect_triangles_brute(ray, v1, e1, e2, mesh.geom_ids)
        for fn in (binned_closest_hit, cluster_closest_hit):
            got = fn(ray, cbvh, mesh, interpret=True)
            np.testing.assert_array_equal(np.asarray(got.hit),
                                          np.asarray(ref.hit))
            np.testing.assert_allclose(
                np.asarray(got.t)[np.asarray(ref.hit)],
                np.asarray(ref.t)[np.asarray(ref.hit)], rtol=1e-5)
            np.testing.assert_array_equal(
                np.asarray(got.prim_id)[np.asarray(ref.hit)],
                np.asarray(ref.prim_id)[np.asarray(ref.hit)])
    finally:
        trav._HALFSKIP_ENV = monkey_prev
