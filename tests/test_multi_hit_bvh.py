"""multi_hit through the BVH (VERDICT round 1 Missing #3): the sorted-K
traversal and the Pallas K-re-trace must match brute force, including at
teapot scale."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.core.scene import Scene, TriangleMesh
from visionaray_tpu.core.types import FLT_MAX, Ray
from visionaray_tpu.ops.lbvh import build_lbvh
from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
from visionaray_tpu.ops.trace import multi_hit
from visionaray_tpu.shading.materials import Materials


def _stacked_quads(n=5):
    verts, faces, gids = [], [], []
    for i in range(n):
        z = 1.0 + i
        base = len(verts)
        verts += [[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]]
        faces += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
        gids += [i, i]
    mesh = TriangleMesh.create(np.asarray(verts, np.float32),
                               np.asarray(faces, np.int32),
                               geom_ids=np.asarray(gids, np.int32))
    mats = Materials.concatenate([Materials.matte()] * n)
    return mesh, Scene.create(mesh=mesh, materials=mats)


RAYS = Ray(ori=jnp.asarray([[0.3, -0.4, 0.0], [0.3, 0.4, 10.0],
                            [5.0, 5.0, 0.0]]),
           dir=jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0],
                            [0.0, 0.0, 1.0]]))


def _assert_matches_brute(scene_acc, scene, k=4, rays=RAYS, rtol=1e-5):
    got = multi_hit(rays, scene_acc, k=k)
    ref = multi_hit(rays, scene, k=k, use_bvh=False)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                               rtol=rtol)
    np.testing.assert_array_equal(np.asarray(got.geom_id)[m],
                                  np.asarray(ref.geom_id)[m])


class TestMultiHitBVH:
    def test_lbvh_matches_brute(self):
        mesh, scene = _stacked_quads()
        _assert_matches_brute(
            dataclasses.replace(scene, bvh=build_lbvh(mesh)), scene)

    def test_cluster_matches_brute(self):
        mesh, scene = _stacked_quads()
        _assert_matches_brute(
            dataclasses.replace(scene,
                                bvh=build_cluster_bvh(mesh, cluster_size=8)),
            scene)

    def test_k_truncates_sorted(self):
        mesh, scene = _stacked_quads(n=6)
        scene_b = dataclasses.replace(scene, bvh=build_lbvh(mesh))
        rec = multi_hit(RAYS, scene_b, k=3)
        np.testing.assert_allclose(np.asarray(rec.t[0]), [1.0, 2.0, 3.0],
                                   rtol=1e-5)

    def test_teapot_scale_matches_brute(self):
        from visionaray_tpu.scenes import teapot_mesh
        verts, faces = teapot_mesh()
        mesh = TriangleMesh.create(verts, faces)
        scene = Scene.create(mesh=mesh, materials=Materials.matte())
        scene_b = dataclasses.replace(scene, bvh=build_lbvh(mesh))
        rng = np.random.default_rng(0)
        n = 64
        o = np.float32(rng.uniform(-4, 4, (n, 3)))
        o[:, 2] = 6.0
        d = np.float32([[0, 0, -1.0]]).repeat(n, axis=0)
        rays = Ray(ori=jnp.asarray(o), dir=jnp.asarray(d))
        _assert_matches_brute(scene_b, scene, k=8, rays=rays)

    def test_gradients(self):
        import jax
        mesh, scene = _stacked_quads()
        scene_b = dataclasses.replace(scene, bvh=build_lbvh(mesh))

        def loss(verts):
            m2 = dataclasses.replace(mesh, vertices=verts)
            s2 = dataclasses.replace(scene_b, mesh=m2, bvh=build_lbvh(m2))
            rec = multi_hit(RAYS, s2, k=3)
            return jnp.sum(jnp.where(rec.hit, rec.t, 0.0))

        g = jax.grad(loss)(mesh.vertices)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0.1
