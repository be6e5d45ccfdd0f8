"""Shape/dtype contract tests — the TPU analogue of the reference's
negative compile tests (test/compile_failure_tests/*, SURVEY §4 item 5):
invalid pytrees must refuse to trace, and valid ones must trace to the
expected output shapes WITHOUT executing (jax.eval_shape)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.scene import Scene, TriangleMesh
from visionaray_tpu.core.types import Ray
from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.kernels.pathtracing import pathtracing_kernel
from visionaray_tpu.ops.sampling import Sampler


def _tiny_scene():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    return Scene.create(mesh=TriangleMesh.create(verts, faces))


class TestRefusesToTrace:
    def test_cluster_bvh_rejects_f32_unsafe_prim_count(self):
        # prim ids ride the Pallas kernel as f32 values, exact only below
        # 2^24 — bigger meshes must raise, not silently corrupt.
        # eval_shape: the check is shape-only, no 2^24-row allocation.
        from visionaray_tpu.ops.pallas.cluster_bvh import (
            build_cluster_bvh_from_corners,
        )
        big = jax.ShapeDtypeStruct(((1 << 24) + 8, 3), jnp.float32)
        with pytest.raises(ValueError, match="shard the geometry"):
            jax.eval_shape(build_cluster_bvh_from_corners, big, big, big)

    def test_cluster_size_must_be_multiple_of_8(self):
        from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
        scene = _tiny_scene()
        with pytest.raises(AssertionError, match="multiple of 8"):
            jax.eval_shape(
                lambda m: build_cluster_bvh(m, cluster_size=12),
                scene.mesh)

    def test_unknown_algorithm_rejected(self):
        from visionaray_tpu.sched.render import render
        scene = _tiny_scene()
        cam = Pinhole.create(eye=(0, 0, 3), center=(0, 0, 0))
        with pytest.raises(KeyError):
            render(scene, cam, 8, 8, algo="raster")

    def test_binned_traversal_needs_treelets(self):
        from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
        from visionaray_tpu.ops.pallas.traverse import binned_closest_hit
        scene = _tiny_scene()
        cbvh = build_cluster_bvh(scene.mesh)   # no treelets
        ray = Ray(ori=jnp.zeros((8, 3)), dir=jnp.ones((8, 3)))
        with pytest.raises(AssertionError, match="treelet"):
            binned_closest_hit(ray, cbvh, scene.mesh)

    def test_ring_shading_needs_shading_soup(self):
        from visionaray_tpu.parallel.ring import (
            ring_closest_surface_local, shard_geometry,
        )
        scene = _tiny_scene()
        geo = shard_geometry(scene.mesh, 2, backend="brute",
                             with_shading=False)
        ray = Ray(ori=jnp.zeros((4, 3)), dir=jnp.ones((4, 3)))
        with pytest.raises(AssertionError, match="with_shading"):
            soup1 = jax.tree_util.tree_map(lambda a: a[0], geo.soup)
            ring_closest_surface_local(ray, soup1, None, geo.shard_lo[0],
                                       geo.shard_hi[0], "brute", "x")

    def test_pixel_format_component_mismatch(self):
        from visionaray_tpu.io.pixel_format import convert
        with pytest.raises(ValueError, match="trailing dim"):
            convert(np.zeros((4, 3), np.float32), "RGBA32F", "RGB8")

    def test_volume_kernel_requires_volumes(self):
        from visionaray_tpu.kernels.volume import volume_kernel
        scene = _tiny_scene()
        params = KernelParams.create(scene, num_bounces=1, epsilon=1e-3,
                                     bg_color=(0, 0, 0, 1),
                                     ambient_color=(0, 0, 0, 0))
        ray = Ray(ori=jnp.zeros((4, 3)), dir=jnp.ones((4, 3)))
        with pytest.raises(AssertionError, match="Volumes"):
            jax.eval_shape(lambda r: volume_kernel(params, r), ray)


class TestTracesToExpectedShapes:
    """jax.eval_shape: the program SHAPES are right without running
    anything — the cheap 'does it trace' half of the contract."""

    def test_pathtracer_traces_without_execution(self):
        scene = _tiny_scene()
        cam = Pinhole.create(eye=(0, 0, 3), center=(0, 0, 0))
        params = KernelParams.create(scene, num_bounces=3, epsilon=1e-3,
                                     bg_color=(0, 0, 0, 1),
                                     ambient_color=(1, 1, 1, 1))
        x = jnp.zeros((64,), jnp.int32)
        ray = jax.eval_shape(lambda x: cam.primary_rays(x, x, 8, 8), x)

        def f(params, x):
            r = cam.primary_rays(x, x, 8, 8)
            s = Sampler.seed(0, x.astype(jnp.uint32), jnp.uint32(1))
            return pathtracing_kernel(params, r, s, nee=True)

        rec = jax.eval_shape(f, params, x)
        assert rec.color.shape == (64, 4)
        assert rec.depth.shape == (64,)
        assert rec.hit.dtype == jnp.bool_

    def test_sharded_render_traces_on_abstract_mesh(self):
        # the full config-#5 program traces with the right output shape
        from visionaray_tpu.parallel.ring import shard_geometry
        from visionaray_tpu.parallel.sharded_pt import (
            render_image_geometry_sharded,
        )
        from visionaray_tpu.parallel.tile_sharding import make_mesh
        assert len(jax.devices()) >= 8
        mesh = make_mesh(8)
        scene = _tiny_scene()
        geo = shard_geometry(scene.mesh, 8, backend="brute",
                             with_shading=True)
        cam = Pinhole.create(eye=(0, 0, 3), center=(0, 0, 0))
        color, depth = jax.eval_shape(
            lambda g: render_image_geometry_sharded(
                g, scene.materials, scene.lights, cam, 16, 16, mesh,
                num_bounces=2), geo)
        assert color.shape == (16, 16, 4)
        assert depth.shape == (16, 16)
