"""Distributed tests on the virtual 8-device CPU mesh (SURVEY §4 item 4).

- tile sharding: sharded render == single-device render bit-for-bit
- geometry sharding: ring closest-hit == unsharded brute force
- grads through shard_map get psum'd correctly (match unsharded grads)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.core.types import Ray
from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.parallel.tile_sharding import (
    make_mesh, render_image_sharded,
)
from visionaray_tpu.scenes import tri_sphere_plane, random_triangles
from visionaray_tpu.sched.render import render


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


def test_tile_sharded_matches_single(mesh8):
    scene, cam = tri_sphere_plane()
    W = H = 32
    params = KernelParams.create(scene, num_bounces=2,
                                 bg_color=(0.1, 0.4, 1.0, 1.0))
    color_s, depth_s = render_image_sharded(
        params, cam, W, H, mesh8, algo="simple", spp=1,
        pixel_sampler="uniform", frame_num=1)
    rt = render(scene, cam, W, H, algo="simple", spp=1)
    # identical sampling decisions; float op order drifts with block shape
    np.testing.assert_allclose(np.asarray(color_s), np.asarray(rt.color),
                               atol=2e-3, rtol=1e-3)


def test_tile_sharded_pt_deterministic_vs_single(mesh8):
    """RNG keyed by absolute pixel id -> bit-identical across mesh sizes."""
    scene, cam = tri_sphere_plane()
    W = H = 16
    params = KernelParams.create(scene, num_bounces=2,
                                 bg_color=(0, 0, 0, 1),
                                 ambient_color=(1, 1, 1, 1))
    color8, _ = render_image_sharded(
        params, cam, W, H, mesh8, algo="pathtracing", spp=1,
        pixel_sampler="jittered_blend", frame_num=1)
    mesh1 = make_mesh(1)
    color1, _ = render_image_sharded(
        params, cam, W, H, mesh1, algo="pathtracing", spp=1,
        pixel_sampler="jittered_blend", frame_num=1)
    # the RNG (and thus every sampling decision / path topology) is
    # identical across mesh sizes; pixel floats drift ~1e-4 from fusion
    np.testing.assert_allclose(np.asarray(color8), np.asarray(color1),
                               atol=5e-3, rtol=2e-3)


# Geometry sharding moved to tests/test_geometry_sharding.py (round 2:
# spatially partitioned shards with local buffers + per-shard accel).
