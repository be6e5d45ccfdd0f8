"""Unit tests for intersection kernels (analogue of reference math tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.core.vecmath import normalize
from visionaray_tpu.ops.intersect import (
    intersect_aabb, intersect_plane, intersect_sphere, intersect_triangle,
)


def as_batch(*vs):
    return [jnp.asarray(v, jnp.float32)[None] for v in vs]


class TestTriangle:
    V1 = np.array([0.0, 0.0, 0.0], np.float32)
    E1 = np.array([1.0, 0.0, 0.0], np.float32)
    E2 = np.array([0.0, 1.0, 0.0], np.float32)

    def test_center_hit(self):
        o, d = as_batch([0.25, 0.25, -1.0], [0.0, 0.0, 1.0])
        t, u, v, hit = intersect_triangle(o, d, self.V1, self.E1, self.E2)
        assert bool(hit[0])
        np.testing.assert_allclose(t[0], 1.0, rtol=1e-6)
        np.testing.assert_allclose(u[0], 0.25, rtol=1e-6)
        np.testing.assert_allclose(v[0], 0.25, rtol=1e-6)

    def test_miss_outside(self):
        o, d = as_batch([0.9, 0.9, -1.0], [0.0, 0.0, 1.0])
        _, _, _, hit = intersect_triangle(o, d, self.V1, self.E1, self.E2)
        assert not bool(hit[0])

    def test_parallel_ray(self):
        o, d = as_batch([0.25, 0.25, -1.0], [1.0, 0.0, 0.0])
        t, _, _, hit = intersect_triangle(o, d, self.V1, self.E1, self.E2)
        assert not bool(hit[0])
        assert np.isfinite(np.asarray(t)).all()

    def test_behind_origin_reports_negative_t(self):
        # the intersect itself reports t < 0; is_closer filters it
        o, d = as_batch([0.25, 0.25, 1.0], [0.0, 0.0, 1.0])
        t, _, _, hit = intersect_triangle(o, d, self.V1, self.E1, self.E2)
        assert bool(hit[0]) and float(t[0]) < 0.0

    def test_vertex_edge_hits(self):
        for p, expect in [((0.0, 0.0), True), ((1.0, 0.0), True),
                          ((0.5, 0.5), True), ((0.51, 0.5), False)]:
            o, d = as_batch([p[0], p[1], -1.0], [0.0, 0.0, 1.0])
            _, _, _, hit = intersect_triangle(o, d, self.V1, self.E1, self.E2)
            assert bool(hit[0]) == expect, p

    def test_batch_broadcast(self):
        o = jnp.zeros((4, 1, 3)) + jnp.asarray([0.25, 0.25, -1.0])
        d = jnp.zeros((4, 1, 3)) + jnp.asarray([0.0, 0.0, 1.0])
        v1 = jnp.stack([self.V1, self.V1 + 5.0])
        t, u, v, hit = intersect_triangle(o, d, v1, jnp.stack([self.E1] * 2),
                                          jnp.stack([self.E2] * 2))
        assert t.shape == (4, 2)
        assert bool(hit[0, 0]) and not bool(hit[0, 1])


class TestSphere:
    def test_outside_hit(self):
        o, d = as_batch([0.0, 0.0, -3.0], [0.0, 0.0, 1.0])
        t, hit = intersect_sphere(o, d, jnp.zeros(3), jnp.float32(1.0))
        assert bool(hit[0])
        np.testing.assert_allclose(t[0], 2.0, rtol=1e-6)

    def test_inside_reports_negative_root(self):
        # reference quirk: min root selected even if negative (intersect.h:216)
        o, d = as_batch([0.0, 0.0, 0.0], [0.0, 0.0, 1.0])
        t, hit = intersect_sphere(o, d, jnp.zeros(3), jnp.float32(1.0))
        assert bool(hit[0]) and float(t[0]) < 0.0

    def test_clear_miss(self):
        o, d = as_batch([0.0, 5.0, -3.0], [0.0, 0.0, 1.0])
        t, hit = intersect_sphere(o, d, jnp.zeros(3), jnp.float32(1.0))
        assert not bool(hit[0])
        assert np.isfinite(np.asarray(t)).all()

    def test_degenerate_radii(self):
        # analogue of build.cpp degenerate radius tests (1e-9 .. 1e5)
        for r in [1e-5, 1.0, 1e5]:
            o, d = as_batch([0.0, 0.0, -2.0 * r - 1.0], [0.0, 0.0, 1.0])
            t, hit = intersect_sphere(o, d, jnp.zeros(3), jnp.float32(r))
            assert bool(hit[0])
            np.testing.assert_allclose(t[0], r + 1.0, rtol=1e-4)


class TestPlane:
    def test_hit(self):
        o, d = as_batch([0.0, 2.0, 0.0], [0.0, -1.0, 0.0])
        t, hit = intersect_plane(o, d, jnp.asarray([0.0, 1.0, 0.0]),
                                 jnp.float32(0.0))
        assert bool(hit[0])
        np.testing.assert_allclose(t[0], 2.0, rtol=1e-6)

    def test_parallel_miss(self):
        o, d = as_batch([0.0, 2.0, 0.0], [1.0, 0.0, 0.0])
        t, hit = intersect_plane(o, d, jnp.asarray([0.0, 1.0, 0.0]),
                                 jnp.float32(0.0))
        assert not bool(hit[0])
        assert np.isfinite(np.asarray(t)).all()


class TestAABB:
    def test_hit_through(self):
        o = jnp.asarray([[-2.0, 0.5, 0.5]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        tn, tf, hit = intersect_aabb(o, 1.0 / d, jnp.zeros(3), jnp.ones(3))
        assert bool(hit[0])
        np.testing.assert_allclose(tn[0], 2.0, rtol=1e-6)
        np.testing.assert_allclose(tf[0], 3.0, rtol=1e-6)

    def test_miss(self):
        o = jnp.asarray([[-2.0, 2.5, 0.5]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        _, _, hit = intersect_aabb(o, 1.0 / d, jnp.zeros(3), jnp.ones(3))
        assert not bool(hit[0])

    def test_inside_box(self):
        o = jnp.asarray([[0.5, 0.5, 0.5]])
        d = normalize(jnp.asarray([[1.0, 0.3, 0.2]]))
        tn, tf, hit = intersect_aabb(o, 1.0 / d, jnp.zeros(3), jnp.ones(3))
        assert bool(hit[0]) and float(tn[0]) < 0.0 < float(tf[0])


def test_gradients_flow_through_triangle():
    import jax

    def f(v1):
        o = jnp.asarray([0.25, 0.25, -1.0])[None]
        d = jnp.asarray([0.0, 0.0, 1.0])[None]
        t, u, v, hit = intersect_triangle(
            o, d, v1, jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
        return jnp.sum(t)

    g = jax.grad(f)(jnp.asarray([0.0, 0.0, 0.0]))
    # moving the triangle +z by dz moves t by +dz
    np.testing.assert_allclose(np.asarray(g), [0.0, 0.0, 1.0], atol=1e-6)
