"""Gradient correctness: analytic grads vs central finite differences.

BASELINE correctness target (backward): vertex/material/light grads allclose
to finite differences (config #3).  Sampling decisions are independent of the
differentiated parameters here (matte lobes only), so finite differences with
the same RNG counters are exact up to f32 rounding (correlated sampling).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.scene import Scene, TriangleMesh
from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.kernels.pathtracing import pathtracing_kernel
from visionaray_tpu.kernels.simple import simple_kernel
from visionaray_tpu.ops.sampling import Sampler
from visionaray_tpu.scenes import cornell_box
from visionaray_tpu.shading.lights import PointLights
from visionaray_tpu.shading.materials import Materials


def _central_diff(f, x, h):
    return (f(x + h) - f(x - h)) / (2.0 * h)


class TestSimpleKernelGrads:
    """Depth/shading grads w.r.t. vertices at fixed hit topology."""

    @pytest.fixture(scope="class")
    def setup(self):
        # one huge triangle covering the whole view -> no silhouette terms
        vertices = np.array([[-20.0, -20.0, 0.0], [20.0, -20.0, 0.0],
                             [0.0, 30.0, 0.0]], np.float32)
        mesh = TriangleMesh.create(vertices, np.array([[0, 1, 2]], np.int32))
        scene = Scene.create(
            mesh=mesh,
            materials=Materials.plastic(cd=(0.7, 0.3, 0.2)),
            lights=PointLights.create(position=[[0.0, 2.0, 5.0]]))
        cam = Pinhole.create(eye=(0.0, 0.0, 5.0), center=(0.0, 0.0, 0.0),
                             fovy=np.deg2rad(45.0), aspect=1.0)
        x, y = jnp.meshgrid(jnp.arange(8), jnp.arange(8))
        ray = cam.primary_rays(x.reshape(-1), y.reshape(-1), 8, 8)
        params = KernelParams.create(scene)
        return params, ray

    def test_vertex_depth_grad_matches_fd(self, setup):
        params, ray = setup

        def loss(dz):
            verts = params.scene.mesh.vertices + \
                jnp.asarray([0.0, 0.0, 1.0]) * dz
            mesh2 = dataclasses.replace(params.scene.mesh, vertices=verts)
            scene2 = dataclasses.replace(params.scene, mesh=mesh2)
            p2 = dataclasses.replace(params, scene=scene2)
            rec = simple_kernel(p2, ray)
            return jnp.mean(jnp.where(rec.hit, rec.depth, 0.0))

        g = jax.grad(loss)(jnp.float32(0.0))
        fd = _central_diff(lambda z: float(loss(jnp.float32(z))), 0.0, 1e-2)
        np.testing.assert_allclose(float(g), fd, rtol=1e-3)

    def test_light_position_grad(self, setup):
        params, ray = setup

        def loss(dx):
            lights = params.scene.lights
            l2 = dataclasses.replace(
                lights, position=lights.position + jnp.asarray([[0., 0., 1.]]) * dx)
            scene2 = dataclasses.replace(params.scene, lights=l2)
            p2 = dataclasses.replace(params, scene=scene2)
            rec = simple_kernel(p2, ray)
            return jnp.mean(rec.color[..., :3])

        g = jax.grad(loss)(jnp.float32(0.0))
        fd = _central_diff(lambda z: float(loss(jnp.float32(z))), 0.0, 1e-2)
        np.testing.assert_allclose(float(g), fd, rtol=2e-2)


class TestPathTracerGrads:
    """Config #3: Cornell box, grads w.r.t. albedo + emission vs FD."""

    @pytest.fixture(scope="class")
    def setup(self):
        # 16x16 x 5 bounces: enough paths reach the emitter for a nonzero
        # finite-difference signal (8x8 x 3 renders black)
        scene, cam = cornell_box()
        W = H = 16
        x, y = jnp.meshgrid(jnp.arange(W), jnp.arange(H))
        xf, yf = x.reshape(-1), y.reshape(-1)
        ray = cam.primary_rays(xf, yf, W, H)
        pid = yf.astype(jnp.uint32) * jnp.uint32(W) + xf.astype(jnp.uint32)
        samp = Sampler.seed(0, pid, 1)
        params = KernelParams.create(
            scene, num_bounces=5, epsilon=1e-3,
            bg_color=(0, 0, 0, 1), ambient_color=(0, 0, 0, 0))
        return params, ray, samp

    def _loss(self, params, ray, samp, d_albedo, d_ls):
        mats = params.scene.materials
        mats2 = dataclasses.replace(
            mats, cd=mats.cd * (1.0 + d_albedo), ls=mats.ls * (1.0 + d_ls))
        scene2 = dataclasses.replace(params.scene, materials=mats2)
        p2 = dataclasses.replace(params, scene=scene2)
        rec = pathtracing_kernel(p2, ray, samp)
        return jnp.mean(rec.color[..., :3])

    def test_albedo_grad_matches_fd(self, setup):
        params, ray, samp = setup
        f = jax.jit(lambda a: self._loss(params, ray, samp, a,
                                         jnp.float32(0.0)))
        g = jax.jit(jax.grad(lambda a: self._loss(
            params, ray, samp, a, jnp.float32(0.0))))(jnp.float32(0.0))
        h = 1e-2
        fd = (float(f(jnp.float32(h))) - float(f(jnp.float32(-h)))) / (2 * h)
        assert abs(fd) > 1e-6, "loss insensitive to albedo — bad test setup"
        np.testing.assert_allclose(float(g), fd, rtol=5e-2)

    def test_emission_grad_matches_fd(self, setup):
        params, ray, samp = setup
        f = jax.jit(lambda e: self._loss(params, ray, samp,
                                         jnp.float32(0.0), e))
        g = jax.jit(jax.grad(lambda e: self._loss(
            params, ray, samp, jnp.float32(0.0), e)))(jnp.float32(0.0))
        h = 1e-2
        fd = (float(f(jnp.float32(h))) - float(f(jnp.float32(-h)))) / (2 * h)
        assert abs(fd) > 1e-6, "loss insensitive to emission"
        np.testing.assert_allclose(float(g), fd, rtol=5e-2)
