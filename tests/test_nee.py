"""Next-event estimation: the NEE estimator must agree with the reference
BSDF-only path tracer in expectation (both unbiased for the same scene).

Scene: matte floor + emissive ceiling quad, duplicated as an AreaLights
entry for NEE light sampling (the standard emissive-geometry + light-list
pairing).  Also checks the area light's soft-shadow machinery: sample()
covers the light uniformly.
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
from visionaray_tpu.ops.sampling import Sampler
from visionaray_tpu.shading.lights import AreaLights
from visionaray_tpu.shading.materials import Materials


@pytest.fixture(scope="module")
def quad_light_scene():
    verts = np.array([
        [-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2],
        [-0.5, 2, -0.5], [0.5, 2, -0.5], [0.5, 2, 0.5], [-0.5, 2, 0.5],
    ], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6]], np.int32)
    gids = np.array([0, 0, 1, 1], np.int32)
    mesh = TriangleMesh.create(verts, faces, geom_ids=gids)
    mats = Materials.concatenate([
        Materials.matte(cd=(0.6, 0.5, 0.4), kd=1.0),
        Materials.emissive(ce=(1.0, 0.9, 0.8), ls=8.0),
    ])
    al = AreaLights.rect(corner=(-0.5, 2, -0.5), edge1=(1, 0, 0),
                         edge2=(0, 0, 1), cl=(1.0, 0.9, 0.8), kl=8.0)
    scene = Scene.create(mesh=mesh, materials=mats, lights=al)
    cam = Pinhole.create(eye=(0, 1.2, 4.0), center=(0, 0.5, 0), up=(0, 1, 0),
                         fovy=np.deg2rad(50), aspect=1.0)
    params = KernelParams.create(scene, num_bounces=3, epsilon=1e-3,
                                 bg_color=(0, 0, 0, 1),
                                 ambient_color=(0, 0, 0, 0))
    W = H = 24
    xx, yy = jnp.meshgrid(jnp.arange(W), jnp.arange(H))
    ray = cam.primary_rays(xx.reshape(-1), yy.reshape(-1), W, H)
    pid = (yy.reshape(-1) * W + xx.reshape(-1)).astype(jnp.uint32)
    return params, ray, pid


def _avg(params, ray, pid, nee, n_samples):
    f = jax.jit(lambda s: pathtracing_kernel(
        params, ray,
        Sampler.seed(0, pid ^ (s * jnp.uint32(0x9E3779B9)), jnp.uint32(7)),
        nee=nee).color)
    acc = 0
    for s in range(n_samples):
        acc = acc + f(jnp.uint32(s))
    return acc / n_samples


def test_nee_matches_bsdf_pt(quad_light_scene):
    params, ray, pid = quad_light_scene
    m_bsdf = float(jnp.mean(_avg(params, ray, pid, False, 64)[:, :3]))
    m_nee = float(jnp.mean(_avg(params, ray, pid, True, 12)[:, :3]))
    assert m_bsdf > 0.01
    assert abs(m_nee / m_bsdf - 1.0) < 0.2


def test_nee_grads_finite(quad_light_scene):
    params, ray, pid = quad_light_scene

    def loss(cd, kl):
        mats2 = dataclasses.replace(params.scene.materials, cd=cd)
        lights2 = dataclasses.replace(params.scene.lights, kl=kl)
        scene2 = dataclasses.replace(params.scene, materials=mats2,
                                     lights=lights2)
        p2 = dataclasses.replace(params, scene=scene2)
        samp = Sampler.seed(0, pid, jnp.uint32(3))
        return jnp.mean(pathtracing_kernel(p2, ray, samp, nee=True)
                        .color[:, :3])

    g_cd, g_kl = jax.grad(loss, argnums=(0, 1))(
        params.scene.materials.cd, params.scene.lights.kl)
    assert jnp.all(jnp.isfinite(g_cd)) and jnp.all(jnp.isfinite(g_kl))
    # brightening the light must brighten the image
    assert float(g_kl.sum()) > 0.0


def test_area_light_sampling_uniform():
    al = AreaLights.rect(corner=(0.0, 1.0, 0.0), edge1=(2, 0, 0),
                         edge2=(0, 0, 1))
    key = jax.random.PRNGKey(0)
    u1 = jax.random.uniform(key, (4096,))
    u2 = jax.random.uniform(jax.random.PRNGKey(1), (4096,))
    p = al.sample(0, u1, u2)
    assert jnp.all(p[:, 1] == 1.0)
    assert float(p[:, 0].min()) >= 0.0 and float(p[:, 0].max()) <= 2.0
    # mean of a uniform triangle sample = centroid
    cen = al.position[0]
    assert jnp.allclose(p.mean(0), cen, atol=0.05)
    assert float(al.area(0)) == pytest.approx(1.0)
    assert jnp.allclose(jnp.abs(al.normal(0)), jnp.array([0.0, 1.0, 0.0]))
