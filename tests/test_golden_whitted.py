"""Golden test: config #2 semantics — Whitted with shadows + reflection vs oracle.

Uses a small mixed scene (not the full teapot — XLA CPU compiles are slow on
CI) with a mirror so the specular-bounce path is exercised; the BVH-enabled
teapot render is covered by test_lbvh + bench.
"""

import numpy as np
import pytest

import oracle
from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.scene import Planes, Scene, Spheres, TriangleMesh
from visionaray_tpu.sched.render import render
from visionaray_tpu.shading.lights import PointLights
from visionaray_tpu.shading.materials import Materials

W = H = 48


@pytest.fixture(scope="module")
def setup():
    vertices = np.array([
        [-1.5, 0.0, -1.0], [-0.2, 0.0, -1.2], [-0.85, 1.6, -1.1],
    ], np.float32)
    mesh = TriangleMesh.create(vertices, np.array([[0, 1, 2]], np.int32),
                               geom_ids=[0])
    spheres = Spheres.create(center=[[0.8, 0.6, 0.0]], radius=[0.6],
                             geom_ids=[1])
    planes = Planes.create(normal=[[0.0, 1.0, 0.0]], offset=[0.0],
                           geom_ids=[2])
    materials = Materials.concatenate([
        Materials.plastic(cd=(0.8, 0.2, 0.1), kd=1.0, cs=(0.2, 0.2, 0.2),
                          ks=1.0, specular_exp=32.0, ca=(0.2, 0.2, 0.2),
                          ka=1.0),
        Materials.mirror(cr=(0.9, 0.9, 0.9), kr=0.9),
        Materials.matte(cd=(0.6, 0.6, 0.6), kd=1.0, ca=(0.2, 0.2, 0.2),
                        ka=1.0),
    ])
    lights = PointLights.create(position=[[2.0, 5.0, 3.0]])
    scene = Scene.create(mesh=mesh, spheres=spheres, planes=planes,
                         materials=materials, lights=lights)
    cam = Pinhole.create(eye=(0.0, 1.5, 4.0), center=(0.0, 0.8, 0.0),
                         up=(0.0, 1.0, 0.0), fovy=np.deg2rad(45.0),
                         aspect=1.0)
    return scene, cam


def test_whitted_matches_oracle(setup):
    scene, cam = setup
    rt = render(scene, cam, W, H, algo="whitted", bounces=4, epsilon=1e-3,
                ambient=(0.0, 0.0, 0.0, 0.0))
    img = np.asarray(rt.color)
    ref = oracle.render_whitted(oracle.scene_to_np(scene),
                                oracle.cam_to_np(cam), W, H,
                                bounces=4, epsilon=1e-3)
    diff = np.abs(img - ref.astype(np.float32))
    frac_bad = np.mean(np.any(diff > 2e-3, axis=-1))
    assert frac_bad < 0.01, f"{frac_bad:.4%} pixels differ (max {diff.max()})"
    # shadows present: some floor pixels darker than fully-lit shading
    assert img[..., :3].std() > 0.05
