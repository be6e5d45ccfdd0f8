"""Pixel parity against the REAL reference library (not the numpy oracle).

native/ref_harness.cpp is compiled against the upstream header-only
reference and renders the same scene dumps; images must agree pixel-wise up
to f32 rounding and silhouette edges (BASELINE.json north-star correctness
target; VERDICT round 1 Missing #10)."""

import dataclasses

import numpy as np
import pytest

import ref_harness
from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.scene import Scene, Spheres, TriangleMesh
from visionaray_tpu.shading.lights import PointLights
from visionaray_tpu.shading.materials import Materials
from visionaray_tpu.sched.render import render

pytestmark = pytest.mark.skipif(
    not ref_harness.harness_available(),
    reason="reference checkout not present")

BG = (0.1, 0.4, 1.0, 1.0)
AMB = (0.2, 0.2, 0.2, 1.0)


def _config1_scene():
    """Config #1 (tri + sphere + ground), ground as two large triangles so
    the reference side can hold everything in one generic_primitive range."""
    verts = np.asarray([
        [-1.5, 0.0, -1.0], [-0.2, 0.0, -1.2], [-0.85, 1.6, -1.1],
        [-20.0, 0.0, -20.0], [20.0, 0.0, -20.0],
        [20.0, 0.0, 20.0], [-20.0, 0.0, 20.0],
    ], np.float32)
    faces = np.asarray([[0, 1, 2], [3, 4, 5], [3, 5, 6]], np.int32)
    mesh = TriangleMesh.create(verts, faces,
                               geom_ids=np.asarray([0, 2, 2], np.int32))
    spheres = Spheres.create(center=[[0.8, 0.6, 0.0]], radius=[0.6],
                             geom_ids=[1])
    materials = Materials.concatenate([
        Materials.plastic(cd=(0.8, 0.2, 0.1), kd=1.0, cs=(0.2, 0.2, 0.2),
                          ks=1.0, specular_exp=32.0, ca=(0.2, 0.2, 0.2),
                          ka=1.0),
        Materials.plastic(cd=(0.1, 0.7, 0.2), kd=1.0, cs=(0.5, 0.5, 0.5),
                          ks=1.0, specular_exp=64.0, ca=(0.2, 0.2, 0.2),
                          ka=1.0),
        Materials.matte(cd=(0.6, 0.6, 0.6), kd=1.0, ca=(0.2, 0.2, 0.2),
                        ka=1.0),
    ])
    lights = PointLights.create(position=[[2.0, 5.0, 3.0]],
                                cl=(1.0, 1.0, 1.0), kl=1.0)
    scene = Scene.create(mesh=mesh, spheres=spheres, materials=materials,
                         lights=lights)
    cam = Pinhole.create(eye=(0.0, 1.5, 4.0), center=(0.0, 0.8, 0.0),
                         up=(0.0, 1.0, 0.0), fovy=np.deg2rad(45.0),
                         aspect=1.0)
    return scene, cam


def _teapot_scene():
    from visionaray_tpu.scenes import teapot_mesh
    verts, faces = teapot_mesh(detail=12)
    mesh = TriangleMesh.create(verts, faces)
    mats = Materials.plastic(cd=(0.8, 0.6, 0.1), kd=1.0,
                             cs=(0.7, 0.7, 0.7), ks=1.0, specular_exp=32.0,
                             ca=(0.2, 0.2, 0.2), ka=1.0)
    lights = PointLights.create(position=[[3.0, 6.0, 6.0]],
                                cl=(1.0, 1.0, 1.0), kl=1.0)
    scene = Scene.create(mesh=mesh, materials=mats, lights=lights)
    lo = np.asarray(verts).min(0)
    hi = np.asarray(verts).max(0)
    c = 0.5 * (lo + hi)
    cam = Pinhole.create(eye=tuple(c + np.float32([0, 1.0, 6.0])),
                         center=tuple(c), up=(0.0, 1.0, 0.0),
                         fovy=np.deg2rad(45.0), aspect=1.0)
    return scene, cam


def _compare(ours, ref, max_bad_frac=0.01, atol=2e-3):
    """Pixelwise compare with a silhouette allowance: f32 vs f64-free scalar
    code disagrees exactly on edge pixels where the closest-hit winner flips."""
    ours = np.asarray(ours, np.float64)
    diff = np.abs(ours - ref)
    bad = np.any(diff > atol, axis=-1)
    assert bad.mean() < max_bad_frac, \
        f"{bad.mean():.4%} pixels differ (max {diff.max():.4g})"


class TestReferenceParity:
    def test_config1_simple(self):
        scene, cam = _config1_scene()
        ref = ref_harness.render_reference(scene, cam, 128, 128,
                                           algo="simple", bg=BG, ambient=AMB)
        rt = render(scene, cam, 128, 128, algo="simple", bg_color=BG,
                    ambient=AMB)
        _compare(rt.color, ref)

    def test_config1_whitted(self):
        scene, cam = _config1_scene()
        ref = ref_harness.render_reference(scene, cam, 128, 128,
                                           algo="whitted", bounces=4,
                                           bg=BG, ambient=AMB)
        rt = render(scene, cam, 128, 128, algo="whitted", bounces=4,
                    bg_color=BG, ambient=AMB, epsilon=1e-4)
        _compare(rt.color, ref)

    def test_config2_teapot_whitted(self):
        scene, cam = _teapot_scene()
        ref = ref_harness.render_reference(scene, cam, 96, 96,
                                           algo="whitted", bounces=4,
                                           bg=BG, ambient=AMB)
        rt = render(scene, cam, 96, 96, algo="whitted", bounces=4,
                    bg_color=BG, ambient=AMB, epsilon=1e-4)
        _compare(rt.color, ref, max_bad_frac=0.02)

    def test_config2_teapot_whitted_bvh_tier(self):
        scene, cam = _teapot_scene()
        from visionaray_tpu.ops.lbvh import build_lbvh
        scene_b = dataclasses.replace(scene, bvh=build_lbvh(scene.mesh))
        ref = ref_harness.render_reference(scene, cam, 96, 96,
                                           algo="whitted", bounces=4,
                                           bg=BG, ambient=AMB)
        rt = render(scene_b, cam, 96, 96, algo="whitted", bounces=4,
                    bg_color=BG, ambient=AMB, epsilon=1e-4)
        _compare(rt.color, ref, max_bad_frac=0.02)
