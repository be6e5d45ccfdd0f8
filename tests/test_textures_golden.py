"""End-to-end texture pipeline: textured renders must differ from untextured
and match the numpy oracle (VERDICT round 1 Missing #1/#2)."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.scene import Scene, TriangleMesh
from visionaray_tpu.shading.lights import PointLights
from visionaray_tpu.shading.materials import Materials
from visionaray_tpu.shading.texture import TextureAtlas
from visionaray_tpu.sched.render import render

import oracle


def _checker(res=32, a=(1.0, 1.0, 1.0), b=(0.1, 0.1, 0.6), tiles=4):
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    m = ((xx * tiles // res) + (yy * tiles // res)) % 2
    img = np.where(m[..., None] == 0, np.float32(a), np.float32(b))
    return img.astype(np.float32)


def _textured_quad_scene(emissive=False):
    verts = np.asarray([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                       np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = np.asarray([
        [[0, 0], [1, 0], [1, 1]],
        [[0, 0], [1, 1], [0, 1]],
    ], np.float32)
    mesh = TriangleMesh.create(verts, faces, geom_ids=np.zeros(2, np.int32),
                               tex_coords=uv)
    mats = (Materials.emissive(ce=(1.0, 0.8, 0.6), ls=1.0) if emissive
            else Materials.matte(cd=(0.9, 0.7, 0.5)))
    atlas = TextureAtlas.pack({0: _checker()}, 1, resolution=32)
    lights = PointLights.create(position=[[0.0, 0.0, 3.0]],
                                cl=(1.0, 1.0, 1.0), kl=1.0)
    scene = Scene.create(mesh=mesh, materials=mats, lights=lights,
                         textures=atlas)
    cam = Pinhole.create(eye=(0.0, 0.0, 3.0), center=(0.0, 0.0, 0.0),
                         up=(0.0, 1.0, 0.0), fovy=np.deg2rad(45.0),
                         aspect=1.0)
    return scene, cam


class TestTexturedRender:
    def test_textured_differs_from_untextured(self):
        scene, cam = _textured_quad_scene()
        rt_tex = render(scene, cam, 48, 48, algo="simple")
        rt_plain = render(dataclasses.replace(scene, textures=None), cam,
                          48, 48, algo="simple")
        d = np.abs(np.asarray(rt_tex.color) - np.asarray(rt_plain.color))
        assert d.max() > 0.05, "texture had no effect on the render"

    def test_simple_matches_oracle(self):
        scene, cam = _textured_quad_scene()
        rt = render(scene, cam, 48, 48, algo="simple",
                    bg_color=(0.1, 0.4, 1.0, 1.0))
        ref = oracle.render_simple(oracle.scene_to_np(scene),
                                   oracle.cam_to_np(cam), 48, 48)
        got = np.asarray(rt.color, np.float64)
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_whitted_matches_oracle(self):
        scene, cam = _textured_quad_scene()
        rt = render(scene, cam, 32, 32, algo="whitted",
                    bg_color=(0.1, 0.4, 1.0, 1.0))
        ref = oracle.render_whitted(oracle.scene_to_np(scene),
                                    oracle.cam_to_np(cam), 32, 32)
        got = np.asarray(rt.color, np.float64)
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_emissive_textured(self):
        scene, cam = _textured_quad_scene(emissive=True)
        rt = render(scene, cam, 32, 32, algo="simple")
        img = np.asarray(rt.color)[..., :3]
        # emissive * checker: both checker colors must appear
        assert img.max() > 0.5 and img[img > 0.01].min() < 0.2

    def test_pathtracing_sample_textured(self):
        # PT importance-samples cd; texture must modulate the indirect term
        scene, cam = _textured_quad_scene()
        rt_tex = render(scene, cam, 32, 32, algo="pathtracing", spp=4,
                        bounces=2, nee=True)
        rt_plain = render(dataclasses.replace(scene, textures=None), cam,
                          32, 32, algo="pathtracing", spp=4, bounces=2,
                          nee=True)
        d = np.abs(np.asarray(rt_tex.color) - np.asarray(rt_plain.color))
        assert d.max() > 0.02


class TestOBJTexturePipeline:
    def test_map_kd_loads_and_renders(self, tmp_path):
        from visionaray_tpu.io.image import save_png
        from visionaray_tpu.io.obj import load_obj_scene

        tex_path = tmp_path / "checker.png"
        save_png(str(tex_path), _checker(), srgb=True)
        (tmp_path / "quad.mtl").write_text(
            "newmtl checkered\nKa 0.0 0.0 0.0\nKd 0.9 0.9 0.9\n"
            "Ks 0.0 0.0 0.0\nNs 32\nmap_Kd checker.png\n")
        (tmp_path / "quad.obj").write_text(
            "mtllib quad.mtl\n"
            "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
            "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
            "usemtl checkered\n"
            "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n")
        scene = load_obj_scene(str(tmp_path / "quad.obj"), build_bvh=False)
        assert scene.textures is not None
        assert bool(np.asarray(scene.textures.enabled)[0])
        lights = PointLights.create(position=[[0.0, 0.0, 3.0]],
                                    cl=(1.0, 1.0, 1.0), kl=1.0)
        scene = dataclasses.replace(scene, lights=lights)
        cam = Pinhole.create(eye=(0.0, 0.0, 3.0), center=(0.0, 0.0, 0.0),
                             up=(0.0, 1.0, 0.0), fovy=np.deg2rad(45.0),
                             aspect=1.0)
        rt = render(scene, cam, 32, 32, algo="simple")
        rt_plain = render(dataclasses.replace(scene, textures=None), cam,
                          32, 32, algo="simple")
        d = np.abs(np.asarray(rt.color) - np.asarray(rt_plain.color))
        assert d.max() > 0.05

    def test_missing_texture_warns_not_crashes(self, tmp_path):
        import warnings
        from visionaray_tpu.io.obj import load_obj_scene
        (tmp_path / "m.mtl").write_text(
            "newmtl t\nKd 0.5 0.5 0.5\nmap_Kd missing.png\n")
        (tmp_path / "t.obj").write_text(
            "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl t\nf 1 2 3\n")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            scene = load_obj_scene(str(tmp_path / "t.obj"), build_bvh=False)
        assert scene.textures is None
        assert any("missing.png" in str(x.message) for x in w)
