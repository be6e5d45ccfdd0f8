"""Breadth-parity features: multi_hit, textures, spot lights, AO, sampling."""

import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.scene import Scene, TriangleMesh
from visionaray_tpu.core.types import Ray
from visionaray_tpu.ops.sampling import Sampler, radical_inverse
from visionaray_tpu.ops.trace import multi_hit
from visionaray_tpu.shading.lights import PointLights, SpotLights, light_groups
from visionaray_tpu.shading.materials import Materials
from visionaray_tpu.shading.texture import (
    AddressMode, Filter, TextureAtlas, tex1d, tex2d, tex3d,
)


def _stacked_quads_scene():
    """Three parallel unit quads at z = 1, 2, 3 (for multi-hit)."""
    verts, faces, gids = [], [], []
    for i, z in enumerate([1.0, 2.0, 3.0]):
        base = len(verts)
        verts += [[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]]
        faces += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
        gids += [i, i]
    mesh = TriangleMesh.create(np.asarray(verts, np.float32),
                               np.asarray(faces, np.int32),
                               geom_ids=np.asarray(gids, np.int32))
    mats = Materials.concatenate(
        [Materials.matte(cd=(0.5, 0.5, 0.5))] * 3)
    return Scene.create(mesh=mesh, materials=mats)


class TestMultiHit:
    def test_sorted_hits(self):
        scene = _stacked_quads_scene()
        # off the quads' shared diagonal so exactly one triangle per quad hits
        ray = Ray(ori=jnp.asarray([[0.3, -0.4, 0.0]]),
                  dir=jnp.asarray([[0.0, 0.0, 1.0]]))
        rec = multi_hit(ray, scene, k=4)
        hits = np.asarray(rec.hit[0])
        ts = np.asarray(rec.t[0])
        assert hits[:3].all() and not hits[3]
        np.testing.assert_allclose(ts[:3], [1.0, 2.0, 3.0], rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(rec.geom_id[0])[:3],
                                      [0, 1, 2])

    def test_k_smaller_than_hits(self):
        scene = _stacked_quads_scene()
        ray = Ray(ori=jnp.asarray([[0.3, -0.4, 0.0]]),
                  dir=jnp.asarray([[0.0, 0.0, 1.0]]))
        rec = multi_hit(ray, scene, k=2)
        np.testing.assert_allclose(np.asarray(rec.t[0]), [1.0, 2.0],
                                   rtol=1e-5)


class TestTextures:
    def test_tex2d_nearest_and_linear(self):
        tx = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
        u = jnp.asarray([0.125, 0.625])
        v = jnp.asarray([0.125, 0.875])
        out = tex2d(tx, u, v, filter=Filter.NEAREST)
        np.testing.assert_allclose(np.asarray(out)[:, 0], [0.0, 14.0])
        # linear at texel centers == texel values
        out2 = tex2d(tx, jnp.asarray([0.375]), jnp.asarray([0.375]),
                     filter=Filter.LINEAR)
        np.testing.assert_allclose(np.asarray(out2)[0, 0], 5.0, rtol=1e-6)

    def test_address_modes(self):
        tx = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 4, 1))
        # wrap: u = 1.125 -> texel 0 (index 4 wraps to 0 at center 0.125)
        w = tex2d(tx, jnp.asarray([1.125]), jnp.asarray([0.5]),
                  filter=Filter.NEAREST, address_mode=AddressMode.WRAP)
        c = tex2d(tx, jnp.asarray([1.5]), jnp.asarray([0.5]),
                  filter=Filter.NEAREST, address_mode=AddressMode.CLAMP)
        b = tex2d(tx, jnp.asarray([1.5]), jnp.asarray([0.5]),
                  filter=Filter.NEAREST, address_mode=AddressMode.BORDER,
                  border_value=-1.0)
        assert float(w[0, 0]) == 0.0
        assert float(c[0, 0]) == 3.0
        assert float(b[0, 0]) == -1.0

    def test_tex1d_tex3d(self):
        t1 = jnp.asarray(np.linspace(0, 1, 8, dtype=np.float32)[:, None])
        v = tex1d(t1, jnp.asarray([0.5]))
        assert 0.4 < float(v[0, 0]) < 0.6
        vol = jnp.asarray(np.random.default_rng(0).random((4, 4, 4),
                                                          np.float32))
        s = tex3d(vol, jnp.asarray([0.5]), jnp.asarray([0.5]),
                  jnp.asarray([0.5]))
        assert np.isfinite(float(s[0]))

    def test_atlas_textured_surface(self):
        import dataclasses

        from visionaray_tpu.kernels.params import KernelParams
        from visionaray_tpu.kernels.simple import simple_kernel

        # one quad with a 2-tone texture; camera straight on
        verts = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                         np.float32)
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        uv = np.array([[[0, 0], [1, 0], [1, 1]],
                       [[0, 0], [1, 1], [0, 1]]], np.float32)
        mesh = TriangleMesh.create(verts, faces, tex_coords=uv)
        img = np.zeros((8, 8, 3), np.float32)
        img[:, :4] = [1.0, 0.0, 0.0]
        img[:, 4:] = [0.0, 1.0, 0.0]
        atlas = TextureAtlas.pack({0: img}, num_materials=1, resolution=8,
                                  filter=Filter.NEAREST)
        scene = Scene.create(
            mesh=mesh, materials=Materials.matte(cd=(1.0, 1.0, 1.0)),
            lights=PointLights.create(position=[[0, 0, 5]]))
        scene = dataclasses.replace(scene, textures=atlas)
        cam = Pinhole.create(eye=(0, 0, 3), center=(0, 0, 0),
                             fovy=np.deg2rad(45), aspect=1.0)
        x, y = jnp.meshgrid(jnp.arange(16), jnp.arange(16))
        ray = cam.primary_rays(x.reshape(-1), y.reshape(-1), 16, 16)
        from visionaray_tpu.shading.surface import get_surface
        from visionaray_tpu.ops.trace import closest_hit
        hr = closest_hit(ray, scene)
        surf = get_surface(hr, ray, scene)
        tc = np.asarray(surf.tex_color).reshape(16, 16, 3)
        hit = np.asarray(hr.hit).reshape(16, 16)
        left = tc[8, 2]   # left half of the quad (u < 0.5) -> red
        right = tc[8, 13]
        assert hit[8, 2] and hit[8, 13]
        np.testing.assert_allclose(left, [1, 0, 0], atol=1e-5)
        np.testing.assert_allclose(right, [0, 1, 0], atol=1e-5)


class TestSpotLights:
    def test_cone_cutoff(self):
        sl = SpotLights.create(position=[[0, 5, 0]], direction=[[0, -1, 0]],
                               cutoff_deg=20.0, exponent=2.0)
        below = jnp.asarray([[0.0, 0.0, 0.0]])       # on axis
        side = jnp.asarray([[5.0, 4.9, 0.0]])        # far outside cone
        i_on = np.asarray(sl.intensity(0, below))
        i_off = np.asarray(sl.intensity(0, side))
        assert i_on.sum() > 0.0
        np.testing.assert_allclose(i_off, 0.0)

    def test_light_groups_helper(self):
        pl = PointLights.create(position=[[0, 1, 0]])
        sl = SpotLights.create(position=[[0, 5, 0]], direction=[[0, -1, 0]])
        assert len(light_groups(pl)) == 1
        assert len(light_groups((pl, sl))) == 2
        assert light_groups(None) == ()


class TestSampling:
    def test_uniform_range_and_determinism(self):
        s = Sampler.seed(0, jnp.arange(1024, dtype=jnp.uint32), 7)
        u1, s2 = s.next()
        u2, _ = s2.next()
        a = np.asarray(u1)
        assert (a >= 0).all() and (a < 1).all()
        assert abs(a.mean() - 0.5) < 0.05
        # deterministic in (seed, pixel, frame)
        s_again = Sampler.seed(0, jnp.arange(1024, dtype=jnp.uint32), 7)
        u1b, _ = s_again.next()
        np.testing.assert_array_equal(a, np.asarray(u1b))
        # different draws differ
        assert np.abs(a - np.asarray(u2)).max() > 0.1

    def test_radical_inverse(self):
        # base 2: 1 -> 0.5, 2 -> 0.25, 3 -> 0.75 (sampling.h:28)
        out = np.asarray(radical_inverse(jnp.asarray([1, 2, 3],
                                                     dtype=jnp.uint32)))
        np.testing.assert_allclose(out, [0.5, 0.25, 0.75], rtol=1e-6)
