"""Round-2 correctness fixes: NEE through specular chains, ao/volume kernel
registry, SSAA at arbitrary spp, degenerate-layout stack bound."""

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
from visionaray_tpu.shading.materials import Materials
from visionaray_tpu.sched.render import KERNELS, render


def _quad(z, base):
    verts = [[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]]
    faces = [[base, base + 1, base + 2], [base, base + 2, base + 3]]
    return verts, faces


class TestNEESpecularChain:
    """Mirror reflections of emissive surfaces must not render black under
    NEE (ADVICE round 1, medium): the emissive term rides the path after a
    delta bounce because NEE cannot sample a light through a mirror."""

    def _mirror_emissive_scene(self):
        # camera ray +z hits a mirror quad at z=2 facing -z; the mirror
        # reflects straight back to an emissive quad at z=-2 facing +z.
        verts, faces, gids = [], [], []
        v, f = _quad(2.0, 0)
        verts += v
        faces += f
        gids += [0, 0]
        v, f = _quad(-2.0, 4)
        verts += v
        faces += f
        gids += [1, 1]
        mesh = TriangleMesh.create(np.asarray(verts, np.float32),
                                   np.asarray(faces, np.int32),
                                   geom_ids=np.asarray(gids, np.int32))
        mats = Materials.concatenate([
            Materials.mirror(cr=(1.0, 1.0, 1.0), kr=1.0),
            Materials.emissive(ce=(2.0, 1.0, 0.5), ls=1.0),
        ])
        return Scene.create(mesh=mesh, materials=mats)

    def test_mirror_sees_emissive_with_nee(self):
        scene = self._mirror_emissive_scene()
        params = KernelParams.create(scene, num_bounces=4, epsilon=1e-4,
                                     bg_color=(0, 0, 0, 1),
                                     ambient_color=(0, 0, 0, 0))
        ray = Ray(ori=jnp.asarray([[0.3, 0.2, 0.0]]),
                  dir=jnp.asarray([[0.0, 0.0, 1.0]]))
        samp = Sampler.seed(0, jnp.asarray([7], jnp.uint32), jnp.uint32(1))
        out_nee = pathtracing_kernel(params, ray, samp, nee=True)
        out_ref = pathtracing_kernel(params, ray, samp, nee=False)
        c_nee = np.asarray(out_nee.color[0, :3])
        c_ref = np.asarray(out_ref.color[0, :3])
        # mirror bounce is deterministic, so both estimators give the exact
        # path value: mirror fresnel weight times the emitter color
        assert c_nee[0] > 0.1, "mirror reflection of emitter rendered black"
        np.testing.assert_allclose(c_nee, c_ref, rtol=1e-5)


class TestKernelRegistry:
    def test_all_cli_algorithms_registered(self):
        # every CLI --algorithm choice must resolve in the KERNELS registry
        # (round 1: `--algorithm ao` was a shipped flag that raised KeyError)
        for algo in ["simple", "whitted", "pathtracing", "ao", "volume"]:
            assert algo in KERNELS

    def test_ao_renders(self):
        from visionaray_tpu.scenes import cornell_box
        scene, cam = cornell_box()
        rt = render(scene, cam, 24, 24, algo="ao", spp=1)
        img = np.asarray(rt.color)
        assert np.isfinite(img).all()
        ao = img[..., 0]
        # the open cornell front plus the corners must show contrast
        assert ao.max() > 0.5 and ao.min() < ao.max() - 0.1

    def test_volume_renders(self):
        from visionaray_tpu.scenes import volume_scene
        scene, cam = volume_scene(resolution=16)
        rt = render(scene, cam, 24, 24, algo="volume", spp=1)
        img = np.asarray(rt.color)
        assert np.isfinite(img).all()
        assert img[..., :3].std() > 0.01  # structured, not constant


class TestSSAAArbitrarySPP:
    def test_offsets_distinct_for_any_spp(self):
        from visionaray_tpu.sched.render import _ssaa_offsets
        for spp in (1, 2, 3, 4, 5, 7, 8, 16):
            offs = _ssaa_offsets(spp)
            assert len(offs) == spp
            assert len(set(offs)) == spp, f"duplicate offsets at spp={spp}"
            for ox, oy in offs:
                assert -0.5 <= ox <= 0.5 and -0.5 <= oy <= 0.5

    def test_spp3_antialiases(self):
        # a half-covered edge pixel: spp=3 ssaa must differ from the
        # pixel-center value (previously all samples collapsed to center)
        from visionaray_tpu.scenes import tri_sphere_plane
        scene, cam = tri_sphere_plane()
        rt1 = render(scene, cam, 32, 32, algo="simple", spp=1,
                     pixel_sampler="ssaa")
        rt3 = render(scene, cam, 32, 32, algo="simple", spp=3,
                     pixel_sampler="ssaa")
        d = np.abs(np.asarray(rt1.color) - np.asarray(rt3.color))
        assert d.max() > 1e-3


class TestDegenerateLayoutStackBound:
    def test_degenerate_layout_stack_bound(self):
        """All-identical centroids: morton codes all equal, the radix tree
        splits purely on the index tiebreak.  Results must still match
        brute force (validates the STACK_DEPTH<=64 proof at a scale where a
        chain-shaped tree would overflow: depth would be ~2k)."""
        from visionaray_tpu.ops.lbvh import build_lbvh
        from visionaray_tpu.ops.trace import closest_hit

        rng = np.random.default_rng(3)
        F = 2048
        # tiny triangles jittered around one point: centroids quantize to
        # one morton cell
        c = np.float32([0.5, 0.5, 0.5])
        v0 = c + rng.normal(scale=1e-5, size=(F, 3)).astype(np.float32)
        v1 = v0 + np.float32([1e-4, 0, 0])
        v2 = v0 + np.float32([0, 1e-4, 0])
        verts = np.concatenate([v0, v1, v2], axis=0).astype(np.float32)
        faces = np.stack([np.arange(F), np.arange(F) + F,
                          np.arange(F) + 2 * F], axis=1).astype(np.int32)
        mesh = TriangleMesh.create(verts, faces)
        scene = Scene.create(mesh=mesh)
        scene_bvh = dataclasses.replace(scene, bvh=build_lbvh(mesh))

        ray = Ray(ori=jnp.asarray([[0.5, 0.5, -1.0], [0.0, 0.0, 0.0]]),
                  dir=jnp.asarray([[0.0, 0.0, 1.0], [0.577, 0.577, 0.577]]))
        hr_bvh = closest_hit(ray, scene_bvh)
        hr_ref = closest_hit(ray, scene, use_bvh=False)
        np.testing.assert_array_equal(np.asarray(hr_bvh.hit),
                                      np.asarray(hr_ref.hit))
        np.testing.assert_allclose(np.asarray(hr_bvh.t),
                                   np.asarray(hr_ref.t), rtol=1e-5)
