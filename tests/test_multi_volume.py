"""Multi-volume rendering (VERDICT r2 Missing #5 / Next #7) and
spot-light NEE (Weak #7).

Reference analogue: examples/multi_volume/main.cpp:376-690 — several
AABB-bounded volumes with per-volume transfer functions composited in
bounding-box order."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.scene import Scene, TriangleMesh
from visionaray_tpu.kernels.volume import Volumes
from visionaray_tpu.scenes import multi_volume_scene, volume_scene
from visionaray_tpu.sched.render import render
from visionaray_tpu.shading.lights import SpotLights
from visionaray_tpu.shading.materials import Materials


class TestMultiVolume:
    def test_single_volume_still_renders(self):
        scene, cam = volume_scene(resolution=16)
        rt = render(scene, cam, 24, 24, algo="volume", spp=1)
        img = np.asarray(rt.color)
        assert np.isfinite(img).all()
        assert img[..., :3].std() > 0.01

    def test_three_volumes_distinct_colors(self):
        scene, cam = multi_volume_scene(resolution=24, n_volumes=3)
        rt = render(scene, cam, 48, 48, algo="volume", spp=1)
        img = np.asarray(rt.color)
        assert np.isfinite(img).all()
        # each volume has its own transfer ramp (red/green/blue-ish);
        # all three must be visible somewhere in the frame
        rgb = img[..., :3]
        dom = rgb.argmax(axis=-1)
        for ch in (0, 1, 2):
            lead = (rgb[..., ch] > 0.15) & (dom == ch)
            assert lead.any(), f"channel {ch} volume not visible"

    def test_compositing_is_depth_ordered_not_array_ordered(self):
        """Permuting the volume ARRAY order must not change the image —
        per-ray entry-distance order decides (the reference composites by
        bounding-box order, multi_volume/main.cpp)."""
        scene, cam = multi_volume_scene(resolution=16, n_volumes=3)
        rt1 = render(scene, cam, 32, 32, algo="volume", spp=1)

        v = scene.volumes
        p = np.array([2, 0, 1])
        vols2 = Volumes(lo=v.lo[p, :], hi=v.hi[p, :],
                        texels=v.texels[p], transfer=v.transfer[p])
        scene2 = dataclasses.replace(scene, volumes=vols2)
        rt2 = render(scene2, cam, 32, 32, algo="volume", spp=1)
        np.testing.assert_allclose(np.asarray(rt1.color),
                                   np.asarray(rt2.color),
                                   atol=1e-5, rtol=1e-5)

    def test_compile_is_volume_count_independent(self):
        """The rank loop is a lax.scan: the jaxpr must not grow with V
        (previously a Python loop inlined V copies of a 512-step march)."""
        from visionaray_tpu.kernels.params import KernelParams
        from visionaray_tpu.kernels.volume import volume_kernel
        from visionaray_tpu.core.types import Ray

        def jaxpr_len(n_volumes):
            scene, cam = multi_volume_scene(resolution=8,
                                            n_volumes=n_volumes)
            params = KernelParams.create(scene, num_bounces=1, epsilon=1e-3,
                                         bg_color=(0, 0, 0, 1),
                                         ambient_color=(0, 0, 0, 0))
            ray = Ray(ori=jnp.zeros((16, 3)), dir=jnp.ones((16, 3)))
            jx = jax.make_jaxpr(lambda r: volume_kernel(params, r).color)(
                ray)
            return len(str(jx))

        l2, l6 = jaxpr_len(2), jaxpr_len(6)
        assert l6 < 1.3 * l2, (l2, l6)


class TestSpotNEE:
    """Spot light through NEE vs the whitted direct term (VERDICT Weak #7:
    no NEE test with a spot light existed)."""

    def _scene(self):
        verts = np.array([[-4, 0, -4], [4, 0, -4], [4, 0, 4], [-4, 0, 4]],
                         np.float32)
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        mesh = TriangleMesh.create(verts, faces)
        mats = Materials.matte(cd=(0.7, 0.6, 0.5), kd=1.0, ca=(0, 0, 0),
                               ka=0.0)
        spot = SpotLights.create(position=[[0.0, 3.0, 0.0]],
                                 direction=[[0.0, -1.0, 0.0]],
                                 cutoff_deg=25.0, exponent=2.0,
                                 cl=(1.0, 0.9, 0.8), kl=4.0)
        scene = Scene.create(mesh=mesh, materials=mats, lights=spot)
        cam = Pinhole.create(eye=(0, 5.0, 6.0), center=(0, 0, 0),
                             up=(0, 1, 0), fovy=np.deg2rad(45), aspect=1.0)
        return scene, cam

    def test_nee_matches_whitted_direct(self):
        """1-bounce NEE PT == whitted direct lighting for a delta light on
        a pure-matte scene (identical shade() algebra on both paths)."""
        scene, cam = self._scene()
        kw = dict(spp=1, ambient=(0, 0, 0, 0), bg_color=(0, 0, 0, 1),
                  pixel_sampler="uniform", epsilon=1e-3)
        rt_w = render(scene, cam, 48, 48, algo="whitted", bounces=1, **kw)
        rt_p = render(scene, cam, 48, 48, algo="pathtracing", bounces=1,
                      nee=True, **kw)
        a = np.asarray(rt_w.color[..., :3])
        b = np.asarray(rt_p.color[..., :3])
        assert a.max() > 0.05  # the cone actually lights the floor
        np.testing.assert_allclose(a, b, atol=2e-4)

    def test_cone_cutoff(self):
        """Pixels outside the spot cone are black, inside are lit."""
        scene, cam = self._scene()
        rt = render(scene, cam, 64, 64, algo="pathtracing", bounces=1,
                    nee=True, spp=1, ambient=(0, 0, 0, 0),
                    bg_color=(0, 0, 0, 1), pixel_sampler="uniform",
                    epsilon=1e-3)
        img = np.asarray(rt.color[..., :3]).sum(-1)
        hit = np.asarray(rt.depth) > 0
        assert (img[hit] > 1e-3).any()       # inside the cone: lit
        assert (img[hit] < 1e-6).any()       # floor beyond cutoff: dark
