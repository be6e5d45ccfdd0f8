"""Config #5 end-to-end: path tracing over SHARDED geometry (VERDICT r2
Next #2).

8-device CPU mesh: the full PT bounce loop (ring closest hit + local
surface gather + NEE shadow rings) must match the replicated renderer on
the same scene, gradients must flow to the per-shard soups and map back
to faces, and per-shard memory must be ~1/D."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.core.scene import Scene
from visionaray_tpu.parallel.ring import shard_geometry
from visionaray_tpu.parallel.sharded_pt import (
    render_image_geometry_sharded, soup_grads_to_faces,
)
from visionaray_tpu.parallel.tile_sharding import make_mesh
from visionaray_tpu.scenes import cornell_box
from visionaray_tpu.sched.render import render
from visionaray_tpu.shading.lights import AreaLights

W = H = 40
BOUNCES = 3
EPS = 1e-3
BG = (0.1, 0.4, 1.0, 1.0)
AMB = (1.0, 1.0, 1.0, 1.0)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


@pytest.fixture(scope="module")
def cornell_nee():
    """Cornell box + an AreaLights entry duplicating the emissive patch
    (the emissive-geometry + light-list pairing NEE needs)."""
    scene, cam = cornell_box()
    s = 5.55
    l0, l1, ly = 0.35 * s, 0.65 * s, s - 0.005 * s
    al = AreaLights.rect(corner=(l0, ly, l0), edge1=(l1 - l0, 0, 0),
                         edge2=(0, 0, l1 - l0), cl=(1.0, 0.85, 0.6), kl=8.0)
    return dataclasses.replace(scene, lights=al), cam


def _replicated(scene, cam, nee):
    rt = render(scene, cam, W, H, algo="pathtracing", spp=1,
                bounces=BOUNCES, epsilon=EPS, bg_color=BG, ambient=AMB,
                pixel_sampler="jittered_blend", frame_num=1, seed=0,
                nee=nee)
    return np.asarray(rt.color)


def _sharded(scene, cam, mesh8, nee, backend):
    geo = shard_geometry(scene.mesh, 8, backend=backend, with_shading=True)
    color, depth = render_image_geometry_sharded(
        geo, scene.materials, scene.lights, cam, W, H, mesh8,
        num_bounces=BOUNCES, spp=1, eps=EPS, bg_color=BG,
        ambient=AMB[:3], frame_num=1, seed=0, nee=nee)
    return np.asarray(color), geo


def _assert_images_match(a, b):
    # identical math modulo cross-shard min-reduction order; edge-exact
    # equal-t ties may pick a different (equivalent) face
    close = np.isclose(a, b, atol=2e-3, rtol=1e-4)
    frac = close.mean()
    assert frac > 0.995, f"only {frac:.4f} of channels match"
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=5e-3)


class TestShardedPT:
    def test_nee_matches_replicated_brute(self, cornell_nee, mesh8):
        scene, cam = cornell_nee
        ref = _replicated(scene, cam, nee=True)
        got, geo = _sharded(scene, cam, mesh8, nee=True, backend="brute")
        assert ref[..., :3].mean() > 0.01  # actually lit
        _assert_images_match(got, ref)
        # per-shard memory ~ 1/D (VERDICT Next #2 "HBM ~= 1/D asserted")
        F = scene.mesh.num_prims
        assert geo.soup.v1.shape == (8, -(-F // 8), 3)

    def test_nee_matches_replicated_lbvh(self, cornell_nee, mesh8):
        scene, cam = cornell_nee
        ref = _replicated(scene, cam, nee=True)
        got, _ = _sharded(scene, cam, mesh8, nee=True, backend="lbvh")
        _assert_images_match(got, ref)

    def test_bsdf_only_matches_replicated(self, cornell_nee, mesh8):
        scene, cam = cornell_nee
        ref = _replicated(scene, cam, nee=False)
        got, _ = _sharded(scene, cam, mesh8, nee=False, backend="brute")
        _assert_images_match(got, ref)

    def test_grads_flow_to_shards(self, cornell_nee, mesh8):
        scene, cam = cornell_nee
        geo = shard_geometry(scene.mesh, 8, backend="brute",
                             with_shading=True)

        def loss(v1, e1, e2, cn):
            soup2 = dataclasses.replace(geo.soup, v1=v1, e1=e1, e2=e2,
                                        corner_normals=cn)
            geo2 = dataclasses.replace(geo, soup=soup2)
            color, _ = render_image_geometry_sharded(
                geo2, scene.materials, scene.lights, cam, W, H, mesh8,
                num_bounces=2, spp=1, eps=EPS, bg_color=BG,
                ambient=AMB[:3], frame_num=1, seed=0, nee=True)
            return jnp.mean(color[..., :3])

        gv1, ge1, ge2, gcn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
            geo.soup.v1, geo.soup.e1, geo.soup.e2, geo.soup.corner_normals)
        import types
        g = types.SimpleNamespace(soup=types.SimpleNamespace(
            v1=gv1, e1=ge1, e2=ge2, corner_normals=gcn))
        for leaf in (g.soup.v1, g.soup.e1, g.soup.e2, g.soup.corner_normals):
            assert np.isfinite(np.asarray(leaf)).all()
        assert float(jnp.abs(g.soup.v1).sum()) > 0.0
        # map per-shard soup grads back to the original face order
        F = scene.mesh.num_prims
        gv1 = soup_grads_to_faces(g.soup.v1, geo.prim_ids, F)
        assert gv1.shape == (F, 3)
        assert np.isfinite(np.asarray(gv1)).all()
        assert float(jnp.abs(gv1).sum()) > 0.0


class TestInstancedScene:
    def test_instance_mesh_x16(self):
        from visionaray_tpu.scenes import sponza_x16_scene
        scene, cam = sponza_x16_scene(target_tris_per_instance=4000,
                                      instances=16)
        from visionaray_tpu.scenes.sponza_like import sponza_like_scene
        base, _ = sponza_like_scene(target_tris=4000, build_bvh=False)
        assert scene.mesh.num_prims == 16 * base.mesh.num_prims
        # instances laid out on a 4x4 grid: extent ~4x the base footprint
        bb = scene.bbox()
        bb0 = base.bbox()
        ext = np.asarray(bb.hi - bb.lo)
        ext0 = np.asarray(bb0.hi - bb0.lo)
        assert ext[0] > 3.5 * ext0[0] and ext[2] > 3.5 * ext0[2]

    def test_instanced_sharded_render_smoke(self, mesh8):
        """A miniature config #5: instanced scene, geometry-sharded PT."""
        from visionaray_tpu.scenes import sponza_x16_scene
        scene, cam = sponza_x16_scene(target_tris_per_instance=800,
                                      instances=16)
        geo = shard_geometry(scene.mesh, 8, backend="lbvh",
                             with_shading=True)
        color, depth = render_image_geometry_sharded(
            geo, scene.materials, scene.lights, cam, 32, 32, mesh8,
            num_bounces=2, spp=1, eps=1e-3, bg_color=BG, ambient=(1, 1, 1),
            frame_num=1, seed=0, nee=True)
        assert color.shape == (32, 32, 4)
        assert np.isfinite(np.asarray(color)).all()
        assert float(color[..., :3].mean()) > 0.0
