"""Silhouette/boundary gradient term (diff/boundary.py) vs central finite
differences of the rendered loss.

The capability under test is the one plain autodiff cannot deliver:
translating a vertex whose silhouette crosses pixels must produce a
nonzero gradient that matches FD of an anti-aliased render.  FD references
use many jittered samples per pixel (sample positions are pixel_id-seeded,
independent of θ, so FD is correlated sampling of the same estimator)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.scene import Scene, TriangleMesh
from visionaray_tpu.diff.boundary import (
    boundary_image, build_edge_adjacency, silhouette_mask,
)
from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.scenes import cornell_box
from visionaray_tpu.sched.render import _render_frame, render
from visionaray_tpu.shading.lights import PointLights
from visionaray_tpu.shading.materials import Materials

W = H = 48
BG = (0.05, 0.10, 0.30, 1.0)
AMB = (0.2, 0.2, 0.2, 1.0)


def _loss_of_img(c):
    # asymmetric pixel weights so lateral silhouette motion is visible in
    # a scalar loss even for a symmetric shape
    wgt = jnp.linspace(0.5, 1.5, W)[None, :, None]
    return jnp.mean(c[..., :3] * wgt)


# --------------------------------------------------------------- triangle

TRI_V = np.array([[-0.6, -0.5, 0.0], [0.7, -0.4, 0.0], [0.0, 0.8, 0.0]],
                 np.float32)
TRI_F = np.array([[0, 1, 2]], np.int32)


def _tri_params(verts):
    mesh = TriangleMesh.create(verts, TRI_F)
    scene = Scene.create(
        mesh=mesh, materials=Materials.matte(cd=(0.8, 0.3, 0.2)),
        lights=PointLights.create(position=[[2, 3, 4]]))
    return KernelParams.create(scene, num_bounces=1, epsilon=1e-3,
                               bg_color=BG, ambient_color=AMB)


TRI_CAM = Pinhole.create(eye=(0, 0, 3), center=(0, 0, 0),
                         fovy=np.deg2rad(45), aspect=1.0)


def _tri_loss_fd(verts, spp=64):
    color, _ = _render_frame(_tri_params(jnp.asarray(verts)), TRI_CAM,
                             W, H, "simple", spp, "jittered", 0,
                             jnp.uint32(1), 0)
    return float(_loss_of_img(color))


def _tri_loss_analytic(verts, adj, with_boundary=True, **bopts):
    p = _tri_params(verts)
    color, _ = _render_frame(p, TRI_CAM, W, H, "simple", 1, "uniform", 0,
                             jnp.uint32(1), 0)
    if with_boundary:
        color = color + boundary_image(
            p, TRI_CAM, W, H, adj, algo="simple", vertices=verts,
            samples_per_edge=bopts.pop("samples_per_edge", 32), **bopts)
    return _loss_of_img(color)


class TestTriangle:
    def test_interior_autodiff_is_zero_for_translation(self):
        # the round-4 state of the world: fixed-topology autodiff sees
        # nothing when a flat-shaded triangle translates in-plane
        adj = build_edge_adjacency(TRI_F)
        g = jax.grad(lambda t: _tri_loss_analytic(
            jnp.asarray(TRI_V) + jnp.array([t, 0, 0]), adj,
            with_boundary=False))(0.0)
        # exactly-zero up to f32 autodiff fuzz (shading recompute at the
        # fixed hit topology contributes ~1e-17)
        assert float(abs(g)) < 1e-6

    def test_translation_gradient_matches_fd(self):
        adj = build_edge_adjacency(TRI_F)
        h = 0.03
        fd = (_tri_loss_fd(TRI_V + [h, 0, 0])
              - _tri_loss_fd(TRI_V + [-h, 0, 0])) / (2 * h)
        g = jax.grad(lambda t: _tri_loss_analytic(
            jnp.asarray(TRI_V) + jnp.array([t, 0, 0]), adj))(0.0)
        g = float(g)
        assert fd != 0.0
        assert abs(g - fd) <= 0.12 * abs(fd), (g, fd)

    def test_per_vertex_gradients_match_fd(self):
        adj = build_edge_adjacency(TRI_F)
        g = jax.grad(lambda v: _tri_loss_analytic(v, adj))(
            jnp.asarray(TRI_V))
        g = np.asarray(g)
        h = 0.03
        # probe a lateral and a vertical coordinate of two vertices
        for (vi, ci) in [(0, 0), (2, 0), (2, 1), (1, 1)]:
            dv = np.zeros_like(TRI_V)
            dv[vi, ci] = h
            fd = (_tri_loss_fd(TRI_V + dv)
                  - _tri_loss_fd(TRI_V - dv)) / (2 * h)
            assert abs(g[vi, ci] - fd) <= 0.15 * abs(fd) + 2e-4, (
                vi, ci, g[vi, ci], fd)

    def test_occluded_silhouette_contributes_zero(self):
        # a big near quad hides the triangle completely: probes on both
        # sides of its (still silhouette-flagged) edges hit the occluder,
        # so dF == 0 and the hidden triangle's boundary gradient vanishes
        occ = np.array([[-2, -2, 1.5], [2, -2, 1.5], [2, 2, 1.5],
                        [-2, 2, 1.5]], np.float32)
        verts = np.concatenate([TRI_V, occ]).astype(np.float32)
        faces = np.array([[0, 1, 2], [3, 4, 5], [3, 5, 6]], np.int32)
        adj = build_edge_adjacency(faces)

        def loss(t):
            v = jnp.asarray(verts).at[:3, 0].add(t)
            mesh = TriangleMesh.create(v, faces)
            scene = Scene.create(
                mesh=mesh,
                materials=Materials.concatenate(
                    [Materials.matte(cd=(0.8, 0.3, 0.2)),
                     Materials.matte(cd=(0.4, 0.4, 0.4))]),
                lights=PointLights.create(position=[[2, 3, 4]]))
            p = KernelParams.create(scene, num_bounces=1, epsilon=1e-3,
                                    bg_color=BG, ambient_color=AMB)
            b = boundary_image(p, TRI_CAM, W, H, adj, algo="simple",
                               vertices=v, samples_per_edge=16)
            return _loss_of_img(b)

        g = float(jax.grad(loss)(0.0))
        # O(delta) bias: the probes straddle the occluder's smooth shading
        # gradient, not a discontinuity — small but not exactly zero
        assert abs(g) < 3e-4, g

    def test_boundary_image_value_is_exactly_zero(self):
        adj = build_edge_adjacency(TRI_F)
        p = _tri_params(jnp.asarray(TRI_V))
        b = boundary_image(p, TRI_CAM, W, H, adj, algo="simple")
        assert float(jnp.abs(b).max()) == 0.0

    def test_render_boundary_flag(self):
        # the sched-level flag: grads of a loss over render(...) output
        # see the silhouette without custom plumbing
        mesh = TriangleMesh.create(TRI_V, TRI_F)
        scene = Scene.create(
            mesh=mesh, materials=Materials.matte(cd=(0.8, 0.3, 0.2)),
            lights=PointLights.create(position=[[2, 3, 4]]))
        adj = build_edge_adjacency(TRI_F)

        def loss(t):
            mesh2 = dataclasses.replace(
                scene.mesh,
                vertices=scene.mesh.vertices + jnp.array([t, 0, 0]))
            sc2 = dataclasses.replace(scene, mesh=mesh2)
            rt = render(sc2, TRI_CAM, W, H, algo="simple", bg_color=BG,
                        ambient=AMB, epsilon=1e-3, boundary=adj)
            return _loss_of_img(rt.color)

        g = float(jax.grad(loss)(0.0))
        assert g != 0.0 and np.isfinite(g)


# ---------------------------------------------------------------- cornell

def _cornell_pointlit():
    scene, cam = cornell_box()
    s = 5.55
    lights = PointLights.create(position=[[0.5 * s, 0.9 * s, -1.0 * s]],
                                cl=[[1.0, 1.0, 1.0]], kl=[3.0])
    return dataclasses.replace(scene, lights=lights), cam


class TestCornell:
    def _loss(self, scene, cam, verts, adj=None, spp=1, sampler="uniform",
              **bopts):
        mesh2 = dataclasses.replace(scene.mesh, vertices=verts)
        sc2 = dataclasses.replace(scene, mesh=mesh2)
        p = KernelParams.create(sc2, num_bounces=1, epsilon=1e-3,
                                bg_color=BG, ambient_color=AMB)
        color, _ = _render_frame(p, cam, W, H, "simple", spp, sampler, 0,
                                 jnp.uint32(1), 0)
        if adj is not None:
            color = color + boundary_image(
                p, cam, W, H, adj, algo="simple", vertices=verts, **bopts)
        return _loss_of_img(color)

    def test_tall_box_translation_matches_fd(self):
        scene, cam = _cornell_pointlit()
        verts0 = np.asarray(scene.mesh.vertices)
        faces = np.asarray(scene.mesh.faces)
        # weld: Cornell quads carry their own vertex copies — without it
        # every box edge double-counts as two open edges
        adj = build_edge_adjacency(faces, verts0)
        # tall box = last 6 quads = last 24 vertices
        sel = np.zeros_like(verts0)
        sel[-24:, 0] = 1.0
        h = 0.08
        fd = (float(self._loss(scene, cam,
                               jnp.asarray(verts0 + h * sel),
                               spp=64, sampler="jittered"))
              - float(self._loss(scene, cam,
                                 jnp.asarray(verts0 - h * sel),
                                 spp=64, sampler="jittered"))) / (2 * h)

        g = jax.grad(lambda t: self._loss(
            scene, cam, jnp.asarray(verts0) + t * jnp.asarray(sel), adj,
            samples_per_edge=32))(0.0)
        g = float(g)
        assert fd != 0.0
        assert abs(g - fd) <= 0.2 * abs(fd), (g, fd)

    def test_edge_budget_is_consistent(self):
        scene, cam = _cornell_pointlit()
        verts0 = jnp.asarray(scene.mesh.vertices)
        adj = build_edge_adjacency(np.asarray(scene.mesh.faces),
                                   np.asarray(scene.mesh.vertices))
        sel = np.zeros(verts0.shape, np.float32)
        sel[-24:, 0] = 1.0

        g_full = float(jax.grad(lambda t: self._loss(
            scene, cam, verts0 + t * jnp.asarray(sel), adj,
            samples_per_edge=16))(0.0))
        picks = [float(jax.grad(lambda t: self._loss(
            scene, cam, verts0 + t * jnp.asarray(sel), adj,
            samples_per_edge=16, edge_budget=24, seed=s))(0.0))
            for s in range(24)]
        # statistical unbiasedness: the 24-seed mean must agree with the
        # exhaustive gradient within its own standard error
        mean = float(np.mean(picks))
        sem = float(np.std(picks)) / np.sqrt(len(picks))
        assert abs(mean - g_full) <= 4.0 * sem + 0.05 * abs(g_full), (
            mean, sem, g_full)

    def test_silhouette_mask_flags_creases_not_diagonals(self):
        scene, cam = _cornell_pointlit()
        verts = np.asarray(scene.mesh.vertices)
        faces_np = np.asarray(scene.mesh.faces)
        adj = build_edge_adjacency(faces_np, verts)
        m = np.asarray(silhouette_mask(scene.mesh.vertices,
                                       scene.mesh.faces, adj, cam.eye,
                                       geom_ids=scene.mesh.geom_ids))
        faces = np.asarray(adj.faces)
        # every open (border) edge is flagged
        assert m[faces[:, 1] < 0].all()
        two = faces[:, 1] >= 0
        assert two.any()
        # normals of the two adjacent faces
        v1 = verts[faces_np[:, 0]]
        n = np.cross(verts[faces_np[:, 1]] - v1, verts[faces_np[:, 2]] - v1)
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        cosd = np.sum(n[faces[:, 0]] * n[np.maximum(faces[:, 1], 0)], -1)
        gids = np.asarray(scene.mesh.geom_ids)
        same_mat = gids[faces[:, 0]] == gids[np.maximum(faces[:, 1], 0)]
        coplanar = two & (cosd > 0.999) & same_mat      # quad diagonals
        crease = two & (cosd < 0.5)                     # box 90-degree edges
        assert coplanar.any() and crease.any()
        assert not m[coplanar].any()
        assert m[crease].all()


class TestPathtracingBoundary:
    def test_pt_nee_boundary_grads_finite_nonzero(self):
        # the flagship algo: boundary term composes with the NEE path
        # tracer (radiance probes are full PT estimates)
        scene, cam = cornell_box()
        adj = build_edge_adjacency(np.asarray(scene.mesh.faces))
        verts0 = jnp.asarray(scene.mesh.vertices)

        def loss(v):
            mesh2 = dataclasses.replace(scene.mesh, vertices=v)
            sc2 = dataclasses.replace(scene, mesh=mesh2)
            p = KernelParams.create(sc2, num_bounces=2, epsilon=1e-3,
                                    bg_color=(0, 0, 0, 1),
                                    ambient_color=(0, 0, 0, 0))
            b = boundary_image(p, cam, 24, 24, adj, algo="pathtracing",
                               nee=True, vertices=v, samples_per_edge=4)
            return jnp.mean(b[..., :3] * jnp.linspace(
                0.5, 1.5, 24)[None, :, None])

        g = jax.grad(loss)(verts0)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 0.0


# ----------------------------------------------------- shadow boundaries

class TestShadowBoundary:
    """Hard-shadow boundary term (diff/boundary.py shadow_boundary_image):
    a blocker between a point light and a receiver plane casts a moving
    shadow whose FD gradient plain autodiff + the PRIMARY boundary term
    cannot fully explain — the shadow curve is not a mesh edge."""

    W = H = 48

    def _scene(self, verts):
        from visionaray_tpu.core.scene import Scene, TriangleMesh
        faces = np.array([[0, 1, 2],            # blocker
                          [3, 4, 5], [3, 5, 6]  # ground quad
                          ], np.int32)
        mesh = TriangleMesh.create(verts, faces)
        mats = Materials.concatenate([
            Materials.matte(cd=(0.8, 0.3, 0.2)),
            Materials.matte(cd=(0.7, 0.7, 0.65)),
        ])
        lights = PointLights.create(position=[[0.6, 3.0, 0.8]],
                                    cl=[[1.0, 1.0, 1.0]], kl=[1.2])
        scene = Scene.create(
            mesh=TriangleMesh.create(
                verts, faces, geom_ids=np.array([0, 1, 1], np.int32)),
            materials=mats, lights=lights)
        return scene, faces

    BASE_V = np.array([
        [-0.45, 0.8, -0.25], [0.45, 0.8, -0.2], [0.0, 0.8, 0.55],  # blocker
        [-2.5, 0.0, -2.5], [2.5, 0.0, -2.5],
        [2.5, 0.0, 2.5], [-2.5, 0.0, 2.5],                         # ground
    ], np.float32)

    CAM = Pinhole.create(eye=(0.0, 2.6, 3.2), center=(0.0, 0.3, 0.0),
                         fovy=np.deg2rad(50), aspect=1.0)

    def _params(self, verts):
        scene, _ = self._scene(verts)
        return KernelParams.create(scene, num_bounces=1, epsilon=1e-3,
                                   bg_color=BG, ambient_color=AMB)

    def _loss_fd(self, verts, spp=64):
        color, _ = _render_frame(self._params(jnp.asarray(verts)),
                                 self.CAM, self.W, self.H, "whitted",
                                 spp, "jittered", 0, jnp.uint32(1), 0)
        return float(_loss_of_img(color))

    def _loss_analytic(self, verts, adj, shadow=True, light_pos=None):
        from visionaray_tpu.diff.boundary import shadow_boundary_image
        p = self._params(verts)
        if light_pos is not None:
            lights2 = dataclasses.replace(p.scene.lights,
                                          position=light_pos[None, :])
            p = dataclasses.replace(
                p, scene=dataclasses.replace(p.scene, lights=lights2))
        color, _ = _render_frame(p, self.CAM, self.W, self.H, "whitted",
                                 1, "uniform", 0, jnp.uint32(1), 0)
        color = color + boundary_image(
            p, self.CAM, self.W, self.H, adj, algo="whitted",
            vertices=verts, samples_per_edge=24)
        if shadow:
            color = color + shadow_boundary_image(
                p, self.CAM, self.W, self.H, adj, algo="whitted",
                vertices=verts, samples_per_edge=24,
                light_pos=light_pos)
        return _loss_of_img(color)

    def test_blocker_translation_matches_fd(self):
        from visionaray_tpu.diff.boundary import build_edge_adjacency
        adj = build_edge_adjacency(self._scene(self.BASE_V)[1], self.BASE_V)
        h = 0.04
        dv = np.zeros_like(self.BASE_V)
        dv[:3, 0] = 1.0
        fd = (self._loss_fd(self.BASE_V + h * dv)
              - self._loss_fd(self.BASE_V - h * dv)) / (2 * h)

        def loss(t, shadow):
            v = jnp.asarray(self.BASE_V) + t * jnp.asarray(dv)
            return self._loss_analytic(v, adj, shadow=shadow)

        g_no_shadow = float(jax.grad(lambda t: loss(t, False))(0.0))
        g_full = float(jax.grad(lambda t: loss(t, True))(0.0))
        assert fd != 0.0
        # without the shadow term a real part of the FD gradient is
        # unaccounted for; with it the totals agree
        assert abs(g_full - fd) <= 0.25 * abs(fd), (g_full, g_no_shadow, fd)
        assert abs(g_full - fd) < abs(g_no_shadow - fd), (
            g_full, g_no_shadow, fd)

    def test_light_position_gradient_matches_fd(self):
        from visionaray_tpu.diff.boundary import build_edge_adjacency
        adj = build_edge_adjacency(self._scene(self.BASE_V)[1], self.BASE_V)
        L0 = np.array([0.6, 3.0, 0.8], np.float32)
        h = 0.06

        def loss_fd_L(Lx):
            p = self._params(jnp.asarray(self.BASE_V))
            lights2 = dataclasses.replace(
                p.scene.lights,
                position=jnp.asarray([[Lx, L0[1], L0[2]]], jnp.float32))
            p = dataclasses.replace(
                p, scene=dataclasses.replace(p.scene, lights=lights2))
            color, _ = _render_frame(p, self.CAM, self.W, self.H,
                                     "whitted", 64, "jittered", 0,
                                     jnp.uint32(1), 0)
            return float(_loss_of_img(color))

        fd = (loss_fd_L(L0[0] + h) - loss_fd_L(L0[0] - h)) / (2 * h)

        def loss(lx):
            L = jnp.asarray([lx, L0[1], L0[2]])
            return self._loss_analytic(jnp.asarray(self.BASE_V), adj,
                                       shadow=True, light_pos=L)

        g = float(jax.grad(loss)(L0[0]))
        assert fd != 0.0
        assert abs(g - fd) <= 0.25 * abs(fd) + 5e-4, (g, fd)

    def test_shadow_image_value_is_zero(self):
        from visionaray_tpu.diff.boundary import (
            build_edge_adjacency, shadow_boundary_image,
        )
        adj = build_edge_adjacency(self._scene(self.BASE_V)[1], self.BASE_V)
        b = shadow_boundary_image(self._params(jnp.asarray(self.BASE_V)),
                                  self.CAM, self.W, self.H, adj,
                                  algo="whitted")
        assert float(jnp.abs(b).max()) == 0.0

    def test_receiver_grads_flow_through_vertices_arg(self):
        # regression (r5 review): the receiver plane must derive from the
        # `vertices` ARGUMENT — with params held fixed, grads w.r.t. a
        # separate theta leaf must reach the RECEIVER (ground) vertices,
        # not just the blocker
        from visionaray_tpu.diff.boundary import (
            build_edge_adjacency, shadow_boundary_image,
        )
        adj = build_edge_adjacency(self._scene(self.BASE_V)[1], self.BASE_V)
        p0 = self._params(jnp.asarray(self.BASE_V))

        def loss(v):
            b = shadow_boundary_image(p0, self.CAM, self.W, self.H, adj,
                                      algo="whitted", vertices=v,
                                      samples_per_edge=8)
            return _loss_of_img(b)

        g = np.asarray(jax.grad(loss)(jnp.asarray(self.BASE_V)))
        assert np.isfinite(g).all()
        assert np.abs(g[3:]).sum() > 0.0, "receiver grads are zero"
        assert np.abs(g[:3]).sum() > 0.0, "blocker grads are zero"

    def test_two_lights_sum_matches_fd(self):
        # light_index=None sums per-light shadow curves; FD over a
        # two-point-light scene must match the summed term
        from visionaray_tpu.diff.boundary import (
            build_edge_adjacency, shadow_boundary_image,
        )
        adj = build_edge_adjacency(self._scene(self.BASE_V)[1], self.BASE_V)

        def two_light(p):
            lights2 = PointLights.create(
                position=[[0.6, 3.0, 0.8], [-1.2, 2.6, 1.4]],
                cl=[[1.0, 0.9, 0.8], [0.6, 0.7, 1.0]], kl=[0.9, 0.8])
            return dataclasses.replace(
                p, scene=dataclasses.replace(p.scene, lights=lights2))

        def loss_fd(verts):
            p = two_light(self._params(jnp.asarray(verts)))
            color, _ = _render_frame(p, self.CAM, self.W, self.H,
                                     "whitted", 64, "jittered", 0,
                                     jnp.uint32(1), 0)
            return float(_loss_of_img(color))

        h = 0.04
        dv = np.zeros_like(self.BASE_V)
        dv[:3, 0] = 1.0
        fd = (loss_fd(self.BASE_V + h * dv)
              - loss_fd(self.BASE_V - h * dv)) / (2 * h)

        def loss(t):
            v = jnp.asarray(self.BASE_V) + t * jnp.asarray(dv)
            p = two_light(self._params(v))
            color, _ = _render_frame(p, self.CAM, self.W, self.H,
                                     "whitted", 1, "uniform", 0,
                                     jnp.uint32(1), 0)
            color = color + boundary_image(
                p, self.CAM, self.W, self.H, adj, algo="whitted",
                vertices=v, samples_per_edge=24)
            color = color + shadow_boundary_image(
                p, self.CAM, self.W, self.H, adj, algo="whitted",
                vertices=v, samples_per_edge=24, light_index=None)
            return _loss_of_img(color)

        g = float(jax.grad(loss)(0.0))
        assert fd != 0.0
        assert abs(g - fd) <= 0.25 * abs(fd), (g, fd)


# ------------------------------------------------------ sphere silhouettes

class TestSphereBoundary:
    """Sphere silhouette boundary term (closed-form grazing circle) vs FD:
    translating a sphere or growing its radius sweeps the silhouette
    circle across pixels — zero gradient at fixed topology."""

    W = H = 48
    CAM = Pinhole.create(eye=(0, 0, 3), center=(0, 0, 0),
                         fovy=np.deg2rad(45), aspect=1.0)

    def _params(self, center, radius):
        from visionaray_tpu.core.scene import Scene, Spheres
        scene = Scene.create(
            spheres=Spheres.create(center[None, :], radius[None]),
            materials=Materials.matte(cd=(0.3, 0.7, 0.4)),
            lights=PointLights.create(position=[[2, 3, 4]]))
        return KernelParams.create(scene, num_bounces=1, epsilon=1e-3,
                                   bg_color=BG, ambient_color=AMB)

    def _loss_fd(self, center, radius, spp=64):
        color, _ = _render_frame(
            self._params(jnp.asarray(center), jnp.asarray(radius)),
            self.CAM, self.W, self.H, "simple", spp, "jittered", 0,
            jnp.uint32(1), 0)
        return float(_loss_of_img(color))

    def _loss_an(self, center, radius, with_boundary=True):
        # interior at the SAME 64 jittered sample positions as the FD
        # reference (correlated sampling: jitter is pixel_id-seeded,
        # independent of theta) — the sphere's grazing shading makes the
        # interior term steep near the silhouette, so a 1-spp uniform
        # interior estimate would dominate the comparison error
        from visionaray_tpu.diff.boundary import sphere_boundary_image
        p = self._params(center, radius)
        color, _ = _render_frame(p, self.CAM, self.W, self.H, "simple",
                                 64, "jittered", 0, jnp.uint32(1), 0)
        if with_boundary:
            color = color + sphere_boundary_image(
                p, self.CAM, self.W, self.H, algo="simple",
                centers=center[None, :], radii=radius[None],
                samples_per_sphere=64)
        return _loss_of_img(color)

    C0 = np.array([0.1, -0.15, 0.0], np.float32)
    R0 = np.float32(0.55)

    def test_center_translation_matches_fd(self):
        h = 0.03
        fd = (self._loss_fd(self.C0 + [h, 0, 0], self.R0)
              - self._loss_fd(self.C0 - [h, 0, 0], self.R0)) / (2 * h)
        g = jax.grad(lambda t: self._loss_an(
            jnp.asarray(self.C0) + jnp.array([t, 0, 0]),
            jnp.asarray(self.R0)))(0.0)
        g_int = jax.grad(lambda t: self._loss_an(
            jnp.asarray(self.C0) + jnp.array([t, 0, 0]),
            jnp.asarray(self.R0), with_boundary=False))(0.0)
        assert fd != 0.0
        assert abs(float(g) - fd) <= 0.15 * abs(fd) + 2e-4, (float(g), fd)
        # interior alone must miss a large part of the gradient
        assert abs(float(g_int) - fd) > 2 * abs(float(g) - fd), (
            float(g_int), float(g), fd)

    def test_radius_gradient_matches_fd(self):
        h = 0.02
        fd = (self._loss_fd(self.C0, self.R0 + h)
              - self._loss_fd(self.C0, self.R0 - h)) / (2 * h)
        g = jax.grad(lambda r: self._loss_an(
            jnp.asarray(self.C0), r))(jnp.asarray(self.R0))
        assert fd != 0.0
        assert abs(float(g) - fd) <= 0.15 * abs(fd) + 2e-4, (float(g), fd)

    def test_value_is_zero(self):
        from visionaray_tpu.diff.boundary import sphere_boundary_image
        p = self._params(jnp.asarray(self.C0), jnp.asarray(self.R0))
        b = sphere_boundary_image(p, self.CAM, self.W, self.H,
                                  algo="simple")
        assert float(jnp.abs(b).max()) == 0.0


def test_matrix_camera_boundary_matches_pinhole():
    """Boundary terms accept a MatrixCamera: the gradient must equal the
    Pinhole gradient (the matrices ARE the same camera)."""
    from visionaray_tpu.core.camera import MatrixCamera
    adj = build_edge_adjacency(TRI_F)
    mcam = MatrixCamera.from_pinhole(TRI_CAM)

    def loss(t, cam):
        v = jnp.asarray(TRI_V) + jnp.array([t, 0, 0])
        p = _tri_params(v)
        b = boundary_image(p, cam, W, H, adj, algo="simple", vertices=v,
                           samples_per_edge=16)
        return _loss_of_img(b)

    g_pin = float(jax.grad(lambda t: loss(t, TRI_CAM))(0.0))
    g_mat = float(jax.grad(lambda t: loss(t, mcam))(0.0))
    assert g_pin != 0.0
    assert abs(g_mat - g_pin) <= 2e-3 * abs(g_pin) + 1e-7, (g_mat, g_pin)


def test_render_boundary_flag_spheres():
    """render(boundary=True) on a sphere scene adds the sphere term: the
    gradient of a loss over the frame w.r.t. a center translation is
    nonzero (no mesh in the scene at all)."""
    from visionaray_tpu.core.scene import Scene, Spheres

    def loss(t):
        scene = Scene.create(
            spheres=Spheres.create(
                jnp.asarray([[0.1 + t, -0.15, 0.0]]), jnp.asarray([0.55])),
            materials=Materials.matte(cd=(0.3, 0.7, 0.4)),
            lights=PointLights.create(position=[[2, 3, 4]]))
        rt = render(scene, TRI_CAM, W, H, algo="simple", bg_color=BG,
                    ambient=AMB, epsilon=1e-3, boundary=True)
        return _loss_of_img(rt.color)

    g = float(jax.grad(loss)(0.0))
    assert g != 0.0 and np.isfinite(g)
