"""Cameras and primary ray generation.

Semantics mirror the reference:
- look_at / perspective matrices: detail/camera.inl:10-64
- the scheduler's camera basis: detail/tiled_sched.inl:298-305
      f = normalize(eye - center); s = normalize(cross(up, f)); u = cross(f, s)
      cam_u = s * tan(fovy/2) * aspect;  cam_v = u * tan(fovy/2);  cam_w = -f
- primary rays from pixel centers: detail/sched_common.h:132-150
      u_ndc = 2*(x+0.5)/width - 1;  dir = normalize(cam_u*u + cam_v*v + cam_w)
- matrix-camera path (inverse view/proj): detail/sched_common.h:152-178

Pixel convention is OpenGL-style: x to the right, y UP (pixel row 0 is the
bottom of the image, as in the reference's GL render targets).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from visionaray_tpu.core.types import Ray, pytree_dataclass, replace
from visionaray_tpu.core.vecmath import cross, dot, length, normalize


@pytree_dataclass
class Pinhole:
    """Pinhole camera (reference camera.h:40-95)."""

    eye: Any
    center: Any
    up: Any
    fovy: Any    # radians (full angle, like gluPerspective but in radians)
    aspect: Any
    z_near: Any
    z_far: Any

    @staticmethod
    def create(eye, center, up=(0.0, 1.0, 0.0), fovy=jnp.pi / 4,
               aspect=1.0, z_near=0.001, z_far=1000.0) -> "Pinhole":
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return Pinhole(f32(eye), f32(center), f32(up), f32(fovy), f32(aspect),
                       f32(z_near), f32(z_far))

    def look_at(self, eye, center, up=(0.0, 1.0, 0.0)) -> "Pinhole":
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return replace(self, eye=f32(eye), center=f32(center), up=f32(up))

    def perspective(self, fovy, aspect, z_near=0.001, z_far=1000.0) -> "Pinhole":
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return replace(self, fovy=f32(fovy), aspect=f32(aspect),
                       z_near=f32(z_near), z_far=f32(z_far))

    def view_all(self, bbox_lo, bbox_hi, up=(0.0, 1.0, 0.0)) -> "Pinhole":
        """Frame a bounding box (reference detail/camera.inl:79-87)."""
        lo = jnp.asarray(bbox_lo, jnp.float32)
        hi = jnp.asarray(bbox_hi, jnp.float32)
        diagonal = length(hi - lo)
        r = diagonal * 0.5
        c = 0.5 * (lo + hi)
        eye = c + jnp.array([0.0, 0.0, 1.0], jnp.float32) * (
            r + r / jnp.tan(self.fovy))
        return self.look_at(eye, c, up)

    @property
    def distance(self):
        return length(self.eye - self.center)

    def basis(self):
        """(cam_u, cam_v, cam_w) image-plane basis (tiled_sched.inl:298-305)."""
        f = normalize(self.eye - self.center)
        s = normalize(cross(self.up, f))
        u = cross(f, s)
        t = jnp.tan(self.fovy / 2.0)
        cam_u = s * t * self.aspect
        cam_v = u * t
        cam_w = -f
        return cam_u, cam_v, cam_w

    def view_matrix(self):
        """Row-vector-on-right 4x4 view matrix (detail/camera.inl:10-30)."""
        f = normalize(self.eye - self.center)
        s = normalize(cross(self.up, f))
        u = cross(f, s)
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[0, :3].set(s)
        m = m.at[1, :3].set(u)
        m = m.at[2, :3].set(f)
        m = m.at[0, 3].set(-dot(self.eye, s))
        m = m.at[1, 3].set(-dot(self.eye, u))
        m = m.at[2, 3].set(-dot(self.eye, f))
        return m

    def proj_matrix(self):
        """GL-style perspective projection (detail/camera.inl:32-64)."""
        f = 1.0 / jnp.tan(self.fovy * 0.5)
        zn, zf = self.z_near, self.z_far
        m = jnp.zeros((4, 4), jnp.float32)
        m = m.at[0, 0].set(f / self.aspect)
        m = m.at[1, 1].set(f)
        m = m.at[2, 2].set((zf + zn) / (zn - zf))
        m = m.at[2, 3].set((2.0 * zf * zn) / (zn - zf))
        m = m.at[3, 2].set(-1.0)
        return m

    def primary_rays(self, x, y, width, height, jitter=None) -> Ray:
        """Primary rays for float pixel coords x, y (sched_common.h:132-150).

        ``x``/``y`` are integer pixel indices (any broadcastable shape); the
        +0.5 pixel-center offset is applied here.  ``jitter`` is an optional
        (..., 2) array of sub-pixel offsets in [-0.5, 0.5).
        """
        cam_u, cam_v, cam_w = self.basis()
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        if jitter is not None:
            x = x + jitter[..., 0]
            y = y + jitter[..., 1]
        u = 2.0 * (x + 0.5) / width - 1.0
        v = 2.0 * (y + 0.5) / height - 1.0
        d = normalize(cam_u * u[..., None] + cam_v * v[..., None] + cam_w)
        o = jnp.broadcast_to(self.eye, d.shape)
        return Ray(ori=o, dir=d)


@pytree_dataclass
class MatrixCamera:
    """Camera defined by view + proj matrices (sched_common.h:152-178)."""

    view: Any   # (4,4)
    proj: Any   # (4,4)

    @staticmethod
    def from_pinhole(cam: Pinhole) -> "MatrixCamera":
        return MatrixCamera(view=cam.view_matrix(), proj=cam.proj_matrix())

    def primary_rays(self, x, y, width, height, jitter=None) -> Ray:
        # f32 matmul precision is mandatory here: TPU dot defaults to
        # bf16 inputs, and both the 4x4 LU inverse and the clip->world
        # products are catastrophically ill-conditioned at bf16 for GL
        # projections (measured: every ray of the viewer-default camera
        # landed on the ground plane)
        with jax.default_matmul_precision("float32"):
            return self._primary_rays_f32(x, y, width, height, jitter)

    def _primary_rays_f32(self, x, y, width, height, jitter) -> Ray:
        inv_view = jnp.linalg.inv(self.view)
        inv_proj = jnp.linalg.inv(self.proj)
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        if jitter is not None:
            x = x + jitter[..., 0]
            y = y + jitter[..., 1]
        u = 2.0 * (x + 0.5) / width - 1.0
        v = 2.0 * (y + 0.5) / height - 1.0
        ones = jnp.ones_like(u)
        o_clip = jnp.stack([u, v, -ones, ones], axis=-1)
        d_clip = jnp.stack([u, v, ones, ones], axis=-1)
        m = inv_view @ inv_proj
        o_h = o_clip @ m.T
        d_h = d_clip @ m.T
        ori = o_h[..., :3] / o_h[..., 3:4]
        # Homogeneous difference for the direction: far/far_w - ori would
        # divide by the far point's w, which underflows in f32 for large
        # z_far/z_near ratios (the viewer default 0.001/1000 NaN'd every
        # ray); d*o_w - o*d_w is the same direction up to the positive
        # scale o_w*d_w, with no small-w division.
        dir_h = (d_h[..., :3] * o_h[..., 3:4]
                 - o_h[..., :3] * d_h[..., 3:4])
        # Sign of each factor separately: the product o_w*d_w can underflow
        # to 0 in f32 exactly in the tiny-w regime this path exists for,
        # and the ==0 fallback would then silently assume positive.
        sgn = jnp.sign(o_h[..., 3:4]) * jnp.sign(d_h[..., 3:4])
        sgn = jnp.where(sgn == 0, 1.0, sgn)
        return Ray(ori=ori, dir=normalize(dir_h * sgn))


def project(p, view, proj, viewport):
    """GL-style project (reference math/project.h:18-35).

    viewport = (x, y, w, h). Returns window coords (...,3) with z in [0,1].
    """
    with jax.default_matmul_precision("float32"):  # bf16 TPU dot is not
        m = proj @ view                            # enough here, see
        ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        clip = ph @ m.T                            # MatrixCamera note
    ndc = clip[..., :3] / clip[..., 3:4]
    x, y, w, h = viewport
    win = jnp.stack([
        x + w * (ndc[..., 0] + 1.0) * 0.5,
        y + h * (ndc[..., 1] + 1.0) * 0.5,
        (ndc[..., 2] + 1.0) * 0.5,
    ], axis=-1)
    return win


def unproject(win, view, proj, viewport):
    """GL-style unproject (reference math/project.h:37-55)."""
    x, y, w, h = viewport
    ndc = jnp.stack([
        (win[..., 0] - x) / w * 2.0 - 1.0,
        (win[..., 1] - y) / h * 2.0 - 1.0,
        win[..., 2] * 2.0 - 1.0,
    ], axis=-1)
    with jax.default_matmul_precision("float32"):
        inv = jnp.linalg.inv(proj @ view)
        ph = jnp.concatenate([ndc, jnp.ones_like(ndc[..., :1])], axis=-1)
        obj = ph @ inv.T
    return obj[..., :3] / obj[..., 3:4]
