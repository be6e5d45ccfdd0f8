"""Light sources as SoA pytrees.

Point lights mirror the reference point_light<T> (point_light.h:19-44,
detail/point_light.inl): color cl, intensity scale kl, position, and
constant/linear/quadratic attenuation.  Spot and area lights arrive with the
breadth-parity milestone.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from visionaray_tpu.core.types import pytree_dataclass
from visionaray_tpu.core.vecmath import length


def light_groups(lights):
    """Normalize a lights field (single group / tuple / list) to a tuple."""
    if lights is None:
        return ()
    if isinstance(lights, (tuple, list)):
        return tuple(lights)
    return (lights,)


@pytree_dataclass
class PointLights:
    """Batch of point lights; all fields leading dim L."""

    position: Any   # (L, 3)
    cl: Any         # (L, 3)
    kl: Any         # (L,)
    attenuation: Any  # (L, 3) constant/linear/quadratic

    @staticmethod
    def create(position, cl=(1.0, 1.0, 1.0), kl=1.0, attenuation=(1.0, 0.0, 0.0)):
        position = jnp.asarray(position, jnp.float32).reshape(-1, 3)
        L = position.shape[0]
        cl = jnp.broadcast_to(jnp.asarray(cl, jnp.float32), (L, 3))
        kl = jnp.broadcast_to(jnp.asarray(kl, jnp.float32), (L,))
        attenuation = jnp.broadcast_to(
            jnp.asarray(attenuation, jnp.float32), (L, 3))
        return PointLights(position, cl, kl, attenuation)

    @staticmethod
    def none():
        z = jnp.zeros((0, 3), jnp.float32)
        return PointLights(z, z, jnp.zeros((0,), jnp.float32), z)

    @property
    def num_lights(self):
        return self.position.shape[0]

    def intensity(self, light_idx, pos):
        """cl*kl / (c + l*d + q*d^2) at shading point(s) ``pos``
        (reference detail/point_light.inl:12-28).

        ``light_idx`` scalar int; ``pos`` (..., 3).
        """
        p = self.position[light_idx]
        att = self.attenuation[light_idx]
        d = length(p - pos)
        denom = att[0] + att[1] * d + att[2] * d * d
        scale = self.kl[light_idx] / denom
        return self.cl[light_idx] * scale[..., None]

    def sample(self, light_idx, u1=None, u2=None):
        """Point lights sample their own position (point_light.inl:31-38)."""
        return self.position[light_idx]


@pytree_dataclass
class SpotLights:
    """Spot lights (reference spot_light.h:19-49, detail/spot_light.inl):

    intensity(pos) = cl*kl * attenuation * spot, where
    spot = dot(dir, normalize(pos - light_pos)) clamped by cos_cutoff and
    raised to spot_exponent.
    """

    position: Any     # (L, 3)
    cl: Any           # (L, 3)
    kl: Any           # (L,)
    attenuation: Any  # (L, 3)
    direction: Any    # (L, 3) normalized spot axis
    cos_cutoff: Any   # (L,)
    exponent: Any     # (L,)

    @staticmethod
    def create(position, direction, cutoff_deg=30.0, exponent=1.0,
               cl=(1.0, 1.0, 1.0), kl=1.0, attenuation=(1.0, 0.0, 0.0)):
        import numpy as np

        from visionaray_tpu.core.vecmath import normalize
        position = jnp.asarray(position, jnp.float32).reshape(-1, 3)
        L = position.shape[0]
        direction = normalize(
            jnp.asarray(direction, jnp.float32).reshape(-1, 3))
        direction = jnp.broadcast_to(direction, (L, 3))
        return SpotLights(
            position=position,
            cl=jnp.broadcast_to(jnp.asarray(cl, jnp.float32), (L, 3)),
            kl=jnp.broadcast_to(jnp.asarray(kl, jnp.float32), (L,)),
            attenuation=jnp.broadcast_to(
                jnp.asarray(attenuation, jnp.float32), (L, 3)),
            direction=direction,
            cos_cutoff=jnp.broadcast_to(
                jnp.float32(np.cos(np.deg2rad(cutoff_deg))), (L,)),
            exponent=jnp.broadcast_to(jnp.asarray(exponent, jnp.float32),
                                      (L,)),
        )

    @property
    def num_lights(self):
        return self.position.shape[0]

    def intensity(self, light_idx, pos):
        from visionaray_tpu.core.vecmath import dot as vdot, normalize
        p = self.position[light_idx]
        att = self.attenuation[light_idx]
        light_dir = p - pos
        d = length(light_dir)
        a = self.kl[light_idx] / (att[0] + att[1] * d + att[2] * d * d)
        spot = vdot(jnp.broadcast_to(self.direction[light_idx], pos.shape),
                    normalize(-light_dir))
        spot = jnp.where(spot > self.cos_cutoff[light_idx],
                         jnp.power(spot, self.exponent[light_idx]), 0.0)
        return self.cl[light_idx] * (a * spot)[..., None]

    def sample(self, light_idx, u1=None, u2=None):
        return self.position[light_idx]


@pytree_dataclass
class AreaLights:
    """Area lights over triangle geometry (reference area_light.h:17-41,
    detail/area_light.inl).

    The reference wraps a geometry and samples positions on it; here the
    geometry is a triangle per light in v1/e1/e2 form (a rectangle is two
    lights).  ``position`` (the centroid) keeps the point-light kernel
    interface working; ``sample`` draws uniform positions for soft shadows
    and next-event estimation.  All fields are differentiable leaves.
    """

    v1: Any         # (L, 3)
    e1: Any         # (L, 3)
    e2: Any         # (L, 3)
    cl: Any         # (L, 3)
    kl: Any         # (L,)

    @staticmethod
    def create(v1, e1, e2, cl=(1.0, 1.0, 1.0), kl=1.0):
        v1 = jnp.asarray(v1, jnp.float32).reshape(-1, 3)
        L = v1.shape[0]
        e1 = jnp.broadcast_to(jnp.asarray(e1, jnp.float32), (L, 3))
        e2 = jnp.broadcast_to(jnp.asarray(e2, jnp.float32), (L, 3))
        cl = jnp.broadcast_to(jnp.asarray(cl, jnp.float32), (L, 3))
        kl = jnp.broadcast_to(jnp.asarray(kl, jnp.float32), (L,))
        return AreaLights(v1, e1, e2, cl, kl)

    @staticmethod
    def rect(corner, edge1, edge2, cl=(1.0, 1.0, 1.0), kl=1.0):
        """A rectangle = two triangle lights."""
        c = jnp.asarray(corner, jnp.float32).reshape(3)
        a = jnp.asarray(edge1, jnp.float32).reshape(3)
        b = jnp.asarray(edge2, jnp.float32).reshape(3)
        v1 = jnp.stack([c, c + a + b])
        e1 = jnp.stack([a, -a])
        e2 = jnp.stack([b, -b])
        return AreaLights.create(v1, e1, e2, cl=cl, kl=kl)

    @property
    def num_lights(self):
        return self.v1.shape[0]

    @property
    def position(self):
        """Centroids — keeps the point-light kernel loop working."""
        return self.v1 + (self.e1 + self.e2) / 3.0

    def normal(self, light_idx):
        from visionaray_tpu.core.vecmath import cross, normalize
        return normalize(cross(self.e1[light_idx], self.e2[light_idx]))

    def area(self, light_idx):
        from visionaray_tpu.core.vecmath import cross
        return 0.5 * length(cross(self.e1[light_idx], self.e2[light_idx]))

    def intensity(self, light_idx, pos):
        """cl * kl (area lights carry no distance attenuation in the
        reference; the geometric 1/r^2 falls out of the estimator)."""
        scale = self.kl[light_idx]
        base = self.cl[light_idx] * scale
        return jnp.broadcast_to(base, pos.shape[:-1] + (3,))

    def sample(self, light_idx, u1=None, u2=None):
        """Uniform position on the triangle (area_light.inl sample_surface);
        u1/u2 (...,) uniforms; returns (..., 3)."""
        if u1 is None:
            return self.position[light_idx]
        su = jnp.sqrt(jnp.clip(u1, 0.0, 1.0))
        b1 = 1.0 - su
        b2 = u2 * su
        return (self.v1[light_idx]
                + b1[..., None] * self.e1[light_idx]
                + b2[..., None] * self.e2[light_idx])
