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
