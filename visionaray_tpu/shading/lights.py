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
