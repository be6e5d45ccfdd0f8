"""Core pytree types: Ray, HitRecord, ResultRecord, AABB.

Design: everything is a frozen dataclass registered as a JAX pytree whose leaves
are SoA jnp arrays with arbitrary leading batch dimensions.  The reference's
scalar-vs-SIMD-packet template polymorphism (visionaray math/ray.h:16,
math/intersect.h:89-115) becomes rank polymorphism: the same function handles a
single ray or a (..., N) batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

# A large-but-finite sentinel matching numeric_limits<float>::max() used by the
# reference for "no hit yet" (math/intersect.h:39-44).
FLT_MAX = 3.4028235e38


def pytree_dataclass(cls=None, *, static: tuple = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    ``static`` names fields treated as metadata (not traced leaves).
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        fields = [f.name for f in dataclasses.fields(c)]
        data_fields = [f for f in fields if f not in static]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(static)
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj, **kwargs):
    """Functional field update for pytree dataclasses."""
    return dataclasses.replace(obj, **kwargs)


@pytree_dataclass
class Ray:
    """A ray (or batch of rays): origin + direction.

    Mirrors basic_ray<T> (reference math/ray.h:16).  ``ori``/``dir`` have shape
    (..., 3).
    """

    ori: Any
    dir: Any

    def at(self, t):
        return self.ori + self.dir * t[..., None]

    @property
    def batch_shape(self):
        return self.ori.shape[:-1]


@pytree_dataclass
class HitRecord:
    """Ray/primitive hit record (reference math/intersect.h:89-115).

    Fields have shape (...,) matching the ray batch. ``prim_id`` indexes the
    global primitive ordering of the scene (triangles, then spheres, then
    planes); ``geom_id`` is the material index.
    """

    hit: Any       # bool
    t: Any         # f32
    prim_id: Any   # i32
    geom_id: Any   # i32
    u: Any         # f32 barycentric
    v: Any         # f32 barycentric

    @staticmethod
    def none(batch_shape) -> "HitRecord":
        """The 'no hit' record: hit=False, t=FLT_MAX (intersect.h:95-102)."""
        return HitRecord(
            hit=jnp.zeros(batch_shape, jnp.bool_),
            t=jnp.full(batch_shape, FLT_MAX, jnp.float32),
            prim_id=jnp.zeros(batch_shape, jnp.int32),
            geom_id=jnp.zeros(batch_shape, jnp.int32),
            u=jnp.zeros(batch_shape, jnp.float32),
            v=jnp.zeros(batch_shape, jnp.float32),
        )

    def isect_pos(self, ray: Ray):
        return ray.at(self.t)


def is_closer(query: HitRecord, reference_t, max_t=None):
    """Validity + ordering predicate (reference update_if.h:50-57,75-80).

    query.hit && query.t >= 0 && query.t < reference_t [&& query.t < max_t]
    """
    closer = query.hit & (query.t >= 0.0) & (query.t < reference_t)
    if max_t is not None:
        closer = closer & (query.t < max_t)
    return closer


def update_if(dst: HitRecord, src: HitRecord, cond) -> HitRecord:
    """Masked hit-record update (reference update_if.h:29-38)."""
    sel = lambda a, b: jnp.where(cond, a, b)
    return HitRecord(
        hit=dst.hit | cond,
        t=sel(src.t, dst.t),
        prim_id=sel(src.prim_id, dst.prim_id),
        geom_id=sel(src.geom_id, dst.geom_id),
        u=sel(src.u, dst.u),
        v=sel(src.v, dst.v),
    )


@pytree_dataclass
class ResultRecord:
    """Per-pixel kernel result (reference result_record.h:19-43)."""

    color: Any      # (..., 4) RGBA
    hit: Any        # (...,) bool
    depth: Any      # (...,) f32 hit distance t (isect_pos recoverable from ray)


@pytree_dataclass
class AABB:
    """Axis-aligned bounding box (reference math/aabb.h:25). lo/hi: (..., 3)."""

    lo: Any
    hi: Any

    @staticmethod
    def empty(batch_shape=()):
        return AABB(
            lo=jnp.full(batch_shape + (3,), FLT_MAX, jnp.float32),
            hi=jnp.full(batch_shape + (3,), -FLT_MAX, jnp.float32),
        )

    def insert(self, other: "AABB") -> "AABB":
        return AABB(jnp.minimum(self.lo, other.lo), jnp.maximum(self.hi, other.hi))

    def center(self):
        return 0.5 * (self.lo + self.hi)

    def size(self):
        return self.hi - self.lo
