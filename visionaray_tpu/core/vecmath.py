"""Vector math over (..., 3) jnp arrays.

The reference's vector<3,T> operations (math/detail/vector.inl) re-expressed as
broadcasting jnp functions; T's scalar-vs-packet polymorphism becomes leading
batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(dot(v, v))


def normalize(v):
    """Exact reference semantics: v * rsqrt(dot(v, v)); 0-vector -> inf/nan."""
    return v * jax.lax.rsqrt(dot(v, v))[..., None]


def safe_normalize(v, eps=1e-20):
    return v * jax.lax.rsqrt(jnp.maximum(dot(v, v), eps))[..., None]


def reflect(i, n):
    """reflect(i, n) = 2*dot(n,i)*n - i  (reference math/detail/vector.inl:685-688).

    NOTE: unlike GLSL, ``i`` points AWAY from the surface (e.g. the view dir).
    """
    return 2.0 * dot(n, i)[..., None] * n - i


def refract(i, n, eta):
    """Refraction of ``i`` (pointing away from surface) about n with ratio eta."""
    cosi = dot(n, i)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tdir = (eta * cosi - jnp.sqrt(jnp.maximum(k, 0.0)))[..., None] * n - eta * i
    return jnp.where((k < 0.0)[..., None], jnp.zeros_like(i), tdir)


def faceforward(n, i, nref):
    """select(dot(nref, i) < 0, -n, n)  (reference math/detail/vector.inl:674-681)."""
    return jnp.where((dot(nref, i) < 0.0)[..., None], -n, n)


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def vec3(x, y, z, dtype=jnp.float32):
    return jnp.array([x, y, z], dtype=dtype)


def vec4(x, y, z, w, dtype=jnp.float32):
    return jnp.array([x, y, z, w], dtype=dtype)


def orthonormal_basis(w):
    """Build (u, v) completing w to an ONB, matching the reference's BRDF
    sampling frame (brdf.h:47-53):

        v = |w.x|>|w.y| ? normalize((-w.z, 0, w.x)) : normalize((0, w.z, -w.y))
        u = cross(v, w)
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    v1 = jnp.stack([-wz, zeros, wx], axis=-1)
    v2 = jnp.stack([zeros, wz, -wy], axis=-1)
    v = jnp.where((jnp.abs(wx) > jnp.abs(wy))[..., None], v1, v2)
    v = normalize(v)
    u = cross(v, w)
    return u, v


def transform_point(m, p):
    """Apply 4x4 matrix to point(s) with perspective divide. m: (4,4), p: (...,3)."""
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    r = ph @ m.T
    return r[..., :3] / r[..., 3:4]


def transform_vector(m, v):
    """Apply the linear part of a 4x4 matrix to vector(s)."""
    return v @ m[:3, :3].T
