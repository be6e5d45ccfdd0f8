"""Quaternion math for camera manipulators.

Semantics mirror the reference's ``math/quaternion.h`` /
``math/detail/quaternion.inl``:

- storage order (w, x, y, z) (quaternion.h:24-27)
- ``rotation(from, to) = (dot(nf, nt), cross(nf, nt))``
  (detail/quaternion.inl:44-51) — the classic Shoemake arcball
  construction; note it encodes *twice* the angle between the vectors,
  which is exactly what arcball dragging wants (path independence).
- ``rotation(axis, angle)`` half-angle form (detail/quaternion.inl:116-123)
- ``rotation(q)`` -> 4x4 rotation matrix (detail/quaternion.inl:125-159)

Quaternions here are plain ``(..., 4)`` jnp arrays so they compose with
jit/vmap like every other math type in this package.
"""

from __future__ import annotations

import jax.numpy as jnp

from visionaray_tpu.core.vecmath import cross, dot, normalize


def quat(w, x, y, z):
    return jnp.stack([jnp.asarray(w, jnp.float32),
                      jnp.asarray(x, jnp.float32),
                      jnp.asarray(y, jnp.float32),
                      jnp.asarray(z, jnp.float32)], axis=-1)


def identity():
    """quat::identity() (detail/quaternion.inl:36-39)."""
    return jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)


def from_wxyz(w, v):
    """Build from scalar part + (..., 3) vector part."""
    return jnp.concatenate(
        [jnp.asarray(w, jnp.float32)[..., None], jnp.asarray(v, jnp.float32)],
        axis=-1)


def rotation_from_to(src, dst):
    """Great-circle rotation taking ``src`` toward ``dst``.

    Reference quaternion::rotation(from, to), detail/quaternion.inl:44-51.
    NOTE: mirrors the reference exactly — the result rotates by twice the
    angle between the vectors (arcball convention) and is unit-norm.
    """
    nf = normalize(jnp.asarray(src, jnp.float32))
    nt = normalize(jnp.asarray(dst, jnp.float32))
    return from_wxyz(dot(nf, nt), cross(nf, nt))


def rotation_axis_angle(axis, angle):
    """Half-angle quaternion (detail/quaternion.inl:116-123)."""
    axis = jnp.asarray(axis, jnp.float32)
    angle = jnp.asarray(angle, jnp.float32)
    s = jnp.sin(0.5 * angle) / jnp.linalg.norm(axis, axis=-1)
    c = jnp.cos(0.5 * angle)
    return from_wxyz(c, s[..., None] * axis)


def mul(p, q):
    """Hamilton product p*q (detail/quaternion.inl:64-73)."""
    pw, px, py, pz = (p[..., i] for i in range(4))
    qw, qx, qy, qz = (q[..., i] for i in range(4))
    return quat(
        pw * qw - px * qx - py * qy - pz * qz,
        pw * qx + px * qw + py * qz - pz * qy,
        pw * qy - px * qz + py * qw + pz * qx,
        pw * qz + px * qy - py * qx + pz * qw)


def conjugate(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], jnp.float32)


def norm(q):
    return jnp.linalg.norm(q, axis=-1)


def normalize_quat(q):
    return q / jnp.maximum(norm(q)[..., None], 1e-20)


def rotation_angle(q):
    """2*acos(w) (detail/quaternion.inl:161-166)."""
    return 2.0 * jnp.arccos(jnp.clip(q[..., 0], -1.0, 1.0))


def rotation_axis(q):
    """normalize(xyz) (detail/quaternion.inl:168-172)."""
    return normalize(q[..., 1:])


def to_matrix4(q):
    """Unit quaternion -> 4x4 rotation matrix (detail/quaternion.inl:125-159).

    Matches the reference element-for-element (2*(ww+xx)-1 diagonal form):
    ``m[i, j] == result(i, j)``, applied as ``m @ v`` to column vectors —
    the same convention as ``Pinhole.view_matrix``.
    """
    w, x, y, z = (q[..., i] for i in range(4))
    xx, xy, xz, xw = x * x, x * y, x * z, x * w
    yy, yz, yw = y * y, y * z, y * w
    zz, zw = z * z, z * w
    ww = w * w
    r0 = jnp.stack([2 * (ww + xx) - 1, 2 * (xy - zw), 2 * (xz + yw)], -1)
    r1 = jnp.stack([2 * (xy + zw), 2 * (ww + yy) - 1, 2 * (yz - xw)], -1)
    r2 = jnp.stack([2 * (xz - yw), 2 * (yz + xw), 2 * (ww + zz) - 1], -1)
    m = jnp.zeros(q.shape[:-1] + (4, 4), jnp.float32)
    m = m.at[..., 0, :3].set(r0)
    m = m.at[..., 1, :3].set(r1)
    m = m.at[..., 2, :3].set(r2)
    m = m.at[..., 3, 3].set(1.0)
    return m


def rotate_vec(q, v):
    """Rotate a (..., 3) vector by unit quaternion q."""
    u = q[..., 1:]
    w = q[..., 0:1]
    t = 2.0 * cross(u, v)
    return v + w * t + cross(u, t)
