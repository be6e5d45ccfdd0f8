"""Ray/primitive intersection kernels.

Pure broadcasting jnp re-derivations of the reference's intersection math
(math/intersect.h): slab test for AABBs (:54-70), Moeller-Trumbore for
triangles (:124-179), stable quadratic for spheres (:188-221), and planes
(:230-260).  All functions broadcast ray components against primitive
components; callers arrange shapes (e.g. rays[:, None] x prims[None, :]).

Every function is differentiable w.r.t. both ray and primitive parameters;
masked lanes produce finite values so gradients stay NaN-free.
"""

from __future__ import annotations

import jax.numpy as jnp

from visionaray_tpu.core.vecmath import cross, dot


def intersect_aabb(ori, inv_dir, lo, hi):
    """Branchless slab test (reference math/intersect.h:54-70).

    Returns (tnear, tfar, hit) with hit = tfar >= tnear.  NOTE: like the
    reference, this does not clip against t >= 0; traversal applies
    `tfar >= 0 && tnear < best_t` (update_if.h:62-66).
    """
    t1 = (lo - ori) * inv_dir
    t2 = (hi - ori) * inv_dir
    tn = jnp.minimum(t1, t2)
    tf = jnp.maximum(t1, t2)
    tnear = jnp.max(tn, axis=-1)
    tfar = jnp.min(tf, axis=-1)
    return tnear, tfar, tfar >= tnear


def intersect_triangle(ori, dir, v1, e1, e2):
    """Moeller-Trumbore (reference math/intersect.h:124-179).

    Triangle in v1/e1/e2 form (v1 + e1 = v2, v1 + e2 = v3; math/triangle.h:33-36).
    Returns (t, u, v, hit).  Where !hit, t = -1 (matching the reference's
    initialization) and u/v are zeroed, keeping all lanes finite.
    """
    s1 = cross(dir, e2)
    div = dot(s1, e1)
    hit = div != 0.0
    inv_div = jnp.where(hit, 1.0 / jnp.where(hit, div, 1.0), 0.0)
    d = ori - v1
    b1 = dot(d, s1) * inv_div
    hit = hit & (b1 >= 0.0) & (b1 <= 1.0)
    s2 = cross(d, e1)
    b2 = dot(dir, s2) * inv_div
    hit = hit & (b2 >= 0.0) & (b1 + b2 <= 1.0)
    t = dot(e2, s2) * inv_div
    t = jnp.where(hit, t, -1.0)
    u = jnp.where(hit, b1, 0.0)
    v = jnp.where(hit, b2, 0.0)
    return t, u, v, hit


def intersect_sphere(ori, dir, center, radius):
    """Stable quadratic (reference math/intersect.h:188-221).

    Returns (t, hit) with t = min(t1, t2) where hit (the reference picks the
    smaller root even if negative; the is_closer predicate filters t < 0, so
    rays starting inside a sphere miss it — preserved quirk).
    """
    o = ori - center
    A = dot(dir, dir)
    B = 2.0 * dot(dir, o)
    C = dot(o, o) - radius * radius
    disc = B * B - 4.0 * A * C
    valid = disc >= 0.0
    root_disc = jnp.sqrt(jnp.where(valid, disc, 0.0))
    q = jnp.where(B < 0.0, -0.5 * (B - root_disc), -0.5 * (B + root_disc))
    # Guard divisions for masked lanes (q == 0 when B == 0 and disc == 0).
    safe_q = jnp.where(q != 0.0, q, 1.0)
    safe_A = jnp.where(A != 0.0, A, 1.0)
    t1 = q / safe_A
    t2 = C / safe_q
    t = jnp.where(valid, jnp.minimum(t1, t2), -1.0)
    return t, valid


def intersect_plane(ori, dir, normal, offset):
    """Ray/plane: dot(n, x) = offset (reference math/intersect.h:230-260).

    Returns (t, hit).
    """
    s = dot(normal, dir)
    hit = s != 0.0
    t = jnp.where(hit, (offset - dot(normal, ori)) / jnp.where(hit, s, 1.0), -1.0)
    return t, hit
