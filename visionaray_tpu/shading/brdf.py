"""BRDFs: lambertian, phong, blinn, specular reflection + fresnel.

jnp re-derivations of the reference BRDF layer (brdf.h:21-212, fresnel.h).
All functions are batched over rays: parameters are per-ray gathered material
fields of shape (..., 3) / (...,), directions are (..., 3).

Sampling functions take explicit uniform random numbers (u1, u2) instead of a
stateful sampler, so that callers control the RNG stream (counter-based
threefry/PCG keyed by pixel id; see ops/sampling.py) and the functions stay
pure/differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

from visionaray_tpu.core.vecmath import (
    cross, dot, normalize, orthonormal_basis, reflect, saturate,
)

INV_PI = 1.0 / jnp.pi
TWO_PI = 2.0 * jnp.pi


def cosine_sample_hemisphere(u1, u2):
    """reference sampling.h:63-71: r=sqrt(u1); theta=2*pi*u2; z=sqrt(1-u1)."""
    r = jnp.sqrt(u1)
    theta = TWO_PI * u2
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    return jnp.stack([x, y, z], axis=-1)


def uniform_sample_hemisphere(u1, u2):
    """reference sampling.h:54-60."""
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1 * u1))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), u1], axis=-1)


def fresnel_reflectance_conductor(eta, k, cosi):
    """Conductor Fresnel (reference fresnel.h:17-35). eta/k: (...,3), cosi: (...)."""
    cosi = cosi[..., None]
    e2k2 = eta * eta + k * k
    rs2 = (e2k2 - 2.0 * eta * cosi + cosi * cosi) / \
          (e2k2 + 2.0 * eta * cosi + cosi * cosi)
    rp2 = (e2k2 * cosi * cosi - 2.0 * eta * cosi + 1.0) / \
          (e2k2 * cosi * cosi + 2.0 * eta * cosi + 1.0)
    return (rs2 + rp2) / 2.0


def fresnel_reflectance_dielectric(eta, cosi, cost):
    """Dielectric Fresnel (reference fresnel.h dielectric overload semantics)."""
    rparl = (eta * cosi - cost) / (eta * cosi + cost)
    rperp = (cosi - eta * cost) / (cosi + eta * cost)
    return (rparl * rparl + rperp * rperp) / 2.0


# -----------------------------------------------------------------------------
# lambertian (brdf.h:21-63)

def lambertian_f(cd, kd):
    """f = cd * kd / pi  (constant; directions unused)."""
    return cd * (kd * INV_PI)[..., None]


def lambertian_sample_f(cd, kd, n, wo, u1, u2):
    """Cosine-hemisphere sample about n (brdf.h:44-62).

    Returns (f, wi, pdf).
    """
    u, v = orthonormal_basis(n)
    sp = cosine_sample_hemisphere(u1, u2)
    wi = normalize(sp[..., 0:1] * u + sp[..., 1:2] * v + sp[..., 2:3] * n)
    pdf = dot(n, wi) * INV_PI
    return lambertian_f(cd, kd), wi, pdf


# -----------------------------------------------------------------------------
# phong (brdf.h:71-93)

def phong_f(cs, ks, exp, n, wo, wi):
    r = reflect(wo, n)
    rdotl = jnp.maximum(0.0, dot(r, wi))
    scale = ks * ((exp + 2.0) / TWO_PI) * jnp.power(rdotl, exp)
    return cs * scale[..., None]


# -----------------------------------------------------------------------------
# blinn (brdf.h:101-155)

def blinn_f(cs, ks, exp, n, wo, wi):
    h = normalize(wo + wi)
    hdotn = jnp.maximum(0.0, dot(h, n))
    spec = cs * ks[..., None]
    schlick = spec + (1.0 - spec) * \
        jnp.power(1.0 - saturate(dot(wi, h)), 5.0)[..., None]
    nfactor = (exp + 2.0) / (8.0 * jnp.pi)
    return schlick * (nfactor * jnp.power(hdotn, exp))[..., None]


def blinn_sample_f(cs, ks, exp, n, wo, u1, u2):
    """Power-cosine half-vector sampling (brdf.h:128-155). Returns (f, wi, pdf)."""
    costheta = jnp.power(u1, 1.0 / (exp + 1.0))
    sintheta = jnp.sqrt(jnp.maximum(0.0, 1.0 - costheta * costheta))
    phi = u2 * TWO_PI
    u, v = orthonormal_basis(n)
    h = normalize(
        (sintheta * jnp.cos(phi))[..., None] * u
        + (sintheta * jnp.sin(phi))[..., None] * v
        + costheta[..., None] * n
    )
    wi = reflect(wo, h)
    vdoth = dot(wo, h)
    pdf = ((exp + 1.0) * jnp.power(costheta, exp)) / \
          (2.0 * jnp.pi * 4.0 * jnp.where(vdoth != 0.0, vdoth, 1.0))
    pdf = jnp.where(vdoth != 0.0, pdf, 0.0)
    return blinn_f(cs, ks, exp, n, wo, wi), wi, pdf


# -----------------------------------------------------------------------------
# specular_reflection (brdf.h:163-212)

def specular_reflection_sample_f(cr, kr, ior, absorption, n, wo):
    """Perfect mirror (brdf.h:188-209). Returns (f, wi, pdf=1)."""
    wi = reflect(wo, n)
    pdf = jnp.ones(wo.shape[:-1], wo.dtype)
    fr = fresnel_reflectance_conductor(ior, absorption, jnp.abs(dot(n, wo)))
    ndotwi = jnp.abs(dot(n, wi))
    safe = jnp.where(ndotwi != 0.0, ndotwi, 1.0)
    f = fr * cr * kr[..., None] / safe[..., None]
    return f, wi, pdf
