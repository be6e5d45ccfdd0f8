"""Spectral power distributions and color conversion.

The reference's `spectrum<T>` stores either RGB (3 samples) or a sampled
SPD (300 samples over 400-700 nm) selected by VSNRAY_SPECTRUM_RGB
(spectrum.h:17,32-37).  Here a spectrum is just an array whose trailing
axis is the sample dim — RGB mode is the (..., 3) default used everywhere;
spectral mode uses (..., N) with the helpers below, and `to_rgb` folds it
back for display.  All conversions are jnp, vectorized, differentiable.

Parity map:
  cie_x/y/z            — multi-lobe gaussian fits of the CIE 1931 standard
                         observer (detail/color_conversion.h:28-57)
  xyz_to_rgb           — sRGB/D65 matrix (color_conversion.h:92-104)
  spd_to_rgb/luminance — integration against the fits
                         (color_conversion.h:110-151)
  from_rgb             — 3-bin box lift b/g/r -> 400/500/600 nm bands
                         (detail/spectrum.inl:331-361)
  blackbody            — Planck's law in spectral radiance per micron
                         (detail/spd/blackbody.h:26-37)
  d65 / cornell_*      — measured SPD tables (spd_data.py, public data)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from visionaray_tpu.shading import spd_data

NUM_SAMPLES = 300        # spectral mode sample count (spectrum.h:34)
LAMBDA_MIN = 400.0
LAMBDA_MAX = 700.0


def lambdas(n: int = NUM_SAMPLES):
    """Sample wavelengths (nm), inclusive endpoints like the reference."""
    return jnp.linspace(LAMBDA_MIN, LAMBDA_MAX, n)


# --- CIE 1931 standard observer (multi-lobe gaussian fits) ---------------

def cie_x(lam):
    lam = jnp.asarray(lam, jnp.float32)
    t1 = (lam - 442.0) * jnp.where(lam < 442.0, 0.0624, 0.0374)
    t2 = (lam - 599.8) * jnp.where(lam < 599.8, 0.0264, 0.0323)
    t3 = (lam - 501.1) * jnp.where(lam < 501.1, 0.0490, 0.0382)
    return (0.362 * jnp.exp(-0.5 * t1 * t1)
            + 1.056 * jnp.exp(-0.5 * t2 * t2)
            - 0.065 * jnp.exp(-0.5 * t3 * t3))


def cie_y(lam):
    lam = jnp.asarray(lam, jnp.float32)
    t1 = (lam - 568.8) * jnp.where(lam < 568.8, 0.0213, 0.0247)
    t2 = (lam - 530.9) * jnp.where(lam < 530.9, 0.0613, 0.0322)
    return 0.821 * jnp.exp(-0.5 * t1 * t1) + 0.286 * jnp.exp(-0.5 * t2 * t2)


def cie_z(lam):
    lam = jnp.asarray(lam, jnp.float32)
    t1 = (lam - 437.0) * jnp.where(lam < 437.0, 0.0845, 0.0278)
    t2 = (lam - 459.0) * jnp.where(lam < 459.0, 0.0385, 0.0725)
    return 1.217 * jnp.exp(-0.5 * t1 * t1) + 0.681 * jnp.exp(-0.5 * t2 * t2)


# --- XYZ <-> RGB (sRGB primaries, D65 white) ------------------------------

_XYZ_TO_RGB = jnp.asarray([
    [3.2404542, -1.5371385, -0.4985314],
    [-0.9692660, 1.8760108, 0.0415560],
    [0.0556434, -0.2040259, 1.0572252],
], jnp.float32)


def xyz_to_rgb(xyz):
    return xyz @ _XYZ_TO_RGB.T


def spd_to_rgb(samples, lam=None):
    """Integrate a sampled SPD (..., N) against the CIE fits -> (..., 3).

    Normalized by sum(cie_y) like the reference (color_conversion.h:131).
    """
    if lam is None:
        lam = lambdas(samples.shape[-1])
    x = jnp.sum(samples * cie_x(lam), axis=-1)
    y = jnp.sum(samples * cie_y(lam), axis=-1)
    z = jnp.sum(samples * cie_z(lam), axis=-1)
    n = jnp.sum(cie_y(lam))
    return xyz_to_rgb(jnp.stack([x, y, z], axis=-1) / n)


def spd_to_luminance(samples, lam=None):
    """Y integral (cd/m^2), unnormalized (color_conversion.h:145-151)."""
    if lam is None:
        lam = lambdas(samples.shape[-1])
    return jnp.sum(samples * cie_y(lam), axis=-1)


def to_rgb(samples):
    """RGB passthrough for 3 samples, CIE integration otherwise
    (detail/spectrum.inl to_rgb)."""
    if samples.shape[-1] == 3:
        return samples
    return spd_to_rgb(samples)


def to_luminance(samples):
    """Luminance; RGB mode uses the Rec.601 luma of the reference
    (spectrum.inl:391-397)."""
    if samples.shape[-1] == 3:
        w = jnp.asarray([0.3, 0.59, 0.11], jnp.float32)
        return jnp.sum(samples * w, axis=-1)
    return spd_to_luminance(samples)


def from_rgb(rgb, n: int = NUM_SAMPLES):
    """Lift RGB to a box spectrum: thirds of [400, 700] get b, g, r
    (detail/spectrum.inl:331-361).  rgb (..., 3) -> (..., n)."""
    if n == 3:
        return rgb
    i = jnp.arange(n)
    bin_ = (i * 3) // n              # 0, 1, 2
    # bin 0 -> blue, 1 -> green, 2 -> red
    src = jnp.where(bin_ == 0, 2, jnp.where(bin_ == 1, 1, 0))
    return jnp.take(rgb, src, axis=-1)


# --- SPDs ------------------------------------------------------------------

def lift_scene(scene, n: int = NUM_SAMPLES):
    """Switch a scene to spectral mode: every material and light color is
    lifted from RGB to an n-sample SPD (the VSNRAY_SPECTRUM_RGB toggle,
    spectrum.h:17).  Geometry/BVH/textures are untouched; the path tracer
    detects the channel count from materials.cd and folds the accumulated
    spectrum back through to_rgb for display.
    """
    import dataclasses
    import jax

    mats = scene.materials.to_spectral(n)

    def lift_lights(lights):
        if isinstance(lights, (tuple, list)):
            return type(lights)(lift_lights(l) for l in lights)
        if lights is None or getattr(lights, "num_lights", 0) == 0:
            return lights
        return dataclasses.replace(lights, cl=from_rgb(lights.cl, n))

    return dataclasses.replace(scene, materials=mats,
                               lights=lift_lights(scene.lights))


def blackbody(temperature, lam):
    """Planck spectral radiance (W/m^2/sr/micron), lambda in nm
    (detail/spd/blackbody.h:26-37)."""
    k = 1.3806488e-23
    h = 6.62606957e-34
    c = 2.99792458e8
    lam_um = jnp.asarray(lam, jnp.float32) * 1e-3
    return ((2.0e24 * h * c * c) / lam_um ** 5
            / (jnp.exp((1e6 * h * c) / (lam_um * k * temperature)) - 1.0))


def d65(lam):
    """CIE D65 daylight illuminant, normalized P(560)=1; 0 outside
    [300, 830) (detail/spd/d65.h)."""
    lam = jnp.asarray(lam, jnp.float32)
    tbl = jnp.asarray(spd_data.D65_TABLE, jnp.float32)
    x = (lam - spd_data.D65_LAMBDA_MIN) / spd_data.D65_LAMBDA_STEP
    v = jnp.interp(x, jnp.arange(len(spd_data.D65_TABLE), dtype=jnp.float32),
                   tbl)
    return jnp.where((lam < 300.0) | (lam >= 830.0), 0.0, v)


def _cornell(table, step, lam):
    lam = jnp.asarray(lam, jnp.float32)
    tbl = jnp.asarray(table, jnp.float32)
    x = (lam - spd_data.CORNELL_LAMBDA_MIN) / step
    v = jnp.interp(x, jnp.arange(len(table), dtype=jnp.float32), tbl)
    return jnp.where((lam < spd_data.CORNELL_LAMBDA_MIN)
                     | (lam >= spd_data.CORNELL_LAMBDA_MAX), 0.0, v)


def cornell_white(lam):
    return _cornell(spd_data.CORNELL_WHITE, 4.0, lam)


def cornell_green(lam):
    return _cornell(spd_data.CORNELL_GREEN, 4.0, lam)


def cornell_red(lam):
    return _cornell(spd_data.CORNELL_RED, 4.0, lam)


def cornell_light(lam):
    return _cornell(spd_data.CORNELL_LIGHT, 100.0, lam)
