"""Spectral color subsystem (reference spectrum.h + detail/spd/*)."""

import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.shading import spectrum as sp


def test_cie_fit_peaks():
    # the standard observer peaks: x ~ 600, y ~ 555, z ~ 445
    lam = jnp.linspace(380.0, 720.0, 1000)
    assert abs(float(lam[jnp.argmax(sp.cie_x(lam))]) - 599.8) < 8
    assert abs(float(lam[jnp.argmax(sp.cie_y(lam))]) - 556.0) < 15
    assert abs(float(lam[jnp.argmax(sp.cie_z(lam))]) - 446.0) < 10


def test_rgb_spectrum_roundtrip():
    # lifting an RGB color to a box spectrum and integrating back must
    # approximately preserve hue ordering
    red = sp.from_rgb(jnp.asarray([1.0, 0.0, 0.0]))
    green = sp.from_rgb(jnp.asarray([0.0, 1.0, 0.0]))
    blue = sp.from_rgb(jnp.asarray([0.0, 0.0, 1.0]))
    assert red.shape == (sp.NUM_SAMPLES,)
    r = sp.to_rgb(red)
    g = sp.to_rgb(green)
    b = sp.to_rgb(blue)
    assert jnp.argmax(r) == 0 and jnp.argmax(g) == 1 and jnp.argmax(b) == 2


def test_rgb_mode_passthrough():
    c = jnp.asarray([0.2, 0.5, 0.7])
    assert jnp.allclose(sp.to_rgb(c), c)
    assert jnp.allclose(sp.from_rgb(c, n=3), c)
    # Rec.601 luma (spectrum.inl RGB to_luminance)
    assert float(sp.to_luminance(c)) == pytest.approx(
        0.3 * 0.2 + 0.59 * 0.5 + 0.11 * 0.7, rel=1e-5)


def test_blackbody_wien():
    # Wien's law: peak wavelength = 2.898e6 / T nm
    for T in (3000.0, 5000.0, 6500.0):
        lam = jnp.linspace(200.0, 2000.0, 4000)
        peak = float(lam[jnp.argmax(sp.blackbody(T, lam))])
        assert abs(peak - 2.898e6 / T) < 15


def test_d65():
    assert float(sp.d65(560.0)) == pytest.approx(1.0, abs=1e-3)
    assert float(sp.d65(250.0)) == 0.0
    assert float(sp.d65(900.0)) == 0.0
    # blue-heavy daylight: more power at 460 than 700
    assert float(sp.d65(460.0)) > float(sp.d65(700.0))


def test_cornell_spds():
    # white wall reflectance is high and flat; red reflects long lambdas
    assert float(sp.cornell_white(550.0)) > 0.6
    assert float(sp.cornell_red(650.0)) > 3 * float(sp.cornell_red(500.0))
    assert float(sp.cornell_green(530.0)) > float(sp.cornell_green(650.0))
    # light SPD rises toward 700 (measurement table 0/8/15.6/18.4)
    assert float(sp.cornell_light(690.0)) > float(sp.cornell_light(450.0))
    # zero outside the measured band
    assert float(sp.cornell_white(380.0)) == 0.0


def test_spectral_render_consistency():
    # rendering in spectral mode then converting to RGB must roughly match
    # the RGB-mode product for flat reflectance under flat illumination
    albedo_rgb = jnp.asarray([0.7, 0.7, 0.7])
    light_rgb = jnp.asarray([1.0, 1.0, 1.0])
    # RGB mode
    out_rgb = albedo_rgb * light_rgb
    # spectral mode: multiply SPDs, integrate
    s = sp.from_rgb(albedo_rgb) * sp.from_rgb(light_rgb)
    out_spd = sp.to_rgb(s)
    assert jnp.allclose(out_spd, out_rgb, atol=0.15)
