"""Cubic texture filters: CardinalSpline, BSplineInterpol + prefilter.

Reference semantics: texture/forward.h:18-34 (filter mode list),
detail/filter/common.h:145-229 (weight functions), detail/prefilter.h
(B-spline coefficient transform run at upload for BSplineInterpol).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.shading.texture import (
    AddressMode, Filter, TextureAtlas, prefilter_bspline,
    sample_scene_texture, tex1d, tex2d, tex3d,
)


def _centers(n):
    """Normalized coords of texel centers."""
    return (np.arange(n, dtype=np.float32) + 0.5) / n


def test_cardinal_spline_interpolates_1d():
    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.uniform(size=(17, 2)).astype(np.float32))
    u = jnp.asarray(_centers(17))
    got = tex1d(tex, u, filter=Filter.CARDINAL_SPLINE,
                address_mode=AddressMode.CLAMP)
    np.testing.assert_allclose(got, tex, rtol=0, atol=1e-5)


def test_bspline_smooths_but_interpol_interpolates_1d():
    rng = np.random.default_rng(1)
    tex = jnp.asarray(rng.uniform(size=(33, 1)).astype(np.float32))
    u = jnp.asarray(_centers(33))
    smooth = tex1d(tex, u, filter=Filter.BSPLINE,
                   address_mode=AddressMode.CLAMP)
    assert float(jnp.max(jnp.abs(smooth - tex))) > 1e-3  # plain = blurred
    coeffs = prefilter_bspline(tex, ndim=1)
    interp = tex1d(coeffs, u, filter=Filter.BSPLINE_INTERPOL,
                   address_mode=AddressMode.CLAMP)
    # interior texels reproduced (boundary rows feel the IIR init approx)
    np.testing.assert_allclose(interp[3:-3], tex[3:-3], rtol=0, atol=2e-3)


def test_prefilter_satisfies_bspline_system():
    """(c[i-1] + 4 c[i] + c[i+1]) / 6 == original texel (interior)."""
    rng = np.random.default_rng(2)
    tex = rng.uniform(size=(40,)).astype(np.float32)
    c = np.asarray(prefilter_bspline(jnp.asarray(tex)[:, None], ndim=1))[:, 0]
    recon = (c[:-2] + 4.0 * c[1:-1] + c[2:]) / 6.0
    np.testing.assert_allclose(recon[3:-3], tex[1:-1][3:-3], atol=2e-3)


def test_cardinal_spline_interpolates_2d():
    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.uniform(size=(9, 11, 3)).astype(np.float32))
    uu, vv = np.meshgrid(_centers(11), _centers(9))
    got = tex2d(tex, jnp.asarray(uu), jnp.asarray(vv),
                filter=Filter.CARDINAL_SPLINE,
                address_mode=AddressMode.CLAMP)
    np.testing.assert_allclose(got, tex, rtol=0, atol=1e-4)


def test_bspline_interpol_2d():
    rng = np.random.default_rng(4)
    tex = jnp.asarray(rng.uniform(size=(16, 16, 1)).astype(np.float32))
    coeffs = prefilter_bspline(tex, ndim=2)
    uu, vv = np.meshgrid(_centers(16), _centers(16))
    got = tex2d(coeffs, jnp.asarray(uu), jnp.asarray(vv),
                filter=Filter.BSPLINE_INTERPOL,
                address_mode=AddressMode.CLAMP)
    np.testing.assert_allclose(got[4:-4, 4:-4], tex[4:-4, 4:-4], atol=5e-3)


def test_tex3d_cubic_smoke_and_interpolation():
    rng = np.random.default_rng(5)
    vol = jnp.asarray(rng.uniform(size=(8, 8, 8)).astype(np.float32))
    w = jnp.full((3,), 0.5 + 0.5 / 8)   # on-center slice
    u = jnp.asarray(_centers(8)[2:5])
    v = jnp.full((3,), 0.5 + 0.5 / 8)
    got = tex3d(vol, u, v, w, filter=Filter.CARDINAL_SPLINE,
                address_mode=AddressMode.CLAMP)
    want = vol[4, 4, 2:5]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_atlas_bspline_interpol_prefilters_at_pack():
    rng = np.random.default_rng(6)
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    atlas = TextureAtlas.pack({0: img}, num_materials=1, resolution=32,
                              filter=Filter.BSPLINE_INTERPOL,
                              address_mode=AddressMode.CLAMP)
    # coefficients differ from raw texels...
    assert float(jnp.max(jnp.abs(atlas.texels[0] - img))) > 1e-3
    # ...but sampling at centers reproduces the original image (interior)
    uu, vv = np.meshgrid(_centers(32), _centers(32))
    gid = jnp.zeros(uu.shape, jnp.int32)
    uv = jnp.stack([jnp.asarray(uu), jnp.asarray(vv)], axis=-1)
    got = sample_scene_texture(atlas, gid, uv)
    np.testing.assert_allclose(got[6:-6, 6:-6], img[6:-6, 6:-6], atol=5e-3)


def test_cubic_differentiable():
    tex = jnp.linspace(0.0, 1.0, 8)[:, None]
    coeffs = prefilter_bspline(tex, ndim=1)

    def f(c):
        return jnp.sum(tex1d(c, jnp.asarray([0.4, 0.6]),
                             filter=Filter.BSPLINE_INTERPOL,
                             address_mode=AddressMode.CLAMP))

    g = jax.grad(f)(coeffs)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0
