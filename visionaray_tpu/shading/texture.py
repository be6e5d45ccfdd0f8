"""Texture subsystem: 1D/2D/3D sampling with address modes and filters.

Re-expresses the reference texture layer (include/visionaray/texture/:
texture.h:27-54, forward.h:18-34) as differentiable jnp gathers:

- address modes: Wrap, Mirror, Clamp, Border
- filters: Nearest, Linear (bi/tri-linear); CubicBSpline via 4-tap weights
- texel types: float or unorm8 arrays (converted on upload like the
  reference's texel conversion)

Textures of one scene are packed into a fixed-shape atlas (one array with a
leading texture index) so a batch of rays can gather from different textures
without dynamic shapes.
"""

from __future__ import annotations

from enum import IntEnum
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from visionaray_tpu.core.types import pytree_dataclass


class AddressMode(IntEnum):
    WRAP = 0
    MIRROR = 1
    CLAMP = 2
    BORDER = 3


class Filter(IntEnum):
    NEAREST = 0
    LINEAR = 1
    BSPLINE = 2
    # BSpline evaluated over PREFILTERED coefficients so the spline
    # interpolates the original texels (reference: forward.h:18-34
    # BSplineInterpol + detail/prefilter.h; prefilter_bspline() below)
    BSPLINE_INTERPOL = 3
    # Catmull-Rom cardinal spline (reference: detail/filter/common.h:188-229)
    CARDINAL_SPLINE = 4


_POLE = float(np.sqrt(3.0) - 2.0)       # cubic B-spline IIR pole
_LAMBDA = 6.0                            # gain (1-z)(1-1/z) for that pole


def _cubic_weights(t, kind: int):
    """4-tap weights at fractional position t in [0,1).

    BSPLINE/BSPLINE_INTERPOL: Mitchell-Netravali B=1,C=0 (uniform cubic
    B-spline, detail/filter/common.h:145-186).  CARDINAL_SPLINE:
    Catmull-Rom (B=0,C=0.5, common.h:188-229) — interpolating but not
    positive, so no prefilter pass is needed.
    """
    t2 = t * t
    t3 = t2 * t
    if kind == Filter.CARDINAL_SPLINE:
        return (-0.5 * t3 + t2 - 0.5 * t,
                1.5 * t3 - 2.5 * t2 + 1.0,
                -1.5 * t3 + 2.0 * t2 + 0.5 * t,
                0.5 * t3 - 0.5 * t2)
    return ((1 - t) ** 3 / 6.0,
            (3 * t3 - 6 * t2 + 4) / 6.0,
            (-3 * t3 + 3 * t2 + 3 * t + 1) / 6.0,
            t3 / 6.0)


def _prefilter_axis(c, axis: int):
    """Causal+anticausal IIR pass along `axis` (Unser's B-spline transform).

    Reference: texture/detail/prefilter.h (the Ruijters CUDA-prefilter
    variant: causal init by a 12-term horizon sum, anticausal init
    pole/(pole-1) * last).  The reference's horizon loop re-reads element
    0 before advancing (prefilter.h:41-46); this implements the standard
    recurrence c+(0) = sum_k pole^k c(k) instead.
    """
    c = jnp.moveaxis(c, axis, 0)
    n = c.shape[0]
    hor = min(12, n)
    zk = (_POLE ** np.arange(hor)).astype(np.float32)
    y0 = _LAMBDA * jnp.tensordot(jnp.asarray(zk), c[:hor], axes=(0, 0))

    def fwd(carry, x):
        y = _LAMBDA * x + _POLE * carry
        return y, y

    _, ys = jax.lax.scan(fwd, y0, c[1:])
    cp = jnp.concatenate([y0[None], ys], axis=0)

    last = (_POLE / (_POLE - 1.0)) * cp[-1]

    def bwd(carry, x):
        y = _POLE * (carry - x)
        return y, y

    _, ys2 = jax.lax.scan(bwd, last, cp[:-1][::-1])
    out = jnp.concatenate([last[None], ys2], axis=0)[::-1]
    return jnp.moveaxis(out, 0, axis)


def prefilter_bspline(texels, ndim: int | None = None):
    """Convert texels to B-spline coefficients for BSPLINE_INTERPOL.

    ``ndim``: number of leading spatial axes (default: all but a trailing
    channel axis if the last dim is small).  Run once at texture upload —
    the analogue of the reference's convert_to_bspline_coeffs pass over
    each row/column/slice (prefilter.h:96-204).
    """
    if ndim is None:
        ndim = texels.ndim - 1 if texels.shape[-1] <= 4 else texels.ndim
    out = jnp.asarray(texels, jnp.float32)
    for ax in range(ndim):
        out = _prefilter_axis(out, ax)
    return out


def _resolve_coord(x, size, mode: int):
    """Map unnormalized coord to texel index; returns (idx, in_bounds)."""
    if mode == AddressMode.WRAP:
        idx = jnp.mod(x, size)
        return idx, jnp.ones(x.shape, jnp.bool_)
    if mode == AddressMode.MIRROR:
        period = 2 * size
        m = jnp.mod(x, period)
        idx = jnp.where(m < size, m, period - 1 - m)
        return idx, jnp.ones(x.shape, jnp.bool_)
    if mode == AddressMode.CLAMP:
        return jnp.clip(x, 0, size - 1), jnp.ones(x.shape, jnp.bool_)
    # BORDER
    inb = (x >= 0) & (x < size)
    return jnp.clip(x, 0, size - 1), inb


def tex2d(texels, u, v, filter: int = Filter.LINEAR,
          address_mode: int = AddressMode.WRAP, border_value=0.0):
    """Sample a (H, W, C) texture at normalized (u, v) — tex2D analogue.

    v=0 is row 0.  Differentiable w.r.t. texels (and u/v for LINEAR).
    """
    H, W = texels.shape[0], texels.shape[1]
    x = u * W - 0.5
    y = v * H - 0.5

    if filter == Filter.NEAREST:
        xi = jnp.floor(x + 0.5).astype(jnp.int32)
        yi = jnp.floor(y + 0.5).astype(jnp.int32)
        xi, bx = _resolve_coord(xi, W, address_mode)
        yi, by = _resolve_coord(yi, H, address_mode)
        val = texels[yi, xi]
        inb = (bx & by)[..., None]
        return jnp.where(inb, val, border_value)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def fetch(xi, yi):
        xi2, bx = _resolve_coord(xi, W, address_mode)
        yi2, by = _resolve_coord(yi, H, address_mode)
        val = texels[yi2, xi2]
        return jnp.where((bx & by)[..., None], val, border_value)

    if filter == Filter.LINEAR:
        c00 = fetch(x0, y0)
        c10 = fetch(x0 + 1, y0)
        c01 = fetch(x0, y0 + 1)
        c11 = fetch(x0 + 1, y0 + 1)
        return ((1 - fx) * (1 - fy) * c00 + fx * (1 - fy) * c10
                + (1 - fx) * fy * c01 + fx * fy * c11)

    # Cubic 4x4 taps (texture/detail/filter/cubic.h); B-spline or
    # Catmull-Rom weights per the filter mode
    wx = _cubic_weights(fx, filter)
    wy = _cubic_weights(fy, filter)
    out = 0.0
    for j in range(4):
        row = 0.0
        for i in range(4):
            row = row + wx[i] * fetch(x0 - 1 + i, y0 - 1 + j)
        out = out + wy[j] * row
    return out


def tex1d(texels, u, filter: int = Filter.LINEAR,
          address_mode: int = AddressMode.CLAMP, border_value=0.0):
    """Sample a (N, C) 1D texture (transfer functions etc.)."""
    N = texels.shape[0]
    x = u * N - 0.5
    if filter == Filter.NEAREST:
        xi = jnp.floor(x + 0.5).astype(jnp.int32)
        xi, bx = _resolve_coord(xi, N, address_mode)
        return jnp.where(bx[..., None], texels[xi], border_value)
    x0 = jnp.floor(x).astype(jnp.int32)
    fx = (x - x0)[..., None]

    def fetch(xi):
        xi2, b = _resolve_coord(xi, N, address_mode)
        return jnp.where(b[..., None], texels[xi2], border_value)

    if filter == Filter.LINEAR:
        return (1 - fx) * fetch(x0) + fx * fetch(x0 + 1)
    w = _cubic_weights(fx, filter)
    out = 0.0
    for i in range(4):
        out = out + w[i] * fetch(x0 - 1 + i)
    return out


def tex3d(texels, u, v, w, filter: int = Filter.LINEAR,
          address_mode: int = AddressMode.CLAMP, border_value=0.0):
    """Sample a (D, H, W) or (D, H, W, C) volume — tex3D analogue."""
    squeeze = texels.ndim == 3
    if squeeze:
        texels = texels[..., None]
    D, H, W = texels.shape[:3]
    x = u * W - 0.5
    y = v * H - 0.5
    z = w * D - 0.5

    def fetch(xi, yi, zi):
        xi2, bx = _resolve_coord(xi, W, address_mode)
        yi2, by = _resolve_coord(yi, H, address_mode)
        zi2, bz = _resolve_coord(zi, D, address_mode)
        val = texels[zi2, yi2, xi2]
        return jnp.where((bx & by & bz)[..., None], val, border_value)

    if filter == Filter.NEAREST:
        out = fetch(jnp.floor(x + 0.5).astype(jnp.int32),
                    jnp.floor(y + 0.5).astype(jnp.int32),
                    jnp.floor(z + 0.5).astype(jnp.int32))
    elif filter == Filter.LINEAR:
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        z0 = jnp.floor(z).astype(jnp.int32)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        fz = (z - z0)[..., None]
        out = 0.0
        for dz in (0, 1):
            wz = fz if dz else (1 - fz)
            for dy in (0, 1):
                wy = fy if dy else (1 - fy)
                for dx in (0, 1):
                    wx = fx if dx else (1 - fx)
                    out = out + wx * wy * wz * fetch(x0 + dx, y0 + dy, z0 + dz)
    else:
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        z0 = jnp.floor(z).astype(jnp.int32)
        wx = _cubic_weights((x - x0)[..., None], filter)
        wy = _cubic_weights((y - y0)[..., None], filter)
        wz = _cubic_weights((z - z0)[..., None], filter)
        out = 0.0
        for k in range(4):
            plane = 0.0
            for j in range(4):
                row = 0.0
                for i in range(4):
                    row = row + wx[i] * fetch(x0 - 1 + i, y0 - 1 + j,
                                              z0 - 1 + k)
                plane = plane + wy[j] * row
            out = out + wz[k] * plane
    return out[..., 0] if squeeze else out


@pytree_dataclass(static=("filter", "address_mode"))
class TextureAtlas:
    """Per-material 2D textures packed into one (M, H, W, 3) array.

    ``enabled`` masks materials without a texture (sample returns white,
    matching get_surface's no-texture behavior).
    """

    texels: Any    # (M, H, W, 3) f32
    enabled: Any   # (M,) bool
    filter: int = int(Filter.LINEAR)
    address_mode: int = int(AddressMode.WRAP)

    @staticmethod
    def pack(images, num_materials: int, resolution: int = 256,
             filter: int = Filter.LINEAR,
             address_mode: int = AddressMode.WRAP) -> "TextureAtlas":
        """images: dict {material_index: (H, W, 3) float array}."""
        tex = np.ones((num_materials, resolution, resolution, 3), np.float32)
        enabled = np.zeros((num_materials,), bool)
        for gid, img in images.items():
            img = np.asarray(img, np.float32)
            if img.shape[:2] != (resolution, resolution):
                # nearest-resize to the atlas resolution
                ys = (np.arange(resolution) * img.shape[0]
                      // resolution).astype(int)
                xs = (np.arange(resolution) * img.shape[1]
                      // resolution).astype(int)
                img = img[ys][:, xs]
            tex[gid] = img[..., :3]
            enabled[gid] = True
        texels = jnp.asarray(tex)
        if int(filter) == int(Filter.BSPLINE_INTERPOL):
            # prefilter at upload, like the reference's texture::reset()
            # running convert_to_bspline_coeffs when the filter mode is
            # BSplineInterpol (detail/prefilter.h:96-204)
            texels = jax.vmap(lambda t: prefilter_bspline(t, ndim=2))(texels)
        return TextureAtlas(texels=texels,
                            enabled=jnp.asarray(enabled),
                            filter=int(filter),
                            address_mode=int(address_mode))


def sample_scene_texture(atlas: TextureAtlas, geom_id, uv):
    """Per-ray textured color: gather each ray's material texture and sample."""
    M, H, W, _ = atlas.texels.shape
    gid = jnp.clip(geom_id, 0, M - 1)
    u, v = uv[..., 0], uv[..., 1]
    # flatten the atlas to (M*H, W, 3) and offset v by texture index so a
    # single gather path serves all rays (WRAP resolved per-texture first)
    x = u * W - 0.5
    y = v * H - 0.5
    if atlas.filter == Filter.NEAREST:
        xi, bx = _resolve_coord(jnp.floor(x + 0.5).astype(jnp.int32), W,
                                atlas.address_mode)
        yi, by = _resolve_coord(jnp.floor(y + 0.5).astype(jnp.int32), H,
                                atlas.address_mode)
        # BORDER taps outside [0, size) read the border value (0, like
        # tex2d) rather than silently clamping — the two tiers must agree
        val = jnp.where((bx & by)[..., None],
                        atlas.texels[gid, yi, xi], 0.0)
    else:
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]

        def fetch(xi, yi):
            xi2, bx = _resolve_coord(xi, W, atlas.address_mode)
            yi2, by = _resolve_coord(yi, H, atlas.address_mode)
            return jnp.where((bx & by)[..., None],
                             atlas.texels[gid, yi2, xi2], 0.0)

        if atlas.filter == Filter.LINEAR:
            val = ((1 - fx) * (1 - fy) * fetch(x0, y0)
                   + fx * (1 - fy) * fetch(x0 + 1, y0)
                   + (1 - fx) * fy * fetch(x0, y0 + 1)
                   + fx * fy * fetch(x0 + 1, y0 + 1))
        else:
            wx = _cubic_weights(fx, atlas.filter)
            wy = _cubic_weights(fy, atlas.filter)
            val = 0.0
            for j in range(4):
                row = 0.0
                for i in range(4):
                    row = row + wx[i] * fetch(x0 - 1 + i, y0 - 1 + j)
                val = val + wy[j] * row
    return jnp.where(atlas.enabled[gid][..., None], val,
                     jnp.ones_like(val))
