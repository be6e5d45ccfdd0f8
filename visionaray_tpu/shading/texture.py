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

    # Cubic B-spline: 4x4 taps with B-spline weights (texture/detail/filter)
    def w(t):
        t2 = t * t
        t3 = t2 * t
        return ((1 - t) ** 3 / 6.0, (3 * t3 - 6 * t2 + 4) / 6.0,
                (-3 * t3 + 3 * t2 + 3 * t + 1) / 6.0, t3 / 6.0)

    wx = w(fx)
    wy = w(fy)
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
    xi0, b0 = _resolve_coord(x0, N, address_mode)
    xi1, b1 = _resolve_coord(x0 + 1, N, address_mode)
    c0 = jnp.where(b0[..., None], texels[xi0], border_value)
    c1 = jnp.where(b1[..., None], texels[xi1], border_value)
    return (1 - fx) * c0 + fx * c1


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
    else:
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
        return TextureAtlas(texels=jnp.asarray(tex),
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
        xi, _ = _resolve_coord(jnp.floor(x + 0.5).astype(jnp.int32), W,
                               atlas.address_mode)
        yi, _ = _resolve_coord(jnp.floor(y + 0.5).astype(jnp.int32), H,
                               atlas.address_mode)
        val = atlas.texels[gid, yi, xi]
    else:
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]

        def fetch(xi, yi):
            xi2, _ = _resolve_coord(xi, W, atlas.address_mode)
            yi2, _ = _resolve_coord(yi, H, atlas.address_mode)
            return atlas.texels[gid, yi2, xi2]

        val = ((1 - fx) * (1 - fy) * fetch(x0, y0)
               + fx * (1 - fy) * fetch(x0 + 1, y0)
               + (1 - fx) * fy * fetch(x0, y0 + 1)
               + fx * fy * fetch(x0 + 1, y0 + 1))
    return jnp.where(atlas.enabled[gid][..., None], val,
                     jnp.ones_like(val))
