"""Pixel formats and format-converting store/blend.

The reference enumerates pixel formats (pixel_format.h:17-60, runtime info
in src/visionaray/pixel_format.cpp) and routes every framebuffer write
through format-templated `pixel_access::store/blend` conversions
(detail/pixel_access.h:40+, 2.2 kLoC of template instantiations).  Here a
format is a small descriptor and conversion is one vectorized function —
the internal framebuffer is always linear (…, C) float32 and conversion
happens at the edges (store into a typed target, blend for progressive
accumulation), which is the TPU-friendly arrangement.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from visionaray_tpu.core.norm import (
    float_to_snorm, float_to_unorm, snorm_to_float, unorm_to_float,
)


@dataclasses.dataclass(frozen=True)
class PixelFormatInfo:
    """Runtime format info (pixel_format.cpp's table analogue)."""

    name: str
    components: int
    dtype: type            # numpy storage dtype
    kind: str              # "unorm" | "snorm" | "float" | "uint"
    bits_per_component: int

    @property
    def size_bytes(self) -> int:
        return self.components * self.bits_per_component // 8


PIXEL_FORMATS: Dict[str, PixelFormatInfo] = {
    "R8": PixelFormatInfo("R8", 1, np.uint8, "unorm", 8),
    "RG8": PixelFormatInfo("RG8", 2, np.uint8, "unorm", 8),
    "RGB8": PixelFormatInfo("RGB8", 3, np.uint8, "unorm", 8),
    "RGBA8": PixelFormatInfo("RGBA8", 4, np.uint8, "unorm", 8),
    "R16F": PixelFormatInfo("R16F", 1, np.float16, "float", 16),
    "RGB16F": PixelFormatInfo("RGB16F", 3, np.float16, "float", 16),
    "RGBA16F": PixelFormatInfo("RGBA16F", 4, np.float16, "float", 16),
    "R32F": PixelFormatInfo("R32F", 1, np.float32, "float", 32),
    "RGB32F": PixelFormatInfo("RGB32F", 3, np.float32, "float", 32),
    "RGBA32F": PixelFormatInfo("RGBA32F", 4, np.float32, "float", 32),
    "R16UI": PixelFormatInfo("R16UI", 1, np.uint16, "uint", 16),
    "RGB8S": PixelFormatInfo("RGB8S", 3, np.int8, "snorm", 8),
    "RGBA8S": PixelFormatInfo("RGBA8S", 4, np.int8, "snorm", 8),
    "DEPTH32F": PixelFormatInfo("DEPTH32F", 1, np.float32, "float", 32),
    "DEPTH24_STENCIL8": PixelFormatInfo(
        "DEPTH24_STENCIL8", 1, np.uint32, "uint", 32),
}


def _to_float(arr, info: PixelFormatInfo):
    if info.kind == "unorm":
        return unorm_to_float(arr, info.bits_per_component)
    if info.kind == "snorm":
        return snorm_to_float(arr, info.bits_per_component)
    if info.kind == "uint":
        return arr.astype(np.float32)
    return arr.astype(np.float32)


def _from_float(arr, info: PixelFormatInfo):
    if info.kind == "unorm":
        return float_to_unorm(arr, info.bits_per_component)
    if info.kind == "snorm":
        return float_to_snorm(arr, info.bits_per_component)
    if info.kind == "uint":
        return np.clip(np.rint(arr), 0,
                       (1 << info.bits_per_component) - 1
                       ).astype(info.dtype)
    return arr.astype(info.dtype)


def _fit_components(f, src_c: int, dst_c: int):
    """Component adaptation like the reference's per-pair conversions:
    drop extras; missing color components get 0, missing alpha gets 1."""
    if src_c == dst_c:
        return f
    if dst_c < src_c:
        return f[..., :dst_c]
    pad = [f]
    if dst_c >= 4 > src_c:
        if src_c < 3:
            pad.append(np.zeros(f.shape[:-1] + (3 - src_c,), np.float32))
        pad.append(np.ones(f.shape[:-1] + (1,), np.float32))
    else:
        pad.append(np.zeros(f.shape[:-1] + (dst_c - src_c,), np.float32))
    out = np.concatenate(pad, axis=-1)
    return out[..., :dst_c]


def convert(arr, src: str, dst: str):
    """Convert an (…, C_src) array between formats (pixel_access.h store
    conversions, collapsed into one generic path)."""
    si, di = PIXEL_FORMATS[src], PIXEL_FORMATS[dst]
    arr = np.asarray(arr)
    if arr.ndim == 0 or (si.components > 1 and arr.shape[-1] != si.components):
        raise ValueError(f"expected trailing dim {si.components} for {src}")
    f = _to_float(arr, si)
    if si.components == 1 and f.ndim and f.shape[-1] != 1:
        f = f[..., None]
    f = _fit_components(f, si.components, di.components)
    out = _from_float(f, di)
    return out[..., 0] if di.components == 1 else out


def store(target: np.ndarray, img, src: str, dst: str):
    """pixel_access::store — convert and overwrite the target buffer."""
    target[...] = convert(img, src, dst)
    return target


def blend(target: np.ndarray, img, src: str, dst: str, sfactor: float,
          dfactor: float):
    """pixel_access::blend — target = src*sfactor + target*dfactor in
    linear float, then re-quantized (detail/pixel_access.h blend path;
    jittered_blend uses sfactor=1/frame, dfactor=1-1/frame)."""
    di = PIXEL_FORMATS[dst]
    cur = _to_float(np.asarray(target), di)
    si = PIXEL_FORMATS[src]
    new = _fit_components(_to_float(np.asarray(img), si),
                          si.components, di.components)
    if di.components == 1 and cur.ndim == new.ndim - 1:
        cur = cur[..., None]
    mixed = new * sfactor + cur * dfactor
    out = _from_float(mixed, di)
    target[...] = out[..., 0] if di.components == 1 and \
        target.ndim < out.ndim else out
    return target


# ---------------------------------------------------------------------------
# Device-side store/blend (the other half of the reference's pixel_access
# matrix, detail/pixel_access.h:40+): the render loop can accumulate
# straight into a QUANTIZED device buffer — the arrangement of the
# reference's GL render targets, where jittered_blend writes through
# pixel_access::blend into unorm8 color planes every frame.
#
# Quantization uses float32 scales on device (TPUs have no f64): exact for
# <= 16-bit components; 32-bit unorm/snorm round trips need the f64 host
# path above (they are exact there by design, core/norm.py).


def _jnp_dtype(info: PixelFormatInfo):
    import jax.numpy as jnp
    return jnp.dtype(info.dtype)


def _to_float_device(arr, info: PixelFormatInfo):
    import jax.numpy as jnp
    arr = jnp.asarray(arr)
    if info.kind == "unorm":
        return arr.astype(jnp.float32) / np.float32(_umax_bits(info))
    if info.kind == "snorm":
        return jnp.maximum(
            arr.astype(jnp.float32) / np.float32(_smax_bits(info)), -1.0)
    return arr.astype(jnp.float32)


def _from_float_device(f, info: PixelFormatInfo):
    import jax.numpy as jnp
    if info.kind == "unorm":
        q = jnp.clip(f, 0.0, 1.0) * np.float32(_umax_bits(info))
        return jnp.trunc(q).astype(_jnp_dtype(info))
    if info.kind == "snorm":
        q = jnp.clip(f, -1.0, 1.0) * np.float32(_smax_bits(info))
        return jnp.trunc(q).astype(_jnp_dtype(info))
    if info.kind == "uint":
        return jnp.clip(jnp.round(f), 0,
                        (1 << info.bits_per_component) - 1
                        ).astype(_jnp_dtype(info))
    return f.astype(_jnp_dtype(info))


def _umax_bits(info):
    return float((1 << info.bits_per_component) - 1)


def _smax_bits(info):
    return float((1 << (info.bits_per_component - 1)) - 1)


def _fit_components_device(f, src_c: int, dst_c: int):
    import jax.numpy as jnp
    if src_c == dst_c:
        return f
    if dst_c < src_c:
        return f[..., :dst_c]
    pad = [f]
    if dst_c >= 4 > src_c:
        if src_c < 3:
            pad.append(jnp.zeros(f.shape[:-1] + (3 - src_c,), jnp.float32))
        pad.append(jnp.ones(f.shape[:-1] + (1,), jnp.float32))
    else:
        pad.append(jnp.zeros(f.shape[:-1] + (dst_c - src_c,), jnp.float32))
    return jnp.concatenate(pad, axis=-1)[..., :dst_c]


def convert_device(arr, src: str, dst: str):
    """jit-compatible convert(): runs on device, differentiable up to the
    quantization.  <= 16-bit formats match the host path bit-for-bit away
    from truncation boundaries (f32 vs f64 scale can differ by 1 LSB when
    f * (2^bits - 1) lands within one ulp of an integer)."""
    si, di = PIXEL_FORMATS[src], PIXEL_FORMATS[dst]
    f = _to_float_device(arr, si)
    if si.components == 1 and (f.ndim == 0 or f.shape[-1] != 1):
        f = f[..., None]
    f = _fit_components_device(f, si.components, di.components)
    out = _from_float_device(f, di)
    return out[..., 0] if di.components == 1 else out


def store_device(target, img, src: str = "RGBA32F"):
    """Device-side pixel_access::store into a TypedRenderTarget."""
    return dataclasses.replace(
        target, color=convert_device(img, src, target.format))


def blend_device(target, img, sfactor, dfactor, src: str = "RGBA32F"):
    """Device-side pixel_access::blend: dequantize the current buffer, mix
    in linear float, requantize (jittered_blend: sfactor=1/frame)."""
    di = PIXEL_FORMATS[target.format]
    si = PIXEL_FORMATS[src]
    cur = _to_float_device(target.color, di)
    new = _fit_components_device(_to_float_device(img, si),
                                 si.components, di.components)
    mixed = new * sfactor + cur * dfactor
    return dataclasses.replace(target, color=_from_float_device(mixed, di))


def make_typed_render_target(width: int, height: int,
                             format: str = "RGBA8"):
    """Quantized device framebuffer (cpu_buffer_rt<PF_RGBA8,...> analogue).

    Returns a TypedRenderTarget pytree with a (H, W, C) buffer of the
    format's storage dtype; use store_device/blend_device to write."""
    import jax.numpy as jnp
    info = PIXEL_FORMATS[format]
    return TypedRenderTarget(
        color=jnp.zeros((height, width, info.components),
                        _jnp_dtype(info)),
        depth=jnp.zeros((height, width), jnp.float32),
        format=format, width=width, height=height)


from visionaray_tpu.core.types import pytree_dataclass as _ptd
from typing import Any as _Any


@_ptd(static=("format", "width", "height"))
class TypedRenderTarget:
    """Device render target with a quantized color plane."""

    color: _Any
    depth: _Any
    format: str = "RGBA8"
    width: int = 0
    height: int = 0

    def as_float(self):
        return _to_float_device(self.color, PIXEL_FORMATS[self.format])
