"""Pixel format conversion / store / blend (reference pixel_format.h +
detail/pixel_access.h semantics)."""

import numpy as np
import pytest

from visionaray_tpu.io.pixel_format import (
    PIXEL_FORMATS, blend, convert, store,
)


def test_format_table():
    assert PIXEL_FORMATS["RGBA8"].size_bytes == 4
    assert PIXEL_FORMATS["RGB32F"].size_bytes == 12
    assert PIXEL_FORMATS["DEPTH24_STENCIL8"].size_bytes == 4


def test_rgba32f_to_rgba8_and_back():
    img = np.array([[[0.0, 0.5, 1.0, 1.0]]], np.float32)
    u8 = convert(img, "RGBA32F", "RGBA8")
    assert u8.dtype == np.uint8
    assert list(u8[0, 0]) == [0, 127, 255, 255]
    back = convert(u8, "RGBA8", "RGBA32F")
    assert np.allclose(back, img, atol=1 / 255)


def test_component_adaptation():
    # RGB -> RGBA gains alpha 1; RGBA -> RGB drops it
    rgb = np.array([[[0.25, 0.5, 0.75]]], np.float32)
    rgba = convert(rgb, "RGB32F", "RGBA32F")
    assert rgba.shape[-1] == 4 and rgba[0, 0, 3] == 1.0
    rgb2 = convert(rgba, "RGBA32F", "RGB32F")
    assert np.allclose(rgb2, rgb)
    # RGBA -> R keeps red
    r = convert(rgba, "RGBA32F", "R32F")
    assert np.allclose(r, 0.25)


def test_snorm_format():
    f = np.array([[[-1.0, 0.0, 1.0]]], np.float32)
    s8 = convert(f, "RGB32F", "RGB8S")
    assert s8.dtype == np.int8
    assert list(s8[0, 0]) == [-127, 0, 127]


def test_store_and_blend_progressive():
    dst = np.zeros((2, 2, 4), np.uint8)
    frame1 = np.full((2, 2, 4), 0.8, np.float32)
    store(dst, frame1, "RGBA32F", "RGBA8")
    assert dst[0, 0, 0] == 204  # 0.8 * 255 truncated

    # progressive blend alpha = 1/frame (sched_common.h:515-529)
    frame2 = np.full((2, 2, 4), 0.0, np.float32)
    blend(dst, frame2, "RGBA32F", "RGBA8", 0.5, 0.5)
    # 0.0 * 0.5 + ~0.8 * 0.5 = ~0.4
    assert abs(int(dst[0, 0, 0]) - 102) <= 1


def test_half_float_formats():
    img = np.array([[[0.1, 0.2, 0.3]]], np.float32)
    h = convert(img, "RGB32F", "RGB16F")
    assert h.dtype == np.float16
    assert np.allclose(h.astype(np.float32), img, atol=1e-3)
