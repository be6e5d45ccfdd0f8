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


class TestDeviceSidePixelAccess:
    """Device-side store/blend (VERDICT r2 Missing #6): the quantized
    framebuffer path must run under jit and agree with the host-side f64
    reference conversions to 1 LSB (f32 vs f64 scale)."""

    def test_convert_device_matches_host(self):
        import jax
        from visionaray_tpu.io.pixel_format import convert, convert_device
        rng = np.random.default_rng(0)
        f = rng.uniform(0, 1, (33, 7, 4)).astype(np.float32)
        for dst in ("RGBA8", "RGB8", "R8", "RGBA16F", "RGB32F", "RGBA8S"):
            host = convert(f, "RGBA32F", dst)
            dev = np.asarray(jax.jit(
                lambda a, d=dst: convert_device(a, "RGBA32F", d))(f))
            if host.dtype.kind in "iu":
                assert np.abs(host.astype(np.int64)
                              - dev.astype(np.int64)).max() <= 1, dst
            else:
                np.testing.assert_allclose(host, dev, rtol=1e-3, atol=1e-3)

    def test_blend_device_progressive_unorm8(self):
        import jax
        import jax.numpy as jnp
        from visionaray_tpu.io.pixel_format import (
            blend_device, make_typed_render_target,
        )
        rt = make_typed_render_target(8, 8, "RGBA8")
        assert rt.color.dtype == jnp.uint8
        rng = np.random.default_rng(1)
        frames = [rng.uniform(0, 1, (8, 8, 4)).astype(np.float32)
                  for _ in range(4)]
        blend = jax.jit(lambda rt, img, a: blend_device(rt, img, a, 1 - a))
        for i, f in enumerate(frames, start=1):
            rt = blend(rt, jnp.asarray(f), 1.0 / i)
        expect = np.mean(frames, axis=0)
        got = np.asarray(rt.as_float())
        # each requantization loses < 1/255; 4 frames compound
        assert np.abs(got - expect).max() < 4.0 / 255.0

    def test_render_into_typed_target(self):
        from visionaray_tpu.io.pixel_format import make_typed_render_target
        from visionaray_tpu.scenes import tri_sphere_plane
        from visionaray_tpu.sched.render import render
        scene, cam = tri_sphere_plane()
        rt = make_typed_render_target(16, 16, "RGBA8")
        for frame in (1, 2):
            rt = render(scene, cam, 16, 16, algo="simple",
                        pixel_sampler="jittered_blend", frame_num=frame,
                        rt=rt)
        img = np.asarray(rt.color)
        assert img.dtype == np.uint8
        assert img[..., :3].max() > 10  # actually rendered something
