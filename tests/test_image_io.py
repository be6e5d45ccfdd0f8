"""Image I/O breadth: PNM/TGA/HDR round trips + save_image dispatch.

Reference counterpart: the 6-format image facade (src/common/image.cpp,
png/jpeg/tga/tiff/pnm/hdr loaders); the HDR WRITE path is new here.
"""

import numpy as np
import pytest

from visionaray_tpu.io.image import (
    load_hdr, load_image, load_pnm, load_tga, save_hdr, save_image,
    save_pgm, save_ppm, save_tga,
)


def _img(h=7, w=9, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (h, w, 4)).astype(np.float32)


def test_ppm_round_trip(tmp_path):
    img = _img()
    p = save_ppm(tmp_path / "a.ppm", img, srgb=False)
    back = load_pnm(p, srgb=False)
    np.testing.assert_allclose(back[..., :3], img[..., :3], atol=1 / 255.0)


def test_pgm_round_trip(tmp_path):
    img = _img()
    p = save_pgm(tmp_path / "a.pgm", img, srgb=False)
    back = load_pnm(p, srgb=False)
    luma = (0.2126 * img[..., 0] + 0.7152 * img[..., 1]
            + 0.0722 * img[..., 2])
    np.testing.assert_allclose(back[..., 0], luma, atol=2 / 255.0)


def test_tga_round_trip(tmp_path):
    img = _img(seed=1)
    p = save_tga(tmp_path / "a.tga", img, srgb=True)
    back = load_tga(p, srgb=True)
    np.testing.assert_allclose(back[..., :3], img[..., :3], atol=0.02)


def test_hdr_round_trip_preserves_dynamic_range(tmp_path):
    rng = np.random.default_rng(2)
    img = (rng.uniform(0, 1, (5, 6, 4)) *
           10.0 ** rng.integers(-3, 4, (5, 6, 1))).astype(np.float32)
    p = save_hdr(tmp_path / "a.hdr", img)
    back = load_hdr(p)
    # RGBE shares one exponent per pixel: error bound is ~1/256 of the
    # pixel's MAX channel (8-bit mantissas), not per-channel relative
    maxc = img[..., :3].max(axis=-1, keepdims=True)
    err = np.abs(back[..., :3] - img[..., :3])
    assert (err <= maxc / 128.0 + 1e-30).all()
    assert back[..., :3].max() > 1.0


def test_save_image_dispatch(tmp_path):
    img = _img(seed=3)
    for ext in ("png", "ppm", "pgm", "tga", "hdr"):
        p = save_image(tmp_path / f"x.{ext}", img)
        back = load_image(p)
        assert back.shape[:2] == img.shape[:2]
        assert back.shape[-1] == 4


def test_tga_matches_pil(tmp_path):
    """Cross-check our TGA writer against an independent reader."""
    PIL = pytest.importorskip("PIL.Image")
    img = _img(seed=4)
    p = save_tga(tmp_path / "a.tga", img, srgb=False)
    ours = load_tga(p, srgb=False)
    theirs = np.asarray(PIL.open(p).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(ours[::-1][..., :3], theirs, atol=1e-6)
