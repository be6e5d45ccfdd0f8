"""Image output/input: PNG (via PIL) and PPM fallback, sRGB conversion.

The reference displays through GL (optionally GL_FRAMEBUFFER_SRGB,
viewer.cpp:556-566); headless TPU rendering writes files instead.
Framebuffers are linear (H, W, 4) float32 with row 0 at the BOTTOM (GL
convention); files are written top-down.
"""

from __future__ import annotations

import numpy as np


def linear_to_srgb(x):
    x = np.clip(np.asarray(x, np.float32), 0.0, 1.0)
    return np.where(x <= 0.0031308, 12.92 * x,
                    1.055 * np.power(x, 1.0 / 2.4) - 0.055)


def srgb_to_linear(x):
    x = np.asarray(x, np.float32)
    return np.where(x <= 0.04045, x / 12.92,
                    np.power((x + 0.055) / 1.055, 2.4))


def to_uint8(img, srgb: bool = True):
    """(H, W, C) linear float -> top-down uint8 image."""
    img = np.asarray(img)
    if srgb:
        img = linear_to_srgb(img)
    else:
        img = np.clip(img, 0.0, 1.0)
    img = (img * 255.0 + 0.5).astype(np.uint8)
    return img[::-1]  # bottom-up framebuffer -> top-down file


def save_png(path: str, img, srgb: bool = True):
    arr = to_uint8(img, srgb)
    try:
        from PIL import Image
    except ImportError:
        return save_ppm(str(path).rsplit(".", 1)[0] + ".ppm", img, srgb)
    mode = {1: "L", 3: "RGB", 4: "RGBA"}[arr.shape[-1] if arr.ndim == 3 else 1]
    Image.fromarray(arr.squeeze() if mode == "L" else arr, mode).save(path)
    return path


def save_ppm(path: str, img, srgb: bool = True):
    arr = to_uint8(img, srgb)
    if arr.ndim == 3 and arr.shape[-1] >= 3:
        arr = arr[..., :3]
    h, w = arr.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(arr.tobytes())
    return path


def load_image(path: str, srgb: bool = True):
    """Load an image file to linear float (H, W, C), bottom-up."""
    from PIL import Image
    arr = np.asarray(Image.open(path).convert("RGBA"), np.float32) / 255.0
    if srgb:
        arr = srgb_to_linear(arr)
    return arr[::-1]
