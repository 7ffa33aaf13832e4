"""Framebuffer presentation: PNG/PPM writers and display conversion.

The reference's present pass (screenquad.wgsl + the raster pipeline at
src/lib.rs:679-729,1186-1224) samples the Rgba8Unorm storage texture onto an
sRGB swapchain surface — i.e. the displayed image is the sRGB encoding of
the stored shading values. TPU-native equivalent: `jax.device_get` the
framebuffer and encode here.

Framebuffer convention: fb[y, x] with y=0 being the reference's texel row 0,
which the screenquad displays at the BOTTOM of the window (NDC (-1,-1) maps
to tex (0,0), src/lib.rs:39-64). Image files use top-down rows, so writers
flip vertically.
"""

from __future__ import annotations

import numpy as np

from ..core.math3d import linear_to_srgb


def framebuffer_to_image(fb: np.ndarray, srgb: bool = True) -> np.ndarray:
    """(H,W,3|4) float framebuffer -> (H,W,3) u8 image, top-down rows."""
    fb = np.asarray(fb)
    rgb = np.clip(fb[..., :3], 0.0, 1.0).astype(np.float32)
    if srgb:
        rgb = linear_to_srgb(rgb)
    img = (rgb * 255.0 + 0.5).astype(np.uint8)
    return img[::-1]  # texel row 0 is screen bottom -> image bottom


def write_png(path: str, fb: np.ndarray, srgb: bool = True) -> None:
    from PIL import Image

    Image.fromarray(framebuffer_to_image(fb, srgb=srgb)).save(path)


def write_ppm(path: str, fb: np.ndarray, srgb: bool = True) -> None:
    img = framebuffer_to_image(fb, srgb=srgb)
    h, w, _ = img.shape
    with open(path, "wb") as fh:
        fh.write(f"P6\n{w} {h}\n255\n".encode())
        fh.write(img.tobytes())
