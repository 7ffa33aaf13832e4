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

import functools

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


def encode_u8_device(color, srgb: bool = True):
    """DEVICE-side present encode: (H,W,3|4) f32 framebuffer -> (H,W,3)
    u8, still bottom-up (callers flip with a free host-side [::-1] view).

    Why it exists (round 5, measured): `present_image` used to
    `device_get` the f32 framebuffer and encode on host — 24.9 MB per
    1080p frame over the host<->device link. On the tunneled bench chip
    (~29 MB/s) that made the interactive shells ~1 fps at 1080p while
    the render itself took 13.7 ms. Quantizing on device moves 4x less
    (6.2 MB) and is the present pass a GPU does anyway (the reference
    encodes to its sRGB swapchain in the raster pass,
    src/lib.rs:310-315 + screenquad.wgsl).

    Parity note: XLA's pow may differ from numpy's by 1 ulp, so a pixel
    sitting exactly on a quantization boundary can come out 1 u8 level
    off the host encode. Goldens and the parity gate therefore keep
    using the host `framebuffer_to_image`; the interactive present path
    uses this (tests pin device-vs-host <= 1 level,
    tests/test_runtime.py)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("srgb",))
    def _enc(fb, srgb):
        rgb = jnp.clip(fb[..., :3].astype(jnp.float32), 0.0, 1.0)
        if srgb:
            rgb = jnp.where(rgb <= 0.0031308, rgb * 12.92,
                            1.055 * rgb ** (1.0 / 2.4) - 0.055)
        return (rgb * 255.0 + 0.5).astype(jnp.uint8)

    return _enc(color, srgb)


def write_png(path: str, fb: np.ndarray, srgb: bool = True) -> None:
    from PIL import Image

    Image.fromarray(framebuffer_to_image(fb, srgb=srgb)).save(path)


def write_ppm(path: str, fb: np.ndarray, srgb: bool = True) -> None:
    img = framebuffer_to_image(fb, srgb=srgb)
    h, w, _ = img.shape
    with open(path, "wb") as fh:
        fh.write(f"P6\n{w} {h}\n255\n".encode())
        fh.write(img.tobytes())
