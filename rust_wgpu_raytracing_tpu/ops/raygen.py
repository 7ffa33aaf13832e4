"""Primary-ray generation.

Matches `pixelToRay` (sphere/compute.wgsl:87-101 == triangle_list
/compute.wgsl:150-164) including the premultiplied OPENGL_TO_WGPU quirk in
the proj_inv uniform (see core/camera.py):

    x_nds = 2(x+0.5)/W - 1;  y_nds = 2(y+0.5)/H - 1
    view  = (GL2WGPU @ P^-1) @ (x_nds, y_nds, 1, 1);  view.w = 0
    world = V^-1 @ view;  dir = normalize(world.xyz);  origin = eye

Pixel (x=0, y=0) is texel (0,0), displayed at the BOTTOM-left of the
window by the present pass (see io/image_out.py). All math in f32, like
the WGSL. The orthographic variant mirrors `pixelToRay_ortho`
(sphere/compute.wgsl:103-111) which is dead code in the reference; it's
provided for completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import CameraUniforms


def ndc_grid(width: int, height: int):
    """Returns (x_nds[W], y_nds[H]) pixel-center NDC coordinates, f32."""
    x = (2.0 * (jnp.arange(width, dtype=jnp.float32) + 0.5) / width) - 1.0
    y = (2.0 * (jnp.arange(height, dtype=jnp.float32) + 0.5) / height) - 1.0
    return x, y


def ray_directions(width: int, height: int, uni: CameraUniforms) -> jnp.ndarray:
    """(H, W, 3) f32 normalized world-space ray directions.

    The per-pixel 4x4 multiplies collapse into one affine map: with
    M = V^-1[:3,:3] @ (GL2WGPU @ P^-1)[:3,:] the unnormalized direction is
    M @ (x, y, 1, 1) — evaluated as an outer-product expansion so XLA fuses
    it into a few broadcast FMAs rather than a tiny matmul per pixel.
    """
    proj_inv = jnp.asarray(uni.proj_inv_wgpu, dtype=jnp.float32)
    view_inv = jnp.asarray(uni.view_inv, dtype=jnp.float32)

    x_nds, y_nds = ndc_grid(width, height)

    # view = proj_inv @ (x, y, 1, 1); only xyz survive (w zeroed afterwards).
    # precision=HIGHEST: TPU matmuls default to bf16 inputs, which is far too
    # coarse for camera matrices (and would shift every ray).
    m = jnp.matmul(view_inv[:3, :3], proj_inv[:3, :],
                   precision=jax.lax.Precision.HIGHEST)  # (3,4)
    const = m[:, 2] + m[:, 3]  # z=1, w=1 columns
    d = (
        m[:, 0][None, None, :] * x_nds[None, :, None]
        + m[:, 1][None, None, :] * y_nds[:, None, None]
        + const[None, None, :]
    )  # (H, W, 3)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def ray_directions_ortho(width: int, height: int, origin, scale: float = 5.0):
    """Dead-code parity: `pixelToRay_ortho`. Returns (origins(H,W,3),
    dir(3,)) — rays at z-offset grid positions pointing -z."""
    x_nds, y_nds = ndc_grid(width, height)
    o = jnp.asarray(origin, jnp.float32)
    origins = jnp.stack(
        [
            jnp.broadcast_to(o[0] + x_nds[None, :] * scale, (height, width)),
            jnp.broadcast_to(o[1] + y_nds[:, None] * scale, (height, width)),
            jnp.broadcast_to(o[2], (height, width)),
        ],
        axis=-1,
    )
    return origins, jnp.array([0.0, 0.0, -1.0], jnp.float32)
