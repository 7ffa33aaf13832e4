"""Depth mapping + purely functional pass compositing.

The reference implements compositing with a hand-rolled depth protocol
across sequential compute passes: depth textures cleared to 0, each kernel
reads current = 1 - depth_input, writes only where its nonlinear depth is
STRICTLY less, and stores 1 - depth (sphere/compute.wgsl:128-156); between
passes the host copies depth_output -> depth_input
(src/lib.rs:1115-1173). Under jit those copies vanish: each "pass" is a
pure function (color, depth) -> (color', depth') and XLA fuses the chain.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_nonlinear_depth(t, near: float = 0.01, far: float = 100.0):
    """toNonLinearDepth (sphere/compute.wgsl:59-61): inverse-depth mapped so
    near->0, far->1. NOTE near/far here are the KERNEL constants (.01/100),
    not the camera znear/zfar — reference quirk preserved
    (config.RenderConfig.kernel_near/kernel_far)."""
    return ((1.0 / t) - (1.0 / near)) / ((1.0 / far) - (1.0 / near))


def composite_pass(color, depth, pass_color, pass_t, pass_hit, near, far):
    """Fold one pass into the framebuffer.

    color: (H,W,3) current; depth: (H,W) current NONLINEAR depth
    (initialized to 1.0 = cleared); pass_t: (H,W) ray distance (+inf miss);
    pass_hit: (H,W) bool. Write where hit AND nonlinear(t) < depth (strict,
    so earlier passes win ties — sphere/compute.wgsl:133).
    """
    d = to_nonlinear_depth(pass_t, near, far)
    write = pass_hit & (d < depth)
    color = jnp.where(write[..., None], pass_color, color)
    depth = jnp.where(write, d, depth)
    return color, depth


def clear(height: int, width: int, background):
    """The analogue of the compute_clear_buffer copies
    (src/lib.rs:1024-1104): color = background, stored depth = 0 which
    reads back as current_depth 1.0."""
    color = jnp.broadcast_to(
        jnp.asarray(background, jnp.float32), (height, width, 3)
    ).astype(jnp.float32)
    depth = jnp.ones((height, width), jnp.float32)
    return color, depth
