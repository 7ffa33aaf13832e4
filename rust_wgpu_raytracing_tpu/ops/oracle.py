"""The oracle renderer: pure vectorized jnp, runs anywhere (CPU/TPU).

This is the golden path (BASELINE config 1 is "CPU-runnable" by design):
a direct, fully vectorized transcription of the reference's frame
(src/lib.rs:1012-1230 pass choreography + the WGSL kernels), with no
Pallas. It is the pixel-match fixture the TPU megakernel is tested
against, and the always-correct fallback.

Row-blocked with lax.map so the (rays x faces) intermediates stay bounded.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.camera import CameraUniforms
from ..core.scene import SceneData
from .composite import clear, composite_pass, to_nonlinear_depth
from .intersect import (intersect_sphere, intersect_tris, occluded_spheres,
                        occluded_tris)
from .raygen import ray_directions
from .shade import quantize_rgba8, shade_mesh_hit, shade_sphere

SHADOW_EPS = 1e-3


def _row_block(height: int, width: int, max_rays: int = 32768) -> int:
    """Largest divisor of `height` keeping a block under ~max_rays rays."""
    best = 1
    for b in range(1, height + 1):
        if height % b == 0 and b * width <= max_rays:
            best = b
    return best


def _shadow_lit(scene: SceneData, origin, dirs, t, normal, light_dir):
    """Hard-shadow visibility toward a directional light: cast from the hit
    point (offset along the normal) in direction -normalize(L)."""
    l = light_dir / jnp.linalg.norm(light_dir)
    p = origin + dirs * t[..., None] + normal * SHADOW_EPS
    sdir = jnp.broadcast_to(-l, dirs.shape)
    occ = occluded_tris(scene, p, sdir, t_min=SHADOW_EPS)
    occ = occ | occluded_spheres(scene, p, sdir, t_min=SHADOW_EPS)
    return ~occ


@partial(jax.jit, static_argnames=("width", "height", "near", "far",
                                   "background", "shadows", "quantize",
                                   "normal_mapping", "max_block_rays"))
def render_oracle(scene: SceneData, uni_flat, *, width: int, height: int,
                  near: float = 0.01, far: float = 100.0,
                  background=(0.0, 0.0, 0.0), shadows: bool = False,
                  quantize: bool = True, normal_mapping: bool = False,
                  max_block_rays: int = 32768):
    """Render one frame. Returns (color (H,W,3) f32, depth (H,W) f32).

    `uni_flat` is CameraUniforms.flat() — the only per-frame device input,
    the analogue of the reference's two queue.write_buffer calls
    (src/lib.rs:999-1009).
    """
    uni = CameraUniforms.unflat(jnp.asarray(uni_flat, jnp.float32))
    origin = uni.origin

    dirs_full = ray_directions(width, height, uni)  # (H,W,3)

    rb = _row_block(height, width, max_block_rays)
    nblocks = height // rb

    def block_fn(dirs):  # (rb, W, 3)
        color, depth = clear(rb, width, background)

        # --- sphere passes, in config order (src/lib.rs:1106-1148) ---
        for i in range(scene.num_spheres):
            sh = intersect_sphere(scene.sphere_center[i],
                                  scene.sphere_radius[i], origin, dirs)
            hit = jnp.isfinite(sh.t)
            safe_n = jnp.where(hit[..., None], sh.normal, 0.0)
            lit = None
            if shadows:
                lit = _shadow_lit(scene, origin, dirs, jnp.where(hit, sh.t, 0.0),
                                  safe_n, scene.sphere_light[i])
            pc = shade_sphere(scene, i, safe_n, dirs, lit=lit)
            color, depth = composite_pass(color, depth, pc, sh.t, hit, near, far)

        # --- mesh pass (src/lib.rs:1174-1184) ---
        if scene.num_faces > 0:
            th = intersect_tris(scene, origin, dirs)
            hit = jnp.isfinite(th.t)
            lit = None
            if shadows:
                n = scene.tri_n[th.face]
                n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
                n = jnp.where(th.n_dot_d[..., None] > 0.0, -n, n)
                light = scene.mat_light[scene.tri_mat[th.face]]
                l = light / jnp.linalg.norm(light, axis=-1, keepdims=True)
                p = origin + dirs * jnp.where(hit, th.t, 0.0)[..., None] + n * SHADOW_EPS
                occ = occluded_tris(scene, p, -l, t_min=SHADOW_EPS)
                occ = occ | occluded_spheres(scene, p, -l, t_min=SHADOW_EPS)
                lit = ~occ
            pc = shade_mesh_hit(scene, th.face, th.u, th.v, th.n_dot_d, dirs,
                                lit=lit, normal_mapping=normal_mapping)
            pc = jnp.where(hit[..., None], pc, 0.0)
            color, depth = composite_pass(color, depth, pc, th.t, hit, near, far)

        return color, depth

    color, depth = jax.lax.map(
        block_fn, dirs_full.reshape(nblocks, rb, width, 3))
    color = color.reshape(height, width, 3)
    depth = depth.reshape(height, width)

    if quantize:
        color = quantize_rgba8(color)
    return color, depth
