"""Mip-chain texture minification (trilinear) — capability EXTENSION.

The reference forces mip level 0 for every sample via
`textureSampleGrad(..., vec2(0.), vec2(0.))`
(/root/reference/src/models/triangle_list/compute.wgsl:225), so distant
or grazing textured geometry aliases. This module adds the classic fix,
OFF by default (enable with RenderConfig.mip=True / render_megakernel
(..., mip=True)); the parity path and its packed level-0 pool are
untouched (core/scene.py builds the pyramid into a SEPARATE pool).

TPU-first design:
- LOD comes from an isotropic RAY CONE, not screen-space derivatives
  (there are no quad derivatives in a ray tracer): the angular width of
  a pixel is measured directly from the planar ray-direction planes
  (adjacent lanes of a tile row are adjacent pixels — one shifted
  subtract, no camera-model knowledge, correct for perspective, the
  reference's proj-inverse FOV quirk, and ortho alike), then scaled by
  hit distance, surface inclination, and the per-face uv density
  precomputed at scene build (SceneData.tri_uvscale).
- The winner face's uv density is ONE extra planar gather (gathers
  cost per index, payload-insensitive); level constants resolve via
  the same M-way/L-way selects as every other material constant
  (XLA fuses them into the surrounding elementwise bundle).
- The trilinear blend is two packed-pool bilinear taps
  (ops/megakernel.sample_packed_texture on SceneData.tex_mips) + one
  lerp — reusing the measured one-gather fast path per level.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_dir_delta(dx, dy, dz, row_w: int):
    """(R,) |d_next_pixel - d_this_pixel| for planar rays whose lanes
    run in x-contiguous rows of row_w (tile rows in tiled order, full
    scanlines otherwise). Edge lanes reuse their inward difference.
    Same parameter scale as d itself, so `t * delta` is the world-space
    pixel footprint at hit distance t."""
    def delta(p):
        m = p.reshape(-1, row_w)
        d = m[:, 1:] - m[:, :-1]
        d = jnp.concatenate([d, d[:, -1:]], axis=1)
        return d.reshape(-1)

    ddx, ddy, ddz = delta(dx), delta(dy), delta(dz)
    return jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)


def ray_cone_lod(scene, gb, dx, dy, dz, row_w: int,
                 max_cos_boost: float = 0.08):
    """(R,) f32 mip LOD for the G-buffer's winner surfaces.

    footprint_texels = t * |pixel dir delta| / max(cos theta, clamp)
                       * uvscale(face) * sqrt(tex_w * tex_h)
    lod = log2(footprint_texels), clamped to the pyramid range by the
    sampler. cos theta is clamped (default 0.08, the usual ray-cone
    practice) so grazing surfaces don't blow up to the 1x1 level."""
    f = scene.tri_uvscale.shape[0]
    idx = jnp.clip(gb.face, 0, max(f - 1, 0))
    uvs = jnp.take(scene.tri_uvscale, idx)

    dlen = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    cos = jnp.abs(gb.nx * dx + gb.ny * dy + gb.nz * dz) \
        / jnp.maximum(dlen, 1e-30)
    dpix = pixel_dir_delta(dx, dy, dz, row_w)
    ts = jnp.where(jnp.isfinite(gb.t), gb.t, 0.0)
    fw = ts * dpix / jnp.maximum(cos, max_cos_boost)

    from .megakernel import _mat_const

    th = _mat_const(scene, gb.mat, lambda k: scene.mat_mip_h[k, 0])
    tw = _mat_const(scene, gb.mat, lambda k: scene.mat_mip_w[k, 0])
    ft = fw * uvs * jnp.sqrt(th * tw)
    return jnp.log2(jnp.maximum(ft, 2.0 ** -16))


def sample_mip_trilinear(scene, mat_f32, lod, u, v, *,
                         interpret: bool = False):
    """Trilinear sample of the pyramid pool: two bilinear level taps
    (floor(lod), floor(lod)+1, both clamped to the chain) blended by
    the lod fraction. u/v in [0,1] with v already flipped — identical
    addressing semantics to sample_packed_texture; lod <= 0 degenerates
    to EXACTLY the level-0 bilinear tap (frac 0, both levels 0)."""
    from .megakernel import _mat_const, sample_packed_texture

    levels = scene.mip_levels
    assert levels > 0, "scene has no mip pyramid (meshless build?)"
    lodc = jnp.clip(lod, 0.0, float(levels - 1))
    l0f = jnp.floor(lodc)
    frac = lodc - l0f
    l0 = l0f.astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, levels - 1)

    def lv_const(table, li):
        out = _mat_const(scene, mat_f32, lambda k: table[k, 0])
        for lv in range(1, levels):
            row = _mat_const(scene, mat_f32, lambda k: table[k, lv])
            out = jnp.where(li == lv, row, out)
        return out

    def tap(li):
        base = lv_const(scene.mat_mip_base, li)
        h = lv_const(scene.mat_mip_h, li)
        w = lv_const(scene.mat_mip_w, li)
        return sample_packed_texture(scene.tex_mips, base, h, w, u, v,
                                     interpret=interpret)

    r0, g0, b0 = tap(l0)
    r1, g1, b1 = tap(l1)
    w0 = 1.0 - frac
    return (r0 * w0 + r1 * frac, g0 * w0 + g1 * frac,
            b0 * w0 + b1 * frac)
