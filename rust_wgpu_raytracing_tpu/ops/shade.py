"""Shading: Blinn-Phong + bilinear texture sampling (jnp, XLA-fused).

Matches the reference kernels' shading exactly:
- spheres (sphere/compute.wgsl:137-152): hardcoded coefficients
  (ambient .1, diffuse 1, specular .5), material color red, shininess 32,
  light dir (1,-5,1);
- meshes (triangle_list/compute.wgsl:217-234): ambient/specular from the
  MTL material uniform, diffuse from the texture sample * lambert,
  shininess hardcoded 32, light dir (1,-1,-5), UV V-flip at :223.

Texture sampling reproduces textureSampleGrad with zero gradients on a
clamp-to-edge linear-mag sampler (texture.rs:151-158): bilinear at mip 0.

Shading is deliberately OUTSIDE the Pallas intersection kernel: it is
O(rays) gather-heavy work the VPU dislikes but XLA's TPU gather handles
well, while the O(rays x faces) intersection loop lives in Pallas. Both
run inside one jit, so the G-buffer never round-trips to HBM-host.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.scene import SceneData

SHININESS = 32.0  # hardcoded in both kernels (sphere/compute.wgsl:145)


def _normalize(v, axis=-1):
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True)


def blinn_phong(normal, ray_dir, light_dir, diffuse_color, ambient_color,
                specular_color, lit=None):
    """Shared Blinn-Phong core.

    color = ambient_color + diffuse_color * max(0, n.(-L))
          + specular_color * max(0, h.n)^32,   h = normalize(-L - D)
    with L = normalize(light_dir). `lit` (optional bool mask) zeroes the
    direct terms for shadowed points (shadow extension).
    """
    l = _normalize(jnp.asarray(light_dir, jnp.float32))
    lam = jnp.maximum(0.0, jnp.sum(normal * (-l), axis=-1))
    half = _normalize(-l - ray_dir)
    spec = jnp.maximum(0.0, jnp.sum(half * normal, axis=-1)) ** SHININESS
    if lit is not None:
        lam = jnp.where(lit, lam, 0.0)
        spec = jnp.where(lit, spec, 0.0)
    return (
        ambient_color
        + diffuse_color * lam[..., None]
        + specular_color * spec[..., None]
    )


def shade_sphere(scene: SceneData, i: int, normal, ray_dir, lit=None):
    """Sphere shading (sphere/compute.wgsl:137-152): diffuse_color is the
    sphere's flat color scaled by the diffuse coefficient; ambient scales
    the SAME color; specular is white * coefficient."""
    coeff = scene.sphere_coeff[i]  # [ambient, diffuse, specular]
    color = scene.sphere_color[i]
    return blinn_phong(
        normal, ray_dir, scene.sphere_light[i],
        diffuse_color=color * coeff[1],
        ambient_color=color * coeff[0],
        specular_color=jnp.broadcast_to(coeff[2], (3,)),
        lit=lit,
    )


def sample_texture_bilinear(textures, tex_hw, tex_id, u, v):
    """Bilinear clamp-to-edge sample from the stacked texture array.

    textures: (T, TH, TW, 3); tex_hw: (T,2) true sizes; tex_id: (...) i32;
    u, v: (...) f32 normalized coords (v NOT yet flipped — caller applies
    the reference's V-flip). WGSL linear filtering: texel centers at
    integer+0.5, footprint clamped to the edge.
    """
    h = tex_hw[tex_id, 0].astype(jnp.float32)
    w = tex_hw[tex_id, 1].astype(jnp.float32)

    x = u * w - 0.5
    y = v * h - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]

    hi_x = (w - 1.0).astype(jnp.int32)
    hi_y = (h - 1.0).astype(jnp.int32)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, hi_x)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, hi_x)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, hi_y)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, hi_y)

    c00 = textures[tex_id, y0, x0]
    c10 = textures[tex_id, y0, x1]
    c01 = textures[tex_id, y1, x0]
    c11 = textures[tex_id, y1, x1]

    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def shade_mesh_hit(scene: SceneData, face, u, v, n_dot_d, ray_dir, lit=None,
                   normal_mapping: bool = False):
    """Mesh-hit shading from G-buffer values (face index + barycentrics).

    Reproduces triangle_list/compute.wgsl:208-234: barycentric UV
    interpolation with weights (u, v, 1-u-v) on corners (0,1,2), V-flip,
    bilinear texture fetch, Blinn-Phong with MTL ambient/specular.
    The geometric normal is normalize(N) flipped against the ray
    (compute.wgsl:140-147).
    """
    w = 1.0 - u - v
    uv3 = scene.tri_uv[face]  # (...,3,2)
    uv = (
        u[..., None] * uv3[..., 0, :]
        + v[..., None] * uv3[..., 1, :]
        + w[..., None] * uv3[..., 2, :]
    )
    tex_u = uv[..., 0]
    tex_v = 1.0 - uv[..., 1]  # V-flip (compute.wgsl:223)

    n = scene.tri_n[face]
    n = _normalize(n)
    n = jnp.where(n_dot_d[..., None] > 0.0, -n, n)

    if normal_mapping:
        # BASELINE-added capability (the reference ships cube-normal.png
        # but never samples it): smooth-interpolated vertex normals where
        # present, then tangent-space perturbation from map_Bump.
        vn3 = scene.tri_vn[face]
        vn = (
            u[..., None] * vn3[..., 0, :]
            + v[..., None] * vn3[..., 1, :]
            + w[..., None] * vn3[..., 2, :]
        )
        has_vn = jnp.sum(vn * vn, axis=-1, keepdims=True) > 1e-12
        vn = jnp.where(has_vn, _normalize(jnp.where(has_vn, vn, 1.0)), n)
        vn = jnp.where(jnp.sum(vn * n, axis=-1, keepdims=True) < 0.0, -vn, vn)
        n = vn

        mat_ids = scene.tri_mat[face]
        bump_id = scene.mat_bump[mat_ids]
        has_bump = bump_id >= 0
        bid = jnp.maximum(bump_id, 0)
        brgb = sample_texture_bilinear(scene.textures, scene.tex_hw, bid,
                                       tex_u, tex_v)  # raw values
        nt = 2.0 * brgb - 1.0
        tangent = scene.tri_tangent[face]
        bitangent = scene.tri_bitangent[face]
        frame_ok = jnp.sum(tangent * tangent, axis=-1, keepdims=True) > 1e-12
        pert = (nt[..., 0:1] * tangent + nt[..., 1:2] * bitangent
                + nt[..., 2:3] * n)
        plen = jnp.sqrt(jnp.sum(pert * pert, axis=-1, keepdims=True))
        pert = pert / jnp.where(plen > 1e-12, plen, 1.0)
        use = has_bump[..., None] & frame_ok & (plen > 1e-12)
        n = jnp.where(use, pert, n)

    mat = scene.tri_mat[face]
    tex_id = scene.mat_tex[mat]
    tex_rgb = sample_texture_bilinear(scene.textures, scene.tex_hw, tex_id,
                                      tex_u, tex_v)

    return blinn_phong(
        n, ray_dir, scene.mat_light[mat],
        diffuse_color=tex_rgb,
        ambient_color=scene.mat_ambient[mat],
        specular_color=scene.mat_specular[mat],
        lit=lit,
    )


def quantize_rgba8(color):
    """Model the rgba8unorm storage-texture write (sphere/compute.wgsl:2):
    clamp to [0,1] and round to 8-bit levels.

    The dequantize multiplies by an EXPLICIT f32 reciprocal instead of
    dividing: XLA rewrites x / 255.0 into multiply-by-reciprocal in
    some compilation contexts but not others (measured 1-ulp
    divergence between the single-jit frame and the gp-sharded frame),
    and the geometry-parallel merge promises BITWISE equality across
    program boundaries — so every quantize site (oracle, split
    present, fused frame) runs this one function with the same
    constant."""
    c = jnp.clip(color, 0.0, 1.0)
    inv255 = jnp.float32(1.0 / 255.0)  # folded on the host, no divide op
    return jnp.floor(c * 255.0 + 0.5) * inv255
