"""Ray-primitive intersection (vectorized jnp — the oracle / fallback path).

These functions are the executable spec of the reference's WGSL
intersectors, vectorized over rays (and faces). The Pallas megakernel
(ops/megakernel.py) implements the same math tiled for VMEM/MXU and is
tested against this module.

Conventions:
- ray directions are normalized f32; the primary-ray origin is shared
  (the eye) but a per-ray origin is supported for shadow/secondary rays;
- "miss" is encoded as t = +inf;
- all faces are the padded triangle soup of core/scene.py; padding faces
  have inv_denom == 0 and tri_valid == 0 and can never hit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.scene import SceneData

K_EPSILON = 1e-6  # reference kEpsilon, triangle_list/compute.wgsl:53
# TPU matmuls default to bf16 operand precision — parity math must be f32.
HI = jax.lax.Precision.HIGHEST
INF = jnp.float32(jnp.inf)


class SphereHit(NamedTuple):
    t: jnp.ndarray  # (...,) f32, +inf on miss
    normal: jnp.ndarray  # (...,3) f32


class TriHit(NamedTuple):
    t: jnp.ndarray  # (...,) f32, +inf on miss
    face: jnp.ndarray  # (...,) i32 index of winning face (first-min wins)
    u: jnp.ndarray  # (...,) f32 barycentric weight of corner 0
    v: jnp.ndarray  # (...,) f32 barycentric weight of corner 1
    n_dot_d: jnp.ndarray  # (...,) f32 sign decides normal flip


def intersect_sphere(center, radius, origin, dirs) -> SphereHit:
    """Analytic sphere intersection (sphere/compute.wgsl:63-85).

    Keeps the reference's exact formulation: full quadratic with
    a = D.D (even though D is normalized), b = 2 oc.D, strict
    discriminant < 0 miss, then t1 (near) if >= 0 else t2 (far) if >= 0.
    `origin` broadcasts against `dirs` (..., 3).
    """
    center = jnp.asarray(center, jnp.float32)
    oc = jnp.asarray(origin, jnp.float32) - center
    a = jnp.sum(dirs * dirs, axis=-1)
    b = 2.0 * jnp.sum(oc * dirs, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius

    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)

    t = jnp.where(t1 >= 0.0, t1, jnp.where(t2 >= 0.0, t2, INF))
    t = jnp.where(disc < 0.0, INF, t)

    point = jnp.asarray(origin, jnp.float32) + dirs * t[..., None]
    n = point - center
    normal = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    return SphereHit(t=t, normal=normal)


def _face_origin_terms(scene: SceneData, origin):
    """Per-face affine constants for a given ray origin O:
    t_num = -(N.O + d);  h_c[i] = O.g_i - c_i.  Shapes (F,), (F,3)."""
    o = jnp.asarray(origin, jnp.float32)
    t_num = -(jnp.matmul(scene.tri_n, o, precision=HI) + scene.tri_d)
    h_c = jnp.einsum("fij,j->fi", scene.tri_g, o, precision=HI) - scene.tri_c
    return t_num, h_c


def intersect_tris(scene: SceneData, origin, dirs, t_max=None) -> TriHit:
    """Brute-force all-faces intersection for rays with SHARED origin.

    The exact semantics of the reference loop
    (triangle_list/compute.wgsl:82-148,186-202):
    - parallel reject: |N.D| < kEpsilon (N unnormalized);
    - behind reject: t < 0;
    - inside-outside: all three edge-plane values >= 0 (misses on strictly
      negative, so edges/vertices hit);
    - first face with the minimal t wins (strict < update).

    dirs: (..., 3). Returns TriHit with (...)-shaped fields.
    """
    shape = dirs.shape[:-1]
    d2 = dirs.reshape(-1, 3)  # (R,3)

    t_num, h_c = _face_origin_terms(scene, origin)

    # (R,F) matmuls against the packed face planes — MXU work under jit.
    ndotd = jnp.matmul(d2, scene.tri_n.T, precision=HI)
    dg = jnp.einsum("rj,fij->rfi", d2, scene.tri_g, precision=HI)  # (R,F,3)

    t = t_num[None, :] / ndotd
    h = h_c[None, :, :] + t[..., None] * dg  # (R,F,3) edge-plane values

    hit = (
        (jnp.abs(ndotd) >= K_EPSILON)
        & (t >= 0.0)
        & jnp.all(h >= 0.0, axis=-1)
        & (scene.tri_valid[None, :] > 0.0)
    )
    if t_max is not None:
        hit = hit & (t < t_max)
    t_masked = jnp.where(hit, t, INF)

    tmin = jnp.min(t_masked, axis=1)
    face = jnp.argmin(t_masked, axis=1).astype(jnp.int32)  # first-min wins

    u_raw = jnp.take_along_axis(h[..., 1], face[:, None], axis=1)[:, 0]
    v_raw = jnp.take_along_axis(h[..., 2], face[:, None], axis=1)[:, 0]
    nd = jnp.take_along_axis(ndotd, face[:, None], axis=1)[:, 0]
    inv_denom = scene.tri_inv_denom[face]

    return TriHit(
        t=tmin.reshape(shape),
        face=face.reshape(shape),
        u=(u_raw * inv_denom).reshape(shape),
        v=(v_raw * inv_denom).reshape(shape),
        n_dot_d=nd.reshape(shape),
    )


def occluded_tris(scene: SceneData, origins, dirs, t_min=1e-3, t_max=None):
    """Any-hit query for shadow rays with PER-RAY origins.

    Returns a boolean (...,) — True if any valid face intersects in
    (t_min, t_max). Shadow rays are a BASELINE-added capability (the
    reference casts primary rays only).
    """
    shape = dirs.shape[:-1]
    o2 = jnp.broadcast_to(origins, dirs.shape).reshape(-1, 3)
    d2 = dirs.reshape(-1, 3)

    ndotd = jnp.matmul(d2, scene.tri_n.T, precision=HI)  # (R,F)
    ndoto = jnp.matmul(o2, scene.tri_n.T, precision=HI)
    t = -(ndoto + scene.tri_d[None, :]) / ndotd

    og = jnp.einsum("rj,fij->rfi", o2, scene.tri_g, precision=HI) - scene.tri_c[None, :, :]
    dg = jnp.einsum("rj,fij->rfi", d2, scene.tri_g, precision=HI)
    h = og + t[..., None] * dg

    hit = (
        (jnp.abs(ndotd) >= K_EPSILON)
        & (t >= t_min)
        & jnp.all(h >= 0.0, axis=-1)
        & (scene.tri_valid[None, :] > 0.0)
    )
    if t_max is not None:
        hit = hit & (t < t_max)
    return jnp.any(hit, axis=1).reshape(shape)


def occluded_spheres(scene: SceneData, origins, dirs, t_min=1e-3):
    """Any-hit vs all spheres for shadow rays."""
    if scene.num_spheres == 0:
        return jnp.zeros(dirs.shape[:-1], dtype=bool)
    occ = jnp.zeros(dirs.shape[:-1], dtype=bool)
    for i in range(scene.num_spheres):
        sh = intersect_sphere(scene.sphere_center[i], scene.sphere_radius[i],
                              origins, dirs)
        occ = occ | (sh.t >= t_min) & jnp.isfinite(sh.t)
    return occ
