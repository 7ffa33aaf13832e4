"""Single-triangle model (reference src/models/triangle/triangle.rs).

The reference's Triangle is DEAD CODE — exported by models/mod.rs:2 but
never instantiated (SURVEY §2.2); its kernel is a hardcoded-uniform,
no-barycentrics variant of the list kernel (triangle/compute.wgsl:65-125).
Provided for API completeness: a one-face mesh with flat shading.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.composite import to_nonlinear_depth
from ..ops.intersect import K_EPSILON


@dataclass(frozen=True)
class Triangle:
    p0: Tuple[float, float, float]
    p1: Tuple[float, float, float]
    p2: Tuple[float, float, float]
    color: Tuple[float, float, float] = (1.0, 0.0, 0.0)
    light_direction: Tuple[float, float, float] = (1.0, -1.0, -5.0)

    def intersect(self, origin, dx, dy, dz):
        """Planar plane-based intersection, same math as the soup kernel
        (triangle/compute.wgsl:65-125: no barycentric outputs).
        Returns (t, hit, nx, ny, nz)."""
        p0 = np.asarray(self.p0, np.float32)
        p1 = np.asarray(self.p1, np.float32)
        p2 = np.asarray(self.p2, np.float32)
        n = np.cross(p1 - p0, p2 - p0)
        d = -float(np.dot(n, p0))
        g = [np.cross(n, e) for e in (p1 - p0, p2 - p1, p0 - p2)]
        c = [float(np.dot(p, gi)) for p, gi in zip((p0, p1, p2), g)]

        o = jnp.asarray(origin, jnp.float32)
        ndotd = n[0] * dx + n[1] * dy + n[2] * dz
        t = -((n[0] * o[0] + n[1] * o[1] + n[2] * o[2]) + d) / ndotd
        hs = []
        for gi, ci in zip(g, c):
            og = gi[0] * o[0] + gi[1] * o[1] + gi[2] * o[2] - ci
            dg = gi[0] * dx + gi[1] * dy + gi[2] * dz
            hs.append(og + t * dg)
        hit = ((jnp.abs(ndotd) >= K_EPSILON) & (t >= 0.0)
               & (hs[0] >= 0.0) & (hs[1] >= 0.0) & (hs[2] >= 0.0))
        un = n / np.linalg.norm(n)
        flip = ndotd > 0.0
        nx = jnp.where(flip, -un[0], un[0])
        ny = jnp.where(flip, -un[1], un[1])
        nz = jnp.where(flip, -un[2], un[2])
        return t, hit, nx, ny, nz

    def render_pass(self, state, origin, dx, dy, dz, near=0.01, far=100.0):
        from ..ops.megakernel import blinn_phong_planar

        cr, cg, cb, depth = state
        t, hit, nx, ny, nz = self.intersect(origin, dx, dy, dz)
        light = jnp.asarray(self.light_direction, jnp.float32)
        lam, spec = blinn_phong_planar(nx, ny, nz, dx, dy, dz, light)
        shade = 0.1 + lam  # triangle kernel's hardcoded coefficients
        pr = self.color[0] * shade + 0.5 * spec
        pg = self.color[1] * shade + 0.5 * spec
        pb = self.color[2] * shade + 0.5 * spec
        d = to_nonlinear_depth(jnp.where(hit, t, 1.0), near, far)
        write = hit & (d < depth)
        return (jnp.where(write, pr, cr), jnp.where(write, pg, cg),
                jnp.where(write, pb, cb), jnp.where(write, d, depth))
