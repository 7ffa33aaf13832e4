"""Analytic sphere model (reference src/models/sphere/sphere.rs).

The reference Sphere owns a {center, radius} uniform (sphere.rs:10-15)
and a compute pipeline compiled from its WGSL (sphere.rs:97-114); here a
Sphere owns its SphereConfig and exposes the same capability as a pure
pass function over planar frame state (the pipeline is the jitted frame;
XLA is the pipeline compiler).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import SphereConfig
from ..ops.composite import to_nonlinear_depth


@dataclass(frozen=True)
class Sphere:
    config: SphereConfig

    @staticmethod
    def new(radius: float, center) -> "Sphere":
        """Mirrors Sphere::new(device, radius, center) (sphere.rs:18)."""
        return Sphere(SphereConfig(center=tuple(center), radius=radius))

    @staticmethod
    def soa(spheres: Sequence[SphereConfig]) -> Tuple[np.ndarray, ...]:
        """Configs -> the sphere block of the scene SoA: the analogue of
        Sphere::new packing {center, radius} + shading coefficients into
        its uniform buffer (sphere.rs:18-96, compute.wgsl's SphereData).
        Scene.build calls this — the model layer OWNS its primitive's
        config->SoA assembly. Returns float32 (center (S,3), radius (S,),
        color (S,3), [ambient,diffuse,specular] (S,3), light_dir (S,3))."""
        center = np.array([s.center for s in spheres],
                          np.float32).reshape(-1, 3)
        radius = np.array([s.radius for s in spheres], np.float32)
        color = np.array([s.color for s in spheres],
                         np.float32).reshape(-1, 3)
        coeff = np.array([[s.ambient, s.diffuse, s.specular]
                          for s in spheres], np.float32).reshape(-1, 3)
        light = np.array([s.light_direction for s in spheres],
                         np.float32).reshape(-1, 3)
        return center, radius, color, coeff, light

    def intersect(self, origin, dx, dy, dz):
        """Planar analytic intersection (sphere/compute.wgsl:63-85).
        Returns (t, hit, nx, ny, nz)."""
        from ..ops.megakernel import sphere_pass_planar

        class _S:  # adapter so the shared planar op can index config data
            sphere_center = jnp.asarray([self.config.center], jnp.float32)
            sphere_radius = jnp.asarray([self.config.radius], jnp.float32)

        return sphere_pass_planar(_S, 0, origin, dx, dy, dz)

    def shade(self, nx, ny, nz, dx, dy, dz, lit=None):
        """Blinn-Phong shading (sphere/compute.wgsl:137-152): returns
        (r, g, b) planes."""
        from ..ops.megakernel import blinn_phong_planar

        cfg = self.config
        light = jnp.asarray(cfg.light_direction, jnp.float32)
        lam, spec = blinn_phong_planar(nx, ny, nz, dx, dy, dz, light, lit)
        shade = cfg.ambient + cfg.diffuse * lam
        return (cfg.color[0] * shade + cfg.specular * spec,
                cfg.color[1] * shade + cfg.specular * spec,
                cfg.color[2] * shade + cfg.specular * spec)

    def render_pass(self, state, origin, dx, dy, dz, near=0.01, far=100.0):
        """One reference-style pass: intersect, shade, depth-composite
        into (cr, cg, cb, depth) planar state (lib.rs:1106-1114)."""
        cr, cg, cb, depth = state
        t, hit, nx, ny, nz = self.intersect(origin, dx, dy, dz)
        pr, pg, pb = self.shade(nx, ny, nz, dx, dy, dz)
        d = to_nonlinear_depth(jnp.where(hit, t, 1.0), near, far)
        write = hit & (d < depth)
        return (jnp.where(write, pr, cr), jnp.where(write, pg, cg),
                jnp.where(write, pb, cb), jnp.where(write, d, depth))
