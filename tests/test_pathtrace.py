"""Path tracer tests (BASELINE config 4 capability)."""

import dataclasses as dc
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig,
                                             SphereConfig)
from rust_wgpu_raytracing_tpu.core.camera import Camera
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.ops.pathtrace import render_pathtrace

KEY = jax.random.PRNGKey(7)


def pt_scene(W=32, H=32):
    cfg = SceneConfig(
        spheres=(SphereConfig(center=(0.0, 0.0, -3.0), radius=0.7,
                              color=(0.8, 0.2, 0.2)),),
        meshes=(MeshConfig(obj_path="builtin:cube",
                           translation=(0.0, -1.8, -3.0), scale=2.0),),
        camera=CameraConfig(),
        render=RenderConfig(width=W, height=H),
    )
    return Scene.build(cfg), cfg


class TestPathtrace:
    def test_runs_and_finite(self):
        scene, cfg = pt_scene()
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        c = render_pathtrace(scene.data, cam.uniforms().flat(), KEY,
                             width=32, height=32, bounces=2, spp=2,
                             interpret=True)
        c = np.asarray(c)
        assert c.shape == (32, 32, 3)
        assert np.isfinite(c).all()
        assert (c >= 0).all()
        assert c.sum() > 0  # something is lit

    def test_deterministic_same_key(self):
        scene, cfg = pt_scene(16, 16)
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = cam.uniforms().flat()
        kw = dict(width=16, height=16, bounces=1, spp=1, interpret=True)
        c1 = render_pathtrace(scene.data, uni, KEY, **kw)
        c2 = render_pathtrace(scene.data, uni, KEY, **kw)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    def test_bounces_add_energy(self):
        """Indirect light is non-negative: more bounces never darken."""
        scene, cfg = pt_scene(24, 24)
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = cam.uniforms().flat()
        c0 = np.asarray(render_pathtrace(
            scene.data, uni, KEY, width=24, height=24, bounces=0, spp=4,
            interpret=True)).sum()
        c2 = np.asarray(render_pathtrace(
            scene.data, uni, KEY, width=24, height=24, bounces=2, spp=4,
            interpret=True)).sum()
        assert c2 >= c0 - 1e-4

    def test_zero_bounce_matches_direct_lambert(self):
        """bounces=0: the sphere's lit (upper) side must be brighter than
        its shadowed (lower) side — light dir (1,-5,1) comes from above."""
        cfg = SceneConfig(
            spheres=(SphereConfig(center=(0.0, 0.0, -2.0), radius=1.5,
                                  color=(0.8, 0.2, 0.2)),),
            render=RenderConfig(width=32, height=32))
        scene = Scene.build(cfg)
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        c = np.asarray(render_pathtrace(
            scene.data, cam.uniforms().flat(), KEY, width=32, height=32,
            bounces=0, spp=4, interpret=True)) / 4.0
        lum = c.sum(-1)
        # texel row 0 = screen bottom; upper half of the sphere = later rows
        top = lum[17:27, 10:22].mean()
        bottom = lum[5:15, 10:22].mean()
        assert top > bottom * 1.5 + 1e-5


class TestCompaction:
    def test_uniform_at_matches_jax(self):
        """uniform_at(key, iota)[i] must be BIT-identical to
        jax.random.uniform(key, (n,))[i] — the compacted wavefront
        draws its bounce uniforms by lane id through this replica of
        the partitionable threefry. If a JAX upgrade changes the PRNG
        construction this fails loudly (ops/pathtrace.py::uniform_at)."""
        from rust_wgpu_raytracing_tpu.ops.pathtrace import uniform_at

        for seed in (0, 7, 123456):
            key = jax.random.PRNGKey(seed)
            for n in (8, 129, 4096):
                ref = np.asarray(jax.random.uniform(key, (n,)))
                ids = jnp.arange(n, dtype=jnp.int32)
                got = np.asarray(uniform_at(key, ids))
                np.testing.assert_array_equal(got, ref)
                # and by arbitrary (shuffled, repeated) ids
                pick = np.asarray([3, 3, n - 1, 0, 5], np.int32)
                got2 = np.asarray(uniform_at(key, jnp.asarray(pick)))
                np.testing.assert_array_equal(got2, ref[pick])

    def test_compact_bitidentical_to_full(self):
        """compact_cap must not change a single bit: cap=r engages the
        compacted branch for sure (live count <= r always), cap=8
        overflows into the in-jit full fallback."""
        scene, cfg = pt_scene(32, 32)
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = cam.uniforms().flat()
        kw = dict(width=32, height=32, bounces=2, spp=2, interpret=True)
        ref = np.asarray(render_pathtrace(scene.data, uni, KEY, **kw))
        compacted = np.asarray(render_pathtrace(
            scene.data, uni, KEY, compact_cap=32 * 32, **kw))
        np.testing.assert_array_equal(compacted, ref)
        overflow = np.asarray(render_pathtrace(
            scene.data, uni, KEY, compact_cap=8, **kw))
        np.testing.assert_array_equal(overflow, ref)

    def test_compact_mesh_only_scene(self):
        """No spheres (the config-4 shape), 64x64 = four 1024-lane ray
        tiles with the cube off-center so some tiles are DEAD — the
        tile-compaction actually drops tiles here."""
        cfg = SceneConfig(
            meshes=(MeshConfig(obj_path="builtin:cube",
                               translation=(0.8, 0.8, -3.0),
                               scale=0.8),),
            render=RenderConfig(width=64, height=64))
        scene = Scene.build(cfg)
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = cam.uniforms().flat()
        kw = dict(width=64, height=64, bounces=3, spp=1, interpret=True,
                  background=(0.1, 0.2, 0.3))
        ref = np.asarray(render_pathtrace(scene.data, uni, KEY, **kw))
        got = np.asarray(render_pathtrace(scene.data, uni, KEY,
                                          compact_cap=2 * 1024, **kw))
        np.testing.assert_array_equal(got, ref)


class TestRendererProgressive:
    def test_progressive_accumulates_and_resets(self):
        from rust_wgpu_raytracing_tpu.runtime.renderer import Renderer

        scene, cfg = pt_scene(16, 16)
        cfg = dc.replace(cfg, render=dc.replace(cfg.render, pt_bounces=1,
                                                pt_spp=8))
        r = Renderer(cfg, backend="oracle")
        r.render()
        assert r._spp_done == 1
        r.render()
        assert r._spp_done == 2
        # orbiting resets accumulation
        r.controller.keys.right = True
        r.update()
        assert r._spp_done == 0
