"""Tests for the device-limits validator (runtime/limits.py) — the
wasm "downlevel limits" quirk (src/lib.rs:136-170)."""

import dataclasses as dc

import pytest

from rust_wgpu_raytracing_tpu.config import (SceneConfig, SphereConfig,
                                             RenderConfig, reference_scene)
from rust_wgpu_raytracing_tpu.runtime.limits import (
    build_wasm_limits, default_limits, validate_limits)


def sphere_only_scene(w=600, h=600):
    return SceneConfig(
        spheres=(SphereConfig(center=(0.6, 0.5, -4.0), radius=0.4),),
        render=RenderConfig(width=w, height=h))


class TestWasmLimits:
    def test_exact_reference_values(self):
        lm = build_wasm_limits()
        # the hand-set values of src/lib.rs:137-149
        assert lm.max_uniform_buffers_per_shader_stage == 11
        assert lm.max_storage_buffers_per_shader_stage == 0
        assert lm.max_storage_textures_per_shader_stage == 0
        assert lm.max_compute_workgroups_per_dimension == 0
        assert lm.max_storage_buffer_binding_size == 0
        assert lm.max_vertex_buffer_array_stride == 255
        # the downlevel-default block (src/lib.rs:152-168)
        assert lm.max_texture_dimension_2d == 4096
        assert lm.max_uniform_buffer_binding_size == 16 << 10
        assert lm.max_buffer_size == 1 << 28

    def test_reference_scene_fails_under_wasm_limits(self):
        # the QUIRK: under the reference's own wasm limits, its live
        # mesh pipeline (storage buffers) and even the sphere storage
        # textures cannot validate (SURVEY §2.2) — the wasm build only
        # ever supported the sphere-only milestone, and not at runtime
        bad = validate_limits(reference_scene(), build_wasm_limits())
        assert any("storage buffers" in b for b in bad)
        assert any("storage textures" in b for b in bad)
        assert any("dispatch" in b for b in bad)

    def test_sphere_only_scene_also_fails(self):
        bad = validate_limits(sphere_only_scene(), build_wasm_limits())
        assert any("storage textures" in b for b in bad)
        # but it does NOT trip the mesh storage-buffer checks
        assert not any("storage buffers" in b for b in bad)

    def test_everything_passes_under_native_defaults(self):
        assert validate_limits(reference_scene(), default_limits()) == []
        assert validate_limits(sphere_only_scene(), default_limits()) == []

    def test_texture_dimension_limit(self):
        # an 8K framebuffer exceeds the wasm 4096-texel 2D limit but
        # fits the native default (8192)
        cfg = reference_scene(7680, 4320)
        bad = validate_limits(cfg, build_wasm_limits())
        assert any("framebuffer" in b for b in bad)
        assert validate_limits(cfg, default_limits()) == []

    def test_renderer_refuses_invalid_limits(self):
        from rust_wgpu_raytracing_tpu.runtime.renderer import Renderer

        with pytest.raises(ValueError, match="does not validate"):
            Renderer(
                dc.replace(reference_scene(64, 64),
                           meshes=(dc.replace(
                               reference_scene().meshes[0],
                               obj_path="builtin:cube"),)),
                backend="oracle", limits=build_wasm_limits())
