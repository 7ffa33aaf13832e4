"""Config system tests (SURVEY §5.6: the subsystem the reference lacks)."""

import dataclasses as dc

import numpy as np
import pytest

from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig,
                                             SphereConfig, cube_scene,
                                             reference_scene, resolve_asset)


class TestSceneConfig:
    def test_json_roundtrip(self):
        cfg = SceneConfig(
            spheres=(SphereConfig(center=(1.0, 2.0, -3.0), radius=0.5,
                                  color=(0.1, 0.2, 0.3)),),
            meshes=(MeshConfig(obj_path="builtin:cube", scale=2.0,
                               translation=(0.0, -1.0, 0.0),
                               normal_mapping=True),),
            background=(0.1, 0.0, 0.0),
            camera=CameraConfig(eye=(0.0, 1.0, 5.0), fovy_deg=45.0),
            render=RenderConfig(width=320, height=200, shadows=True,
                                pt_bounces=2),
        )
        rt = SceneConfig.from_json(cfg.to_json())
        assert rt == cfg

    def test_reference_scene_defaults(self):
        """The canned reference scene must pin the reference's hardcoded
        constants (src/lib.rs:352-361, 532-534, 1248)."""
        cfg = reference_scene()
        assert cfg.render.width == cfg.render.height == 600
        assert cfg.camera.fovy_deg == 60.0
        assert cfg.camera.znear == 0.1
        assert cfg.render.kernel_near == 0.01  # quirk: != camera znear
        np.testing.assert_allclose(cfg.spheres[0].center, (0.6, 0.5, -4.0))
        np.testing.assert_allclose(cfg.spheres[1].center, (0.4, 0.4, -3.0))
        np.testing.assert_allclose(cfg.spheres[0].light_direction,
                                   (1.0, -5.0, 1.0))
        assert cfg.meshes[0].obj_path == "suzanne_lowpoly.obj"
        np.testing.assert_allclose(cfg.meshes[0].light_direction,
                                   (1.0, -1.0, -5.0))

    def test_resolve_asset_missing(self):
        with pytest.raises(FileNotFoundError):
            resolve_asset("definitely_not_there.obj")

    def test_cube_scene(self):
        cfg = cube_scene(64, 48)
        assert cfg.render.width == 64 and cfg.render.height == 48
        assert cfg.meshes[0].obj_path == "cube.obj"


class TestRendererReconfig:
    def test_resize_rebuilds_frame(self):
        from rust_wgpu_raytracing_tpu.runtime.renderer import Renderer

        cfg = SceneConfig(
            spheres=(SphereConfig(center=(0.0, 0.0, -3.0), radius=0.8),),
            render=RenderConfig(width=32, height=32))
        r = Renderer(cfg, backend="oracle")
        c1, _ = r.render()
        assert np.asarray(c1).shape == (32, 32, 3)
        r.resize(64, 16)
        c2, d2 = r.render()
        assert np.asarray(c2).shape == (16, 64, 3)
        assert r.camera.aspect == 4.0  # aspect-lag bug fixed (uses NEW size)
        # sphere still visible after the resize
        assert (np.asarray(d2) < 1).any()

    def test_orbit_animator_full_circle(self):
        from rust_wgpu_raytracing_tpu.core.camera import Camera
        from rust_wgpu_raytracing_tpu.core.controls import OrbitAnimator

        cam = Camera.from_config(CameraConfig(eye=(0.0, 0.0, 2.0),
                                              target=(0.0, 0.0, -1.0)),
                                 aspect=1.0)
        anim = OrbitAnimator()
        r0 = np.linalg.norm(cam.target - cam.eye)
        eyes = []
        for _ in range(200):
            anim.step(cam)
            eyes.append(cam.eye.copy())
        # radius preserved over a long scripted orbit
        np.testing.assert_allclose(
            np.linalg.norm(cam.target - np.asarray(eyes), axis=1), r0,
            rtol=1e-6)
        # the eye actually sweeps both x signs (goes around)
        xs = np.asarray(eyes)[:, 0]
        assert xs.max() > 0.5 * r0 and xs.min() < -0.5 * r0


class TestMinimalJson:
    def test_from_json_accepts_partial_configs(self):
        """Hand-written configs may omit any field with a default
        (regression: from_json indexed optional fields unconditionally
        and crashed on exactly the minimal configs a config system
        exists to accept)."""
        cfg = SceneConfig.from_json(
            '{"spheres": [{"center": [0, 0, -3], "radius": 1.0}]}')
        assert cfg.spheres[0].radius == 1.0
        assert cfg.spheres[0].color == SphereConfig(
            center=(0, 0, -3), radius=1.0).color
        assert cfg.render.width > 0

    def test_rwrt_assets_read_per_call(self, tmp_path, monkeypatch):
        from rust_wgpu_raytracing_tpu.config import resolve_asset

        (tmp_path / "thing.obj").write_text("v 0 0 0\n")
        monkeypatch.setenv("RWRT_ASSETS", str(tmp_path))
        assert resolve_asset("thing.obj") == str(tmp_path / "thing.obj")
