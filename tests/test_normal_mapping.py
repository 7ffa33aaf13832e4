"""Normal mapping tests (BASELINE config 2 capability) + the combined
cube+suzanne scene (config 3 capability)."""

import dataclasses as dc
import os

import jax.numpy as jnp
import numpy as np
import pytest

from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig)
from rust_wgpu_raytracing_tpu.core.camera import Camera
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.ops.megakernel import render_megakernel
from rust_wgpu_raytracing_tpu.ops.oracle import render_oracle

REF_RES = "/root/reference/res"
needs_assets = pytest.mark.skipif(
    not os.path.isdir(REF_RES), reason="reference assets not mounted")


@needs_assets
class TestNormalMapping:
    def cube_cfg(self, nm):
        return SceneConfig(
            meshes=(MeshConfig(obj_path="cube.obj",
                               translation=(0.0, 0.0, -3.0), scale=0.6,
                               normal_mapping=nm),),
            render=RenderConfig(width=48, height=48))

    def test_scene_has_bump_data(self):
        scene = Scene.build(self.cube_cfg(True))
        assert int(np.asarray(scene.data.mat_bump)[0]) >= 0  # cube-normal.png
        tang = np.asarray(scene.data.tri_tangent)
        valid = np.asarray(scene.data.tri_valid) > 0
        # real faces have unit tangents
        norms = np.linalg.norm(tang[valid], axis=1)
        assert (np.abs(norms - 1.0) < 1e-4).all()

    def test_bump_changes_shading(self):
        cfg = self.cube_cfg(True)
        scene = Scene.build(cfg)
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = cam.uniforms().flat()
        # cube.mtl Ka=(1,1,1) saturates the quantized image to white, so
        # compare UNQUANTIZED (pre-clamp) radiance
        kw = dict(width=48, height=48, quantize=False)
        flat, d = render_oracle(scene.data, uni, normal_mapping=False, **kw)
        bump, _ = render_oracle(scene.data, uni, normal_mapping=True, **kw)
        hit = np.asarray(d) < 1.0
        diff = np.abs(np.asarray(flat) - np.asarray(bump)).sum(-1)
        # normal perturbation visibly changes lit pixels
        assert diff[hit].max() > 0.01

    def test_megakernel_matches_oracle_with_nm(self):
        cfg = self.cube_cfg(True)
        scene = Scene.build(cfg)
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = cam.uniforms().flat()
        kw = dict(width=48, height=48, normal_mapping=True)
        co, _ = render_oracle(scene.data, uni, **kw)
        cm, _ = render_megakernel(scene.data, uni, interpret=True, **kw)
        diff = np.abs(np.asarray(co) - np.asarray(cm)) * 255.0
        assert diff.max() <= 1.5, f"max u8 diff {diff.max()}"

    def test_suzanne_nm_mode_parity(self):
        """Config 2: suzanne with normal_mapping. NOTE: suzanne_lowpoly's
        OBJ exports FLAT per-face vn (all corners of a face share one
        normal index), so vertex-normal smoothing equals flat shading on
        this asset; the test pins megakernel<->oracle parity in nm mode."""
        cfg = SceneConfig(
            meshes=(MeshConfig(obj_path="suzanne_lowpoly.obj",
                               normal_mapping=True),),
            camera=CameraConfig(eye=(0.0, 0.0, 2.5)),
            render=RenderConfig(width=48, height=48))
        scene = Scene.build(cfg)
        assert int(np.asarray(scene.data.mat_bump)[0]) == -1
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = cam.uniforms().flat()
        kw = dict(width=48, height=48)
        smooth, _ = render_oracle(scene.data, uni, normal_mapping=True, **kw)
        cm, _ = render_megakernel(scene.data, uni, interpret=True,
                                  normal_mapping=True, **kw)
        diff = np.abs(np.asarray(smooth) - np.asarray(cm)) * 255.0
        assert diff.max() <= 1.5

    def test_smooth_vertex_normals_synthetic(self, tmp_path):
        """A triangle with diverging per-corner vn must shade smoothly
        (different from flat) under normal_mapping."""
        obj = tmp_path / "smooth.obj"
        obj.write_text(
            "v -1 -1 -2\nv 1 -1 -2\nv 0 1 -2\n"
            "vt 0 0\nvt 1 0\nvt 0 1\n"
            "vn -0.5 -0.5 0.7071\nvn 0.5 -0.5 0.7071\nvn 0 0.7071 0.7071\n"
            "f 1/1/1 2/2/2 3/3/3\n")
        cfg = SceneConfig(meshes=(MeshConfig(obj_path=str(obj)),),
                          render=RenderConfig(width=32, height=32))
        scene = Scene.build(cfg)
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = cam.uniforms().flat()
        kw = dict(width=32, height=32, quantize=False)
        flat, d = render_oracle(scene.data, uni, normal_mapping=False, **kw)
        smooth, _ = render_oracle(scene.data, uni, normal_mapping=True, **kw)
        hit = np.asarray(d) < 1.0
        diff = np.abs(np.asarray(flat) - np.asarray(smooth)).sum(-1)
        assert diff[hit].max() > 0.02
        # megakernel agrees with the oracle in nm mode
        cm, _ = render_megakernel(scene.data, uni, interpret=True,
                                  normal_mapping=True, **kw)
        np.testing.assert_allclose(np.asarray(cm), np.asarray(smooth),
                                   atol=2e-3)


@needs_assets
class TestCombinedScene:
    def test_cube_plus_suzanne(self):
        """BASELINE config 3 scene: cube + suzanne in one soup with two
        materials/textures; megakernel matches oracle with shadows."""
        cfg = SceneConfig(
            meshes=(MeshConfig(obj_path="suzanne_lowpoly.obj"),
                    MeshConfig(obj_path="cube.obj",
                               translation=(0.0, -2.2, 0.0), scale=1.2)),
            camera=CameraConfig(eye=(0.0, 0.5, 3.0)),
            render=RenderConfig(width=48, height=48, shadows=True))
        scene = Scene.build(cfg)
        assert scene.data.mat_ambient.shape[0] == 2  # two materials
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = cam.uniforms().flat()
        kw = dict(width=48, height=48, shadows=True)
        co, do = render_oracle(scene.data, uni, **kw)
        cm, _ = render_megakernel(scene.data, uni, interpret=True, **kw)
        hit = np.asarray(do) < 1.0
        assert hit.mean() > 0.1  # both objects visible
        diff = np.abs(np.asarray(co) - np.asarray(cm)) * 255.0
        assert diff.max() <= 1.5, f"max u8 diff {diff.max()}"
