"""Mip-chain minification (ops/miptex.py) — extension tests.

The parity mandate is the OFF state (the reference forces mip 0,
triangle_list/compute.wgsl:225, and every oracle/golden test runs with
mip off); these tests pin the pyramid build, the exact lod<=0
degeneration to the bilinear level-0 tap, level-1 sampling against a
host reference, and the end-to-end aliasing reduction of mip=True.
"""

import dataclasses as dc
import os

import jax.numpy as jnp
import numpy as np
import pytest

from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig,
                                             reference_scene)
from rust_wgpu_raytracing_tpu.core.camera import Camera
from rust_wgpu_raytracing_tpu.core.scene import Scene, _mip_chain
from rust_wgpu_raytracing_tpu.ops.megakernel import (render_megakernel,
                                                     sample_packed_texture)
from rust_wgpu_raytracing_tpu.ops.miptex import (pixel_dir_delta,
                                                 sample_mip_trilinear)

REF_RES = "/root/reference/res"
needs_assets = pytest.mark.skipif(
    not os.path.isdir(REF_RES), reason="reference assets not mounted")


def checker_quad_scene(tmp_path, tex_px=16, z=-3.0, scale=1.0,
                       width=128, height=128):
    """Standalone textured quad: 2 triangles spanning [-1,1]^2 with uv
    [0,1]^2 and a generated checkerboard map_Kd."""
    from PIL import Image

    yy, xx = np.mgrid[0:tex_px, 0:tex_px]
    cell = ((yy + xx) % 2).astype(np.uint8)
    rgb = np.stack([cell * 255] * 3, axis=-1)
    tex = tmp_path / "checker.png"
    Image.fromarray(rgb, "RGB").save(tex)
    (tmp_path / "quad.mtl").write_text(
        "newmtl checker\nKa 0.0 0.0 0.0\nKd 0.8 0.8 0.8\n"
        f"Ks 0.0 0.0 0.0\nmap_Kd {tex}\n")
    (tmp_path / "quad.obj").write_text(
        "mtllib quad.mtl\n"
        "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl checker\n"
        "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n")
    return SceneConfig(
        meshes=(MeshConfig(obj_path=str(tmp_path / "quad.obj"),
                           translation=(0.0, 0.0, z), scale=scale,
                           light_direction=(0.0, 0.0, -1.0)),),
        camera=CameraConfig(eye=(0.0, 0.0, 0.0), target=(0.0, 0.0, -1.0)),
        render=RenderConfig(width=width, height=height))


class TestPyramidBuild:
    def test_chain_shapes_and_means(self):
        img = np.arange(4 * 4 * 3, dtype=np.float32).reshape(4, 4, 3)
        chain = _mip_chain(img)
        assert [c.shape[:2] for c in chain] == [(4, 4), (2, 2), (1, 1)]
        np.testing.assert_allclose(
            chain[1][0, 0], img[:2, :2].mean(axis=(0, 1)), rtol=1e-6)
        np.testing.assert_allclose(
            chain[2][0, 0], chain[1].mean(axis=(0, 1)), rtol=1e-6)

    def test_odd_sizes_replicate_edges(self):
        img = np.random.default_rng(0).uniform(
            size=(3, 5, 3)).astype(np.float32)
        chain = _mip_chain(img)
        # 3x5 -> (pad to 4x6) 2x3 -> (pad 2x4) 1x2 -> 1x1
        assert [c.shape[:2] for c in chain] == [(3, 5), (2, 3), (1, 2),
                                                (1, 1)]

    @needs_assets
    def test_scene_tables(self):
        scene = Scene.build(reference_scene(64, 64))
        sd = scene.data
        assert sd.mip_levels >= 2
        # level-0 table row mirrors the parity tables
        np.testing.assert_array_equal(np.asarray(sd.mat_mip_h[:, 0]),
                                      np.asarray(sd.mat_tex_h))
        np.testing.assert_array_equal(np.asarray(sd.mat_mip_w[:, 0]),
                                      np.asarray(sd.mat_tex_w))
        # deep levels clamp to 1x1, never 0
        assert np.asarray(sd.mat_mip_h).min() >= 1.0
        assert np.asarray(sd.mat_mip_w).min() >= 1.0


class TestSampling:
    def test_lod0_is_bitwise_the_bilinear_tap(self, tmp_path):
        cfg = checker_quad_scene(tmp_path)
        sd = Scene.build(cfg).data
        rng = np.random.default_rng(1)
        n = 256
        u = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        v = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        mat = jnp.zeros((n,), jnp.float32)
        base = jnp.zeros((n,), jnp.int32) + sd.mat_tex_base[0]
        h = jnp.full((n,), sd.mat_tex_h[0])
        w = jnp.full((n,), sd.mat_tex_w[0])
        ref = sample_packed_texture(sd.tex_packed, base, h, w, u, v,
                                    interpret=True)
        # lod far below 0 must clamp to exactly the level-0 tap
        got = sample_mip_trilinear(sd, mat, jnp.full((n,), -7.0), u, v,
                                   interpret=True)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))

    def test_lod1_matches_host_level1_bilinear(self, tmp_path):
        cfg = checker_quad_scene(tmp_path, tex_px=8)
        sd = Scene.build(cfg).data
        from rust_wgpu_raytracing_tpu.io.textures import load_texture_file

        lv1 = _mip_chain(load_texture_file(
            str(tmp_path / "checker.png")).rgb_linear)[1]  # (4,4,3)
        # sample at texel centers of level 1: bilinear == the texel
        n = 16
        yy, xx = np.mgrid[0:4, 0:4]
        u = jnp.asarray((xx.ravel() + 0.5) / 4.0, jnp.float32)
        v = jnp.asarray((yy.ravel() + 0.5) / 4.0, jnp.float32)
        mat = jnp.zeros((n,), jnp.float32)
        got = sample_mip_trilinear(sd, mat, jnp.ones((n,)), u, v,
                                   interpret=True)
        expect = lv1[yy.ravel(), xx.ravel()]  # (16,3)
        for ch in range(3):
            np.testing.assert_allclose(np.asarray(got[ch]),
                                       expect[:, ch], atol=2e-4)

    def test_pixel_dir_delta_rows(self):
        d = jnp.asarray(np.arange(8, dtype=np.float32))
        z = jnp.zeros((8,))
        out = np.asarray(pixel_dir_delta(d, z, z, 4))
        np.testing.assert_allclose(out, 1.0)  # unit steps, edge reused


class TestRenderMip:
    def test_close_view_matches_parity_at_u8(self, tmp_path):
        cfg = checker_quad_scene(tmp_path, z=-2.0)
        sd = Scene.build(cfg).data
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = jnp.asarray(cam.uniforms().flat())
        kw = dict(width=128, height=128, interpret=True)
        c0, d0 = render_megakernel(sd, uni, **kw)
        c1, d1 = render_megakernel(sd, uni, mip=True, **kw)
        diff = np.abs(np.asarray(c0) - np.asarray(c1)) * 255.0
        assert diff.max() <= 1.0, f"close-range mip diff {diff.max()}"
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))

    def test_far_view_reduces_aliasing(self, tmp_path):
        # a 64px checker quad squeezed into ~16 screen pixels: mip off
        # aliases (pixels snap to pure black/white), mip on converges
        # toward the gray mean
        cfg = checker_quad_scene(tmp_path, tex_px=64, z=-40.0, scale=8.0)
        sd = Scene.build(cfg).data
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = jnp.asarray(cam.uniforms().flat())
        kw = dict(width=128, height=128, interpret=True)
        c0, _ = render_megakernel(sd, uni, **kw)
        c1, _ = render_megakernel(sd, uni, mip=True, **kw)
        a0 = np.asarray(c0)
        a1 = np.asarray(c1)
        hit = a0.sum(axis=-1) > 0
        assert hit.sum() > 50  # the quad is on screen
        # aliasing metric: per-pixel spread around the local mean
        s0 = a0[hit][:, 0].std()
        s1 = a1[hit][:, 0].std()
        assert s1 < 0.5 * s0, (s0, s1)
        # and the mip frame stays centered on the true mean color
        assert abs(a1[hit][:, 0].mean() - a0[hit][:, 0].mean()) < 0.15

    def test_mip_ignored_without_pyramid(self):
        # meshless scene: mip flag must be a no-op, not a crash
        cfg = SceneConfig(render=RenderConfig(width=64, height=64))
        sd = Scene.build(cfg).data
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = jnp.asarray(cam.uniforms().flat())
        c, _ = render_megakernel(sd, uni, width=64, height=64, mip=True,
                                 interpret=True)
        assert np.asarray(c).shape == (64, 64, 3)
