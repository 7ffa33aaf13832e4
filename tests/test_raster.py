"""Tests for the forward raster pipeline (ops/raster.py) — the
analogue of the reference's dead raster model path (src/shader.wgsl,
model.rs:130-197, lib.rs:400-421,679-729, texture.rs:13-54)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rust_wgpu_raytracing_tpu.ops.raster import (
    DepthTexture, RasterEncoder, RasterMaterial, RasterMesh, RasterModel,
    quat_axis_angle, quat_to_matrix, rasterize, reference_instance_grid)


def fullscreen_quad_clip(z=0.5, w=1.0, flip=False):
    """Two CCW (in NDC) triangles covering the whole viewport, with
    UVs mapping the unit square. flip=True reverses the winding."""
    # NDC corners (x, y): a=(-1,-1) b=(1,-1) c=(1,1) d=(-1,1)
    a = [-1.0, -1.0, z, 1.0]
    b = [1.0, -1.0, z, 1.0]
    c = [1.0, 1.0, z, 1.0]
    d = [-1.0, 1.0, z, 1.0]
    ua, ub, uc, ud = [0, 0], [1, 0], [1, 1], [0, 1]
    tris = [[a, b, c], [a, c, d]]
    uvs = [[ua, ub, uc], [ua, uc, ud]]
    if flip:
        tris = [[t[0], t[2], t[1]] for t in tris]
        uvs = [[u[0], u[2], u[1]] for u in uvs]
    t = np.asarray(tris, np.float32) * np.asarray([w, w, w, w], np.float32)
    return jnp.asarray(t), jnp.asarray(np.asarray(uvs, np.float32))


def checker_tex(n=8):
    yy, xx = np.mgrid[0:n, 0:n]
    c = ((yy + xx) % 2).astype(np.float32)
    return jnp.asarray(np.stack([c, c, c], axis=-1))


class TestRasterize:
    def test_fullscreen_quad_covers_everything(self):
        tc, tu = fullscreen_quad_clip(z=0.5)
        tex = jnp.ones((4, 4, 3)) * 0.75
        color, depth = rasterize(tc, tu, 32, 32, tex)
        np.testing.assert_allclose(np.asarray(color), 0.75, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(depth), 0.5, rtol=1e-6)

    def test_backface_cull(self):
        # reversed winding -> cull_mode Back drops every fragment
        tc, tu = fullscreen_quad_clip(z=0.5, flip=True)
        tex = jnp.ones((4, 4, 3))
        color, depth = rasterize(tc, tu, 16, 16, tex)
        assert float(np.abs(np.asarray(color)).max()) == 0.0
        np.testing.assert_array_equal(np.asarray(depth), 1.0)

    def test_depth_less_draw_order(self):
        # near quad then far quad in ONE draw: near wins everywhere
        near_c, near_u = fullscreen_quad_clip(z=0.25)
        far_c, far_u = fullscreen_quad_clip(z=0.75)
        tc = jnp.concatenate([near_c, far_c])
        tu = jnp.concatenate([near_u, far_u])
        tex = jnp.ones((2, 2, 3))
        _, depth = rasterize(tc, tu, 8, 8, tex)
        np.testing.assert_allclose(np.asarray(depth), 0.25)
        # far then near: near still wins (Less, write enabled)
        _, depth2 = rasterize(jnp.concatenate([far_c, near_c]),
                              jnp.concatenate([far_u, near_u]), 8, 8, tex)
        np.testing.assert_allclose(np.asarray(depth2), 0.25)

    def test_equal_z_first_draw_wins(self):
        # two full-screen quads at identical z with different UV
        # mappings: CompareFunction::Less fails the later fragments
        tc1, tu1 = fullscreen_quad_clip(z=0.5)
        tc2, tu2 = fullscreen_quad_clip(z=0.5)
        tex = checker_tex(8)
        tc = jnp.concatenate([tc1, tc2])
        tu = jnp.concatenate([tu1, tu2 * 0.0])  # 2nd samples texel (0,0)
        c_first, _ = rasterize(tc, tu, 16, 16, tex)
        c_alone, _ = rasterize(tc1, tu1, 16, 16, tex)
        np.testing.assert_array_equal(np.asarray(c_first),
                                      np.asarray(c_alone))

    def test_fragment_at_clear_depth_fails(self):
        # z == 1.0 fails Less against the 1.0 clear (wgpu semantics)
        tc, tu = fullscreen_quad_clip(z=1.0)
        color, depth = rasterize(tc, tu, 8, 8, jnp.ones((2, 2, 3)))
        assert float(np.abs(np.asarray(color)).max()) == 0.0

    def test_top_left_rule_no_double_cover_no_gap(self):
        # the two quad triangles share the a-c diagonal; with the
        # top-left rule each boundary pixel is owned by exactly one
        tc, tu = fullscreen_quad_clip(z=0.5)
        tex = jnp.ones((2, 2, 3))
        _, d_both = rasterize(tc, tu, 33, 33, tex)
        _, d_t0 = rasterize(tc[:1], tu[:1], 33, 33, tex)
        _, d_t1 = rasterize(tc[1:], tu[1:], 33, 33, tex)
        m0 = np.asarray(d_t0) < 1.0
        m1 = np.asarray(d_t1) < 1.0
        assert not np.any(m0 & m1), "diagonal pixels double-covered"
        assert np.all(m0 | m1), "gap along the shared diagonal"
        assert np.all(np.asarray(d_both) < 1.0)

    def test_analytic_half_viewport_triangle(self):
        # triangle covering the left-bottom NDC half (a, b, d): exact
        # coverage is the pixels strictly below the anti-diagonal
        a = [-1.0, -1.0, 0.5, 1.0]
        b = [1.0, -1.0, 0.5, 1.0]
        d = [-1.0, 1.0, 0.5, 1.0]
        tc = jnp.asarray([[a, b, d]], jnp.float32)
        tu = jnp.zeros((1, 3, 2))
        n = 16
        _, depth = rasterize(tc, tu, n, n, jnp.ones((2, 2, 3)))
        got = np.asarray(depth) < 1.0
        # screen: y down; NDC y=-1 is the BOTTOM row (y_s = n). The
        # hypotenuse runs corner-to-corner; pixel centers on it belong
        # to the triangle only under the fill rule (here: not top-left
        # -> excluded). Interior: x_s + (n - y_s) < n  =>  x < y.
        xx, yy = np.meshgrid(np.arange(n) + 0.5, np.arange(n) + 0.5)
        want = xx < yy
        np.testing.assert_array_equal(got, want)

    def test_perspective_correct_uv(self):
        # a quad with w=2 on its right edge: affine interpolation would
        # put u=0.5 at the screen midpoint; perspective-correct puts it
        # at 2/3 across. Sample a horizontal gradient texture and check.
        a = [-1.0, -1.0, 0.5, 1.0]
        b = [2.0, -2.0, 1.0, 2.0]  # NDC (1,-1) with w=2
        c = [2.0, 2.0, 1.0, 2.0]  # NDC (1,1)  with w=2
        d = [-1.0, 1.0, 0.5, 1.0]
        tris = jnp.asarray([[a, b, c], [a, c, d]], jnp.float32)
        uvs = jnp.asarray([[[0, 0], [1, 0], [1, 1]],
                           [[0, 0], [1, 1], [0, 1]]], jnp.float32)
        n = 64
        # 1-texel-high gradient, nearest-exact under bilinear on u
        grad = np.linspace(0, 1, 256, dtype=np.float32)
        tex = jnp.asarray(np.stack([grad] * 3, -1)[None].repeat(2, 0))
        color, _ = rasterize(tris, uvs, n, n, tex)
        row = np.asarray(color)[n // 2, :, 0]
        # u at screen fraction s: u = s*w0 / (w1 + s*(w0-w1)) with
        # w0=1, w1=2 (left/right): u(s) = s / (2 - s)
        s = (np.arange(n) + 0.5) / n
        want_u = s / (2.0 - s)
        assert np.abs(row - want_u).max() < 0.02
        # and it is NOT the affine ramp
        assert np.abs(row - s).max() > 0.1

    def test_composite_over_existing_attachments(self):
        tc, tu = fullscreen_quad_clip(z=0.5)
        tex = jnp.ones((2, 2, 3)) * 0.25
        base_c = jnp.ones((8, 8, 3)) * 0.9
        base_d = jnp.full((8, 8), 0.3)  # existing CLOSER depth
        color, depth = rasterize(tc, tu, 8, 8, tex,
                                 color=base_c, depth=base_d)
        # z=0.5 fails Less vs 0.3 -> attachments unchanged
        np.testing.assert_allclose(np.asarray(color), 0.9, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(depth), 0.3, rtol=1e-6)


class TestInstanceGrid:
    def test_shape_and_origin_identity(self):
        g = reference_instance_grid()
        assert g.shape == (100, 4, 4)
        # the (x=5, z=5) instance sits at the origin: rotation is the
        # 0-degree z-axis quaternion = identity (lib.rs:409-414)
        i = 5 * 10 + 5
        np.testing.assert_allclose(g[i], np.eye(4), atol=1e-7)

    def test_translation_column(self):
        g = reference_instance_grid()
        # instance (x=0, z=0): position = 3 * (0 - 5) on both axes
        np.testing.assert_allclose(g[0][:3, 3], [-15.0, 0.0, -15.0])

    def test_quaternion_matches_rodrigues(self):
        # independent check of cgmath quat->matrix via Rodrigues
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        ang = np.deg2rad(45.0)
        K = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        rodrigues = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K
        m = quat_to_matrix(quat_axis_angle(axis, 45.0))
        np.testing.assert_allclose(m[:3, :3], rodrigues, atol=1e-12)
        # rotation about the instance's own position axis keeps the
        # position fixed: R @ p == p
        p = axis * 7.0
        np.testing.assert_allclose(m[:3, :3] @ p, p, atol=1e-12)


class TestDepthCompare:
    def test_lessequal_at_texel_centers(self):
        d = DepthTexture(jnp.asarray([[0.2, 0.8], [0.5, 0.5]]))
        # texel centers: (u,v) = ((x+.5)/2, (y+.5)/2)
        u = jnp.asarray([0.25, 0.75, 0.25, 0.75])
        v = jnp.asarray([0.25, 0.25, 0.75, 0.75])
        got = np.asarray(d.sample_compare(u, v, jnp.asarray(0.5)))
        np.testing.assert_allclose(got, [0.0, 1.0, 1.0, 1.0])

    def test_pcf_filters_between_texels(self):
        d = DepthTexture(jnp.asarray([[0.0, 1.0]]))
        # halfway between the two texels: ref passes vs one of them
        got = float(d.sample_compare(jnp.asarray(0.5), jnp.asarray(0.5),
                                     jnp.asarray(0.5)))
        assert got == pytest.approx(0.5)

    def test_clamp_to_edge(self):
        d = DepthTexture(jnp.asarray([[0.0, 1.0]]))
        assert float(d.sample_compare(jnp.asarray(-3.0), jnp.asarray(0.5),
                                      jnp.asarray(0.5))) == 0.0
        assert float(d.sample_compare(jnp.asarray(4.0), jnp.asarray(0.5),
                                      jnp.asarray(0.5))) == 1.0


class TestDrawModel:
    def _tri_mesh(self):
        return RasterMesh(
            name="tri",
            positions=np.asarray([[-1, -1, 0], [1, -1, 0], [0, 1, 0]],
                                 np.float32),
            tex_coords=np.asarray([[0, 0], [1, 0], [0.5, 1]], np.float32),
            normals=np.zeros((3, 3), np.float32),
            faces=np.asarray([[0, 1, 2]], np.int32))

    def _ident_vp(self):
        return np.eye(4, dtype=np.float32)

    def test_draw_mesh_single(self):
        enc = RasterEncoder(16, 16)
        mat = RasterMaterial("m", np.ones((2, 2, 3), np.float32))
        enc.draw_mesh(self._tri_mesh(), mat, self._ident_vp())
        d = np.asarray(enc.depth.data)
        assert (d < 1.0).any() and (d == 1.0).any()

    def test_draw_model_instanced_reference_grid(self):
        # the reference's exact dead configuration: the model drawn
        # over the 10x10 quaternion grid with the forward camera
        # (OPENGL_TO_WGPU @ proj @ view, lib.rs:89-91)
        from rust_wgpu_raytracing_tpu.config import CameraConfig
        from rust_wgpu_raytracing_tpu.core.camera import Camera
        from rust_wgpu_raytracing_tpu.core import math3d

        cam = Camera.from_config(
            CameraConfig(eye=(0.0, 12.0, 20.0), target=(0.0, 0.0, 0.0)),
            aspect=1.0)
        vp = (math3d.OPENGL_TO_WGPU @ cam.view_proj_matrix()).astype(
            np.float32)
        mesh = self._tri_mesh()
        model = RasterModel(
            meshes=[mesh],
            materials=[RasterMaterial("m", np.full((2, 2, 3), 0.5,
                                                   np.float32))])
        enc = RasterEncoder(48, 48)
        enc.draw_model_instanced(model, reference_instance_grid(), vp)
        d = np.asarray(enc.depth.data)
        c = np.asarray(enc.color)
        cover = (d < 1.0)
        assert cover.sum() > 40  # many instances visible
        assert np.all(np.isfinite(c))
        np.testing.assert_allclose(c[cover], 0.5, atol=1e-6)
        assert d[cover].min() > 0.0

    def test_load_model_raster_suzanne(self):
        from rust_wgpu_raytracing_tpu.config import resolve_asset

        try:
            resolve_asset("suzanne_lowpoly.obj")
        except (FileNotFoundError, KeyError):
            pytest.skip("reference assets unavailable")
        from rust_wgpu_raytracing_tpu.ops.raster import load_model_raster

        model = load_model_raster("suzanne_lowpoly.obj")
        assert model.meshes[0].faces.shape == (111, 3)
        assert model.meshes[0].positions.shape[1] == 3
        # raw (un-flipped) UVs, a diffuse texture decoded per material
        assert model.materials[0].diffuse.ndim == 3
