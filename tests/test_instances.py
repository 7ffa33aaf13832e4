"""Instancing + per-frame refit tests (BASELINE config 5 capability)."""

import jax.numpy as jnp
import numpy as np

from rust_wgpu_raytracing_tpu.config import MeshConfig
from rust_wgpu_raytracing_tpu.core.scene import CULL_BLOCK
from rust_wgpu_raytracing_tpu.ops import intersect as oracle_isect
from rust_wgpu_raytracing_tpu.ops.instances import (InstancedScene,
                                                    grid_transforms)


def build(n=4):
    return InstancedScene.from_config(
        MeshConfig(obj_path="builtin:cube"), n)


class TestInstancedScene:
    def test_instantiate_shapes(self):
        inst = build(4)
        sd = inst.instantiate(grid_transforms(4, spacing=3.0, z=-8.0))
        f = sd.tri_p0.shape[0]
        assert f == 4 * inst.base_faces.shape[0]
        assert sd.blk_lo.shape[0] == f // CULL_BLOCK
        # num_faces counts REAL faces (padding is interleaved per
        # instance, so it is a count, not a prefix length)
        assert sd.num_faces == 4 * inst.fb_real

    def test_identity_instance_matches_base(self):
        inst = build(1)
        ident = np.zeros((1, 3, 4), np.float32)
        ident[0, :, :3] = np.eye(3)
        sd = inst.instantiate(ident)
        # ray down -z from origin must hit the cube at z=0.5 (unit cube
        # at origin)
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        th = oracle_isect.intersect_tris(sd, jnp.asarray([0.0, 0.0, 3.0]), d)
        np.testing.assert_allclose(np.asarray(th.t)[0], 2.5, rtol=1e-5)

    def test_refit_moves_aabbs(self):
        inst = build(2)
        t0 = grid_transforms(2, spacing=2.0, z=-5.0)
        t1 = t0.copy()
        t1[:, 0, 3] += 10.0  # shift +x
        sd0 = inst.instantiate(t0)
        sd1 = inst.instantiate(t1)
        lo0 = np.asarray(sd0.blk_lo)
        lo1 = np.asarray(sd1.blk_lo)
        real = np.isfinite(lo0[:, 0])
        np.testing.assert_allclose(lo1[real, 0] - lo0[real, 0], 10.0,
                                   atol=1e-4)

    def test_rotation_rotates_hits(self):
        inst = build(1)
        # 90-degree y-rotation moves the +z face to +x
        t = grid_transforms(1, z=0.0, angle=np.pi / 2)
        sd = inst.instantiate(t)
        d = jnp.asarray([[-1.0, 0.0, 0.0]])
        th = oracle_isect.intersect_tris(sd, jnp.asarray([3.0, 0.0, 0.0]), d)
        np.testing.assert_allclose(np.asarray(th.t)[0], 2.5, rtol=1e-5)

    def test_render_field(self):
        """Small instance field renders through the oracle."""
        from rust_wgpu_raytracing_tpu.core.camera import Camera
        from rust_wgpu_raytracing_tpu.config import CameraConfig
        from rust_wgpu_raytracing_tpu.ops.oracle import render_oracle

        inst = build(9)
        sd = inst.instantiate(grid_transforms(9, spacing=3.0, z=-12.0))
        cam = Camera.from_config(CameraConfig(), aspect=1.0)
        c, d = render_oracle(sd, cam.uniforms().flat(), width=48, height=48)
        hits = (np.asarray(d) < 1).mean()
        assert np.isfinite(np.asarray(c)).all()
        # the 3x3 field is visible (small: the proj-inv quirk widens the
        # effective FOV to ~99 degrees, shrinking on-screen size)
        assert hits > 0.01


class TestLargeAndMultiGroup:
    def test_superblock_aligned_instances_render(self):
        """Regression: past STREAM_FACES the per-instance padding
        superblock-aligns, but tangent frames were rotated from the
        FACE_PAD-padded TEMPLATE — mismatched array lengths crashed
        pack_face_columns on the first render. 20 instances x 1024
        padded faces > 16384 exercises that branch end to end."""
        import jax.numpy as jnp

        from rust_wgpu_raytracing_tpu.config import CameraConfig, MeshConfig
        from rust_wgpu_raytracing_tpu.core.camera import Camera
        from rust_wgpu_raytracing_tpu.ops import instances as inst_mod
        from rust_wgpu_raytracing_tpu.ops.megakernel import render_megakernel

        # force the superblock-alignment branch at test scale
        import unittest.mock as mock
        with mock.patch.object(inst_mod, "STREAM_FACES", 100):
            inst = inst_mod.InstancedScene.from_config(
                MeshConfig(obj_path="builtin:cube"), 4)
        sd = inst.instantiate(grid_transforms(4, spacing=2.0, z=-8.0))
        assert sd.padded_faces == 4 * 1024  # superblock branch taken
        assert sd.tri_tangent.shape[0] == sd.padded_faces
        assert sd.num_faces == 4 * inst.fb_real
        cam = Camera.from_config(CameraConfig(eye=(0.0, 0.0, 8.0)),
                                 aspect=1.0)
        c, _ = render_megakernel(sd, jnp.asarray(cam.uniforms().flat()),
                                 width=64, height=64, interpret=True)
        assert np.isfinite(np.asarray(c)).all()
        assert np.asarray(c).max() > 0.0

    def test_chunked_stream_pack_matches_oneshot_and_streams(self):
        """Large refit scenes stream safely (VERDICT r2 #6): the
        superblock-chunked device-side record build must equal the
        one-shot in-jit build exactly, instantiate() must attach it
        (spack populated per frame), and a FORCED streamed render from
        it must match the all-VMEM kernel bit-for-bit."""
        import unittest.mock as mock

        import jax.numpy as jnp

        from rust_wgpu_raytracing_tpu.config import CameraConfig, MeshConfig
        from rust_wgpu_raytracing_tpu.core.camera import Camera
        from rust_wgpu_raytracing_tpu.ops import instances as inst_mod
        from rust_wgpu_raytracing_tpu.ops.megakernel import (
            pack_stream_columns, pack_stream_columns_chunked,
            render_megakernel, gbuffer_pallas)
        from rust_wgpu_raytracing_tpu.ops.megakernel import raygen_planar
        from rust_wgpu_raytracing_tpu.core.camera import CameraUniforms

        with mock.patch.object(inst_mod, "STREAM_FACES", 100):
            inst = inst_mod.InstancedScene.from_config(
                MeshConfig(obj_path="builtin:cube"), 4)
            sd = inst.instantiate(grid_transforms(4, spacing=2.0, z=-8.0))
        # instantiate attached the chunked record
        assert sd.spack.shape == (4 * 1024, 128)
        oneshot = pack_stream_columns(sd)
        np.testing.assert_array_equal(np.asarray(sd.spack),
                                      np.asarray(oneshot))
        chunked = pack_stream_columns_chunked(sd)
        np.testing.assert_array_equal(np.asarray(chunked),
                                      np.asarray(oneshot))

        cam = Camera.from_config(CameraConfig(eye=(0.0, 0.0, 8.0)),
                                 aspect=1.0)
        uni = CameraUniforms.unflat(
            jnp.asarray(cam.uniforms().flat(), jnp.float32))
        dx, dy, dz = raygen_planar(64, 64, uni)
        gv = gbuffer_pallas(sd, uni.origin, dx, dy, dz, interpret=True,
                            stream=False)
        gs = gbuffer_pallas(sd, uni.origin, dx, dy, dz, interpret=True,
                            stream=True)
        for name in ("t", "face", "u", "v", "mat"):
            np.testing.assert_array_equal(
                np.asarray(getattr(gv, name)),
                np.asarray(getattr(gs, name)), err_msg=name)

    def test_multi_group_obj_keeps_all_groups(self):
        """Regression: from_config used meshes[0] only, silently
        dropping every other OBJ group and hardcoding material 0."""
        from rust_wgpu_raytracing_tpu.config import MeshConfig
        from rust_wgpu_raytracing_tpu.core.scene import Scene
        from rust_wgpu_raytracing_tpu.config import SceneConfig, RenderConfig
        from rust_wgpu_raytracing_tpu.ops.instances import InstancedScene

        try:
            inst = InstancedScene.from_config(
                MeshConfig(obj_path="cube.obj"), 2)
        except FileNotFoundError:
            pytest.skip("cube.obj asset not available")
        ref = Scene.build(SceneConfig(
            meshes=(MeshConfig(obj_path="cube.obj"),),
            render=RenderConfig(width=8, height=8)))
        assert inst.fb_real == ref.data.num_faces


def test_gpack_from_stream_covers_tail_partial_superblock():
    """Regression: gpack_from_stream floor-divided by SUPER_F, so a
    refit scene whose padded face count is not a superblock multiple
    (e.g. 3 x 512-face instances = 1536) rendered its tail faces with
    all-zero attributes. Ceil-div + clamped slices must cover every
    face exactly."""
    import numpy as np
    from rust_wgpu_raytracing_tpu.core.scene import (GPACK_SRC_COLS,
                                                     STREAM_COLS, SUPER_F)
    from rust_wgpu_raytracing_tpu.ops.megakernel import gpack_from_stream

    rng = np.random.default_rng(7)
    for f in (512, 1024, 1536, 2048, 2560):
        spack = rng.standard_normal((f, STREAM_COLS)).astype(np.float32)
        got = np.asarray(gpack_from_stream(jnp.asarray(spack)))
        want = spack[:, GPACK_SRC_COLS].T
        np.testing.assert_array_equal(got, want, err_msg=f"f={f}")


def test_gpack_sources_matches_stream_record_derivation():
    """Scene.build's direct gpack assembly (_gpack_sources_np) must be
    value-identical to deriving it from the full streaming record
    (_gpack_np(_stream_pack_np(...)) — the layout spec), padding rows
    included."""
    import numpy as np
    from rust_wgpu_raytracing_tpu.core.scene import (_gpack_np,
                                                     _gpack_sources_np,
                                                     _stream_pack_np)

    rng = np.random.default_rng(11)
    f, padded = 777, 1024
    n = rng.standard_normal((f, 3)).astype(np.float32)
    n[5] = 0.0  # degenerate face: the un normalization guard
    d = rng.standard_normal(f).astype(np.float32)
    g = rng.standard_normal((f, 3, 3)).astype(np.float32)
    c = rng.standard_normal((f, 3)).astype(np.float32)
    inv_denom = rng.standard_normal(f).astype(np.float32)
    uv3 = rng.standard_normal((f, 3, 2)).astype(np.float32)
    vn3 = rng.standard_normal((f, 3, 3)).astype(np.float32)
    face_mat = rng.integers(0, 4, f).astype(np.int32)
    orig = np.arange(f, dtype=np.int32)
    tan = rng.standard_normal((f, 3)).astype(np.float32)
    bit = rng.standard_normal((f, 3)).astype(np.float32)

    want = _gpack_np(_stream_pack_np(padded, n, d, g, c, inv_denom, uv3,
                                     vn3, face_mat, orig, tan, bit))
    got = _gpack_sources_np(padded, n, g, c, inv_denom, uv3, vn3,
                            face_mat, tan, bit)
    np.testing.assert_array_equal(got, want)
