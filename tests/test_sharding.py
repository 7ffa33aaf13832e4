"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(SURVEY §4: the TPU analogue of a fake distributed backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig,
                                             SphereConfig)
from rust_wgpu_raytracing_tpu.core.camera import Camera
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.ops.oracle import render_oracle
from rust_wgpu_raytracing_tpu.parallel.tile_sharding import (
    dryrun_multichip, make_render_mesh, make_train_step, render_sharded)

needs_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def small_scene(W=64, H=32):
    cfg = SceneConfig(
        spheres=(SphereConfig(center=(0.5, 0.2, -3.0), radius=0.6),),
        meshes=(MeshConfig(obj_path="builtin:cube",
                           translation=(-0.6, 0.0, -3.0), scale=0.8),),
        camera=CameraConfig(),
        render=RenderConfig(width=W, height=H),
    )
    return Scene.build(cfg), cfg


@needs_8dev
class TestRenderSharded:
    def test_matches_oracle(self):
        scene, cfg = small_scene()
        cam = Camera.from_config(cfg.camera, aspect=2.0)
        uni = cam.uniforms().flat()
        mesh = make_render_mesh(8, sp=1)
        sharded = render_sharded(scene.data, uni, mesh, width=64, height=32)
        ref, _ = render_oracle(scene.data, uni, width=64, height=32)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                                   atol=1.5 / 255.0)

    def test_sample_parallel_runs(self):
        scene, cfg = small_scene()
        cam = Camera.from_config(cfg.camera, aspect=2.0)
        uni = cam.uniforms().flat()
        mesh = make_render_mesh(8, sp=2)
        c = render_sharded(scene.data, uni, mesh, width=64, height=32, spp=2)
        assert c.shape == (32, 64, 3)
        assert np.isfinite(np.asarray(c)).all()


@needs_8dev
class TestTrainStep:
    def test_grad_descends(self):
        scene, cfg = small_scene()
        cam = Camera.from_config(cfg.camera, aspect=2.0)
        uni = cam.uniforms().flat()
        mesh = make_render_mesh(8, sp=2)

        # target rendered with the TRUE params; perturb and recover
        target, _ = render_oracle(scene.data, uni, width=64, height=32,
                                  quantize=False)
        params = {
            "sphere_color": scene.data.sphere_color + 0.4,
            "mat_ambient": scene.data.mat_ambient + 0.2,
        }
        step = make_train_step(scene.data, mesh, width=64, height=32, lr=0.5)
        losses = []
        for i in range(5):
            params, loss = step(params, scene.data, uni,
                                jnp.asarray(target), i)
            losses.append(float(loss))
        assert losses[-1] < losses[0]  # descending


@needs_8dev
def test_dryrun_multichip():
    dryrun_multichip(8)


@needs_8dev
class TestShardedMegakernel:
    def test_matches_single_device_megakernel(self):
        from rust_wgpu_raytracing_tpu.ops.megakernel import render_megakernel
        from rust_wgpu_raytracing_tpu.parallel.tile_sharding import (
            render_sharded_megakernel)

        scene, cfg = small_scene()
        cam = Camera.from_config(cfg.camera, aspect=2.0)
        uni = cam.uniforms().flat()
        mesh = make_render_mesh(8, sp=1)
        sharded = render_sharded_megakernel(scene.data, uni, mesh,
                                            width=64, height=32,
                                            quantize=False)
        single, _ = render_megakernel(scene.data, jnp.asarray(uni),
                                      width=64, height=32, interpret=True,
                                      quantize=False)
        # quantize=False in single; sharded path doesn't quantize either
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                                   atol=2e-5)

    def test_fused_variant_matches_split_sharded(self):
        """The fused single-kernel frame takes the same row-slab
        viewport (row0/total_height), so dp sharding composes with
        RenderConfig.variant='fused' — rows are pure per-device work,
        identical to the sharded split program."""
        from rust_wgpu_raytracing_tpu.parallel.tile_sharding import (
            render_sharded_megakernel)

        scene, cfg = small_scene()
        cam = Camera.from_config(cfg.camera, aspect=2.0)
        uni = cam.uniforms().flat()
        mesh = make_render_mesh(8, sp=1)
        split = render_sharded_megakernel(scene.data, uni, mesh,
                                          width=64, height=32,
                                          shadows=True)
        fused = render_sharded_megakernel(scene.data, uni, mesh,
                                          width=64, height=32,
                                          shadows=True, fused=True)
        np.testing.assert_array_equal(np.asarray(split),
                                      np.asarray(fused))


@needs_8dev
class TestShardedPathtrace:
    def test_matches_single_device_slab_composition(self):
        """dp x sp sharded path tracing == the same per-slab single-
        device renders averaged over the sp sample axis (the psum is the
        only collective; a permutation of pure per-slab work)."""
        from rust_wgpu_raytracing_tpu.ops.pathtrace import render_pathtrace
        from rust_wgpu_raytracing_tpu.parallel.tile_sharding import (
            render_pathtrace_sharded)

        scene, cfg = small_scene()
        cam = Camera.from_config(cfg.camera, aspect=2.0)
        uni = cam.uniforms().flat()
        mesh = make_render_mesh(8, sp=2)  # dp=4 x sp=2
        key = jax.random.PRNGKey(7)
        W, H, rows = 64, 32, 32 // 4
        sharded = render_pathtrace_sharded(
            scene.data, uni, key, mesh, width=W, height=H,
            bounces=1, spp=1)
        assert sharded.shape == (H, W, 3)

        slabs = []
        for dpi in range(4):
            acc = 0.0
            for spi in range(2):
                k = jax.random.fold_in(jax.random.fold_in(key, spi), dpi)
                acc = acc + render_pathtrace(
                    scene.data, jnp.asarray(uni), k, width=W, height=rows,
                    bounces=1, spp=1, interpret=True,
                    row0=jnp.float32(dpi * rows), total_height=H)
            slabs.append(np.asarray(acc) / 2.0)
        single = np.concatenate(slabs, axis=0)
        assert np.isfinite(single).all() and single.max() > 0
        np.testing.assert_allclose(np.asarray(sharded), single, atol=2e-5)


@needs_8dev
class TestShardedStreaming:
    def test_streamed_scene_row_slabs_match_single(self, monkeypatch):
        """Multi-chip row-slab sharding composed with the HBM-streaming
        kernels (double-buffered DMA inside shard_map): force the
        streaming threshold low so the 1024-face terrain takes the
        streamed path on 8 virtual devices."""
        from rust_wgpu_raytracing_tpu.config import (CameraConfig,
                                                     MeshConfig,
                                                     RenderConfig,
                                                     SceneConfig)
        from rust_wgpu_raytracing_tpu.core.scene import Scene
        from rust_wgpu_raytracing_tpu.ops import megakernel as mk
        from rust_wgpu_raytracing_tpu.parallel.tile_sharding import (
            make_render_mesh, render_sharded_megakernel)

        monkeypatch.setattr(mk, "STREAM_FACES", 512)
        cfg = SceneConfig(
            meshes=(MeshConfig(obj_path="builtin:terrain:23",
                               translation=(0.0, 0.0, -3.0)),),
            camera=CameraConfig(eye=(0.0, -2.0, -1.0),
                                target=(0.0, 0.0, -3.2)),
            render=RenderConfig(width=128, height=64))
        scene = Scene.build(cfg)
        assert mk._should_stream(scene.data.padded_faces, 32)
        cam = Camera.from_config(cfg.camera, aspect=2.0)
        uni = cam.uniforms().flat()
        mesh = make_render_mesh(8, sp=1)
        sharded = render_sharded_megakernel(scene.data, uni, mesh,
                                            width=128, height=64,
                                            quantize=False)
        single, _ = mk.render_megakernel(scene.data, jnp.asarray(uni),
                                         width=128, height=64,
                                         interpret=True, quantize=False)
        assert np.isfinite(np.asarray(sharded)).all()
        np.testing.assert_allclose(np.asarray(sharded),
                                   np.asarray(single), atol=2e-5)


@needs_8dev
class TestGeometrySharded:
    """gp axis: scene FACES sharded over the mesh (the TP analogue —
    parallel/geometry_sharding.py). The composite's lexicographic
    (depth, face) rule maps to (depth, chip) collectives, so the merged
    frame must equal single-chip render_megakernel EXACTLY."""

    def test_matches_single_chip_exact(self):
        from rust_wgpu_raytracing_tpu.ops import megakernel as mk
        from rust_wgpu_raytracing_tpu.parallel.geometry_sharding import (
            make_gp_mesh, render_sharded_gp)

        cfg = SceneConfig(
            meshes=(MeshConfig(obj_path="builtin:terrain:64",
                               translation=(0.0, 0.0, -3.0)),),
            camera=CameraConfig(eye=(0.0, -2.0, -1.0),
                                target=(0.0, 0.0, -3.2)),
            render=RenderConfig(width=64, height=64))
        scene = Scene.build(cfg)
        assert scene.data.padded_faces > 4 * 1024  # real multi-shard
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = cam.uniforms().flat()
        single, sdepth = mk.render_megakernel(
            scene.data, jnp.asarray(uni, jnp.float32),
            width=64, height=64, interpret=True)
        c, d = render_sharded_gp(scene.data, uni, make_gp_mesh(8),
                                 width=64, height=64)
        assert (np.asarray(d) < 1.0).any()  # something was hit
        np.testing.assert_array_equal(np.asarray(single), np.asarray(c))
        np.testing.assert_array_equal(np.asarray(sdepth), np.asarray(d))

    def test_shadowed_frame_exact(self):
        """Two-stage gp shadows: merged winner wavefront, local any-hit
        per shard, OR over 'gp' — must equal the single-chip shadowed
        frame bitwise (the any-hit is a boolean union over disjoint
        face shards)."""
        from rust_wgpu_raytracing_tpu.ops import megakernel as mk
        from rust_wgpu_raytracing_tpu.parallel.geometry_sharding import (
            make_gp_mesh, render_sharded_gp)

        cfg = SceneConfig(
            meshes=(MeshConfig(obj_path="builtin:terrain:64",
                               translation=(0.0, 0.0, -3.0),
                               light_direction=(6.0, -1.0, 1.0)),),
            camera=CameraConfig(eye=(0.0, -2.0, -1.0),
                                target=(0.0, 0.0, -3.2)),
            render=RenderConfig(width=64, height=64))
        scene = Scene.build(cfg)
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = cam.uniforms().flat()
        lit, _ = mk.render_megakernel(
            scene.data, jnp.asarray(uni, jnp.float32),
            width=64, height=64, shadows=False, interpret=True)
        single, sdepth = mk.render_megakernel(
            scene.data, jnp.asarray(uni, jnp.float32),
            width=64, height=64, shadows=True, interpret=True)
        # the low sun must actually cast shadows, or this test is vacuous
        assert (np.asarray(single) != np.asarray(lit)).any()
        c, d = render_sharded_gp(scene.data, uni, make_gp_mesh(8),
                                 width=64, height=64, shadows=True)
        np.testing.assert_array_equal(np.asarray(single), np.asarray(c))
        np.testing.assert_array_equal(np.asarray(sdepth), np.asarray(d))

    def test_streaming_shards_exact(self):
        """Shards big enough to HBM-stream (per-shard faces >
        STREAM_FACES): exercises the spack row slicing + per-shard
        streamed kernels under gp — still bitwise vs single-chip."""
        from rust_wgpu_raytracing_tpu.core.scene import SUPER_F
        from rust_wgpu_raytracing_tpu.ops import megakernel as mk
        from rust_wgpu_raytracing_tpu.parallel.geometry_sharding import (
            make_gp_mesh, render_sharded_gp, shard_scene_faces)

        cfg = SceneConfig(
            meshes=(MeshConfig(obj_path="builtin:terrain:265",
                               translation=(0.0, 0.0, -3.0)),),
            camera=CameraConfig(eye=(0.0, -2.0, -1.0),
                                target=(0.0, 0.0, -3.2)),
            render=RenderConfig(width=32, height=32))
        scene = Scene.build(cfg)
        stacked, rest = shard_scene_faces(scene.data, 8)
        assert mk._should_stream(rest.num_faces, 32), rest.num_faces
        cam = Camera.from_config(cfg.camera, aspect=1.0)
        uni = cam.uniforms().flat()
        single, sdepth = mk.render_megakernel(
            scene.data, jnp.asarray(uni, jnp.float32),
            width=32, height=32, interpret=True)
        c, d = render_sharded_gp(scene.data, uni, make_gp_mesh(8),
                                 width=32, height=32)
        assert (np.asarray(d) < 1.0).any()
        np.testing.assert_array_equal(np.asarray(single), np.asarray(c))
        np.testing.assert_array_equal(np.asarray(sdepth), np.asarray(d))

    def test_dp_gp_composition(self):
        """2-D ('dp','gp') mesh: row slabs x face shards. Slab raygen
        retiles the rays, so (like the existing dp tests) the check is
        close-match on the unquantized frame, not bitwise."""
        from rust_wgpu_raytracing_tpu.ops import megakernel as mk
        from rust_wgpu_raytracing_tpu.parallel.geometry_sharding import (
            make_gp_mesh, render_sharded_gp)

        cfg = SceneConfig(
            meshes=(MeshConfig(obj_path="builtin:terrain:64",
                               translation=(0.0, 0.0, -3.0),
                               light_direction=(6.0, -1.0, 1.0)),),
            camera=CameraConfig(eye=(0.0, -2.0, -1.0),
                                target=(0.0, 0.0, -3.2)),
            render=RenderConfig(width=64, height=32))
        scene = Scene.build(cfg)
        cam = Camera.from_config(cfg.camera, aspect=2.0)
        uni = cam.uniforms().flat()
        mesh = make_gp_mesh(8, dp=2)  # 2 row slabs x 4 face shards
        for shadows in (False, True):
            single, _ = mk.render_megakernel(
                scene.data, jnp.asarray(uni, jnp.float32),
                width=64, height=32, shadows=shadows, quantize=False,
                interpret=True)
            c, d = render_sharded_gp(scene.data, uni, mesh,
                                     width=64, height=32,
                                     shadows=shadows, quantize=False)
            assert c.shape == (32, 64, 3) and d.shape == (32, 64)
            np.testing.assert_allclose(np.asarray(c), np.asarray(single),
                                       atol=2e-5)

    def test_pathtrace_gp_exact(self):
        """gp path tracing: only the three mesh-intersection passes are
        sharded (lexicographic (t, global face) pmin merge + occlusion
        OR); the replicated per-ray state machine must produce the
        single-chip radiance image bitwise."""
        from rust_wgpu_raytracing_tpu.ops.pathtrace import render_pathtrace
        from rust_wgpu_raytracing_tpu.parallel.geometry_sharding import (
            make_gp_mesh, render_pathtrace_gp)

        cfg = SceneConfig(
            spheres=(SphereConfig(center=(0.5, 0.2, -3.0), radius=0.6),),
            meshes=(MeshConfig(obj_path="builtin:terrain:64",
                               translation=(0.0, 0.0, -3.0),
                               light_direction=(6.0, -1.0, 1.0)),),
            camera=CameraConfig(eye=(0.0, -2.0, -1.0),
                                target=(0.0, 0.0, -3.2)),
            render=RenderConfig(width=64, height=32))
        scene = Scene.build(cfg)
        cam = Camera.from_config(cfg.camera, aspect=2.0)
        uni = cam.uniforms().flat()
        key = jax.random.PRNGKey(3)
        ref = render_pathtrace(scene.data, jnp.asarray(uni, jnp.float32),
                               key, width=64, height=32, bounces=2,
                               spp=1, interpret=True)
        c = render_pathtrace_gp(scene.data, uni, key, make_gp_mesh(8),
                                width=64, height=32, bounces=2, spp=1)
        assert float(np.asarray(ref).sum()) > 0.0
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(c))

    def test_pathtrace_sp_gp_mean(self):
        """sp x gp: each sp rank traces its own key fold over the
        sharded geometry; the mesh-wide mean must equal the two
        single-chip sums averaged."""
        from rust_wgpu_raytracing_tpu.ops.pathtrace import render_pathtrace
        from rust_wgpu_raytracing_tpu.parallel.geometry_sharding import (
            make_gp_mesh, render_pathtrace_gp)

        cfg = SceneConfig(
            meshes=(MeshConfig(obj_path="builtin:terrain:64",
                               translation=(0.0, 0.0, -3.0),
                               light_direction=(6.0, -1.0, 1.0)),),
            camera=CameraConfig(eye=(0.0, -2.0, -1.0),
                                target=(0.0, 0.0, -3.2)),
            render=RenderConfig(width=64, height=32))
        scene = Scene.build(cfg)
        cam = Camera.from_config(cfg.camera, aspect=2.0)
        uni = cam.uniforms().flat()
        key = jax.random.PRNGKey(5)
        mesh = make_gp_mesh(8, sp=2)  # 2 sample ranks x 4 face shards
        c = render_pathtrace_gp(scene.data, uni, key, mesh,
                                width=64, height=32, bounces=1, spp=1)
        parts = [render_pathtrace(scene.data,
                                  jnp.asarray(uni, jnp.float32),
                                  jax.random.fold_in(key, i),
                                  width=64, height=32, bounces=1,
                                  spp=1, interpret=True)
                 for i in range(2)]
        want = (np.asarray(parts[0]) + np.asarray(parts[1])) / 2.0
        np.testing.assert_allclose(np.asarray(c), want, rtol=1e-6,
                                   atol=1e-7)

    def test_spheres_replicated_exact(self):
        """Spheres ride every shard; sphere-vs-mesh ties and pure-sphere
        pixels must still merge to the single-chip frame bitwise."""
        from rust_wgpu_raytracing_tpu.ops import megakernel as mk
        from rust_wgpu_raytracing_tpu.parallel.geometry_sharding import (
            make_gp_mesh, render_sharded_gp)

        scene, cfg = small_scene()
        cam = Camera.from_config(cfg.camera, aspect=2.0)
        uni = cam.uniforms().flat()
        single, _ = mk.render_megakernel(
            scene.data, jnp.asarray(uni, jnp.float32),
            width=64, height=32, interpret=True)
        c, d = render_sharded_gp(scene.data, uni, make_gp_mesh(8),
                                 width=64, height=32)
        np.testing.assert_array_equal(np.asarray(single), np.asarray(c))
