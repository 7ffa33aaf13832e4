"""Acceleration-path tests: LBVH linearization, the stackless walk,
accel-mode render parity, and the HBM-streaming kernels (round-2 items:
LBVH on the render path + breaking the all-VMEM scene-size ceiling)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig,
                                             reference_scene)
from rust_wgpu_raytracing_tpu.core.camera import Camera, CameraUniforms
from rust_wgpu_raytracing_tpu.core.scene import CULL_BLOCK, Scene
from rust_wgpu_raytracing_tpu.ops import bvh as bvhmod
from rust_wgpu_raytracing_tpu.ops.megakernel import (_mask_words,
                                                     _pack_mask_bits,
                                                     _should_stream,
                                                     gbuffer_pallas,
                                                     anyhit_pallas,
                                                     raygen_planar,
                                                     render_megakernel,
                                                     tile_cull_mask)
from rust_wgpu_raytracing_tpu.ops.traverse import (bvh_walk_mask_words,
                                                   tile_ray_bounds)


def build(cfg):
    return Scene.build(cfg)


def terrain_scene(grid_n, w=128, h=128, eye=(0.0, -2.0, -1.0)):
    cfg = SceneConfig(
        meshes=(MeshConfig(obj_path=f"builtin:terrain:{grid_n}",
                           translation=(0.0, 0.0, -3.0)),),
        camera=CameraConfig(eye=eye, target=(0.0, 0.0, -3.2)),
        render=RenderConfig(width=w, height=h))
    return cfg, Scene.build(cfg)


def uni_for(cfg, w, h):
    cam = Camera.from_config(cfg.camera, aspect=w / h)
    return jnp.asarray(cam.uniforms().flat())


class TestLinearize:
    def test_dfs_invariants(self):
        """Skip-pointer layout: pointers strictly advance, every leaf is
        reachable exactly once, subtree-skip semantics hold."""
        rng = np.random.default_rng(7)
        pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
        codes = np.sort(bvhmod.morton3d(pts))
        lo = pts - 0.01
        hi = pts + 0.01
        tree = bvhmod.build_lbvh(codes, lo, hi, use_native=False)
        pack = bvhmod.linearize_bvh(tree)
        m = pack.shape[1]
        assert m == 2 * tree.n_leaves - 1
        hit_next = pack[6].astype(int)
        miss_next = pack[7].astype(int)
        leaf_id = pack[8].astype(int)
        pos = np.arange(m)
        assert np.all(hit_next > pos)
        assert np.all(miss_next > pos)
        assert np.all(hit_next <= m)
        assert np.all(miss_next <= m)
        # walking with hit everywhere visits every node once, in order
        p, visited = 0, []
        while p < m:
            visited.append(p)
            p = hit_next[p]
        assert visited == list(range(m))
        # walking with miss everywhere visits only the root spine
        leaves = sorted(leaf_id[leaf_id >= 0])
        assert leaves == list(range(tree.n_leaves))
        # parent AABBs contain children (DFS child = pos+1 for internal)
        internal = leaf_id < 0
        for p in np.where(internal)[0]:
            l = p + 1
            assert np.all(pack[0:3, p] <= pack[0:3, l] + 1e-6)
            assert np.all(pack[3:6, p] >= pack[3:6, l] - 1e-6)

    def test_single_leaf(self):
        tree = bvhmod.build_lbvh(np.array([5], np.uint32),
                                 np.zeros((1, 3), np.float32),
                                 np.ones((1, 3), np.float32))
        pack = bvhmod.linearize_bvh(tree)
        assert pack.shape == (9, 1)
        assert pack[8, 0] == 0 and pack[6, 0] == 1


class TestWalkMask:
    def test_walk_equals_flat_mask(self):
        """The walk reaches a leaf iff the flat scan passes that cluster:
        internal AABBs contain their leaves and the slab test is monotone
        in the box, so the two masks are bit-identical."""
        cfg, s = terrain_scene(23)  # 968 faces -> 1024 padded, 61 nodes
        uni = CameraUniforms.unflat(uni_for(cfg, 128, 128))
        dx, dy, dz = raygen_planar(128, 128, uni)
        o = uni.origin
        f = s.data.padded_faces
        nb = s.data.blk_lo.shape[0]  # scene-local cluster granularity
        nwords = -(-nb // 32)
        flat = tile_cull_mask(s.data, o[0], o[1], o[2], dx, dy, dz, 1024)
        flat_words, _ = _pack_mask_bits(flat)
        bounds = tile_ray_bounds(o[0], o[1], o[2], dx, dy, dz, 1024)
        walk_words = bvh_walk_mask_words(s.data.bvh_pack, s.data.bvh_nodes,
                                         *bounds, nwords)
        np.testing.assert_array_equal(np.asarray(flat_words),
                                      np.asarray(walk_words).reshape(-1))

    def test_mask_words_brute_all_ones(self):
        cfg, s = terrain_scene(23)
        uni = CameraUniforms.unflat(uni_for(cfg, 128, 128))
        dx, dy, dz = raygen_planar(128, 128, uni)
        o = uni.origin
        words, nwords = _mask_words(s.data, "brute", o[0], o[1], o[2],
                                    dx, dy, dz, 1024, CULL_BLOCK,
                                    s.data.padded_faces)
        assert np.all(np.asarray(words) == -1)


class TestHierCull:
    def test_superset_of_flat_mask_with_padding_clusters(self):
        """The Pallas 2-level traversal must be a superset of the flat
        scan. terrain:23 pads to 1024 faces, so the last clusters are
        empty (+inf, -inf) boxes — regression: widening those produced
        inf - inf = NaN which poisoned the superblock union into
        never-hit (mask all zero)."""
        from rust_wgpu_raytracing_tpu.ops.traverse_pallas import (
            hier_cull_words)

        cfg, s = terrain_scene(23)
        uni = CameraUniforms.unflat(uni_for(cfg, 128, 128))
        dx, dy, dz = raygen_planar(128, 128, uni)
        o = uni.origin
        f = s.data.padded_faces
        flat = tile_cull_mask(s.data, o[0], o[1], o[2], dx, dy, dz, 1024)
        flat_words, nwords = _pack_mask_bits(flat)
        bounds = tile_ray_bounds(o[0], o[1], o[2], dx, dy, dz, 1024)
        hier = hier_cull_words(s.data.blk_lo, s.data.blk_hi, *bounds,
                               nwords=nwords, interpret=True)
        fw = np.asarray(flat_words).view(np.uint32)
        hw = np.asarray(hier).reshape(-1).view(np.uint32)
        assert np.unpackbits(fw.view(np.uint8)).sum() > 0
        # every flat bit present; no bit set for the all-padding cluster
        np.testing.assert_array_equal(fw & ~hw, np.zeros_like(fw))
        cull = f // s.data.blk_lo.shape[0]
        n_real = s.data.num_faces  # 968: trailing clusters pure padding
        first_pad_cluster = -(-n_real // cull)
        for c in range(first_pad_cluster, f // cull):
            w = c // 32
            assert not np.any(hw.reshape(-1, nwords)[:, w]
                              & (np.uint32(1) << np.uint32(c % 32)))

    def test_superset_multiword(self):
        """Exercise the multi-superblock walk (s > 0 SMEM table offsets,
        several mask words per tile) in CI — terrain:45 has 3,872 faces
        = 121 clusters = 4 words, with per-ray shadow-style origins so
        the tile bounds are genuine intervals."""
        from rust_wgpu_raytracing_tpu.ops.traverse_pallas import (
            hier_cull_words)

        cfg, s = terrain_scene(45)
        uni = CameraUniforms.unflat(uni_for(cfg, 128, 128))
        dx, dy, dz = raygen_planar(128, 128, uni)
        o = uni.origin
        r = dx.shape[0]
        ox = jnp.full((r,), float(o[0])) + dx * 0.5
        oy = jnp.full((r,), float(o[1])) + dy * 0.5
        oz = jnp.full((r,), float(o[2])) + dz * 0.5
        f = s.data.padded_faces
        flat = tile_cull_mask(s.data, ox, oy, oz, dx, dy, dz, 1024)
        flat_words, nwords = _pack_mask_bits(flat)
        assert nwords >= 4
        bounds = tile_ray_bounds(ox, oy, oz, dx, dy, dz, 1024)
        hier = hier_cull_words(s.data.blk_lo, s.data.blk_hi, *bounds,
                               nwords=nwords, interpret=True)
        fw = np.asarray(flat_words).view(np.uint32)
        hw = np.asarray(hier).reshape(-1).view(np.uint32)
        assert np.unpackbits(fw.view(np.uint8)).sum() > 0
        np.testing.assert_array_equal(fw & ~hw, np.zeros_like(fw))


class TestAccelParity:
    @pytest.mark.parametrize("accel", ["brute", "bvh"])
    def test_reference_scene_matches_cull(self, accel):
        """All accel strategies render the reference scene bit-identically
        (shadows on — exercises the any-hit mask path too)."""
        import dataclasses as dc

        w = h = 128
        cfg = reference_scene(w, h, shadows=True)
        cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 2.5)))
        s = Scene.build(cfg)
        uni = uni_for(cfg, w, h)
        base, _ = render_megakernel(s.data, uni, width=w, height=h,
                                    shadows=True, interpret=True,
                                    accel="cull")
        img, _ = render_megakernel(s.data, uni, width=w, height=h,
                                   shadows=True, interpret=True,
                                   accel=accel)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(img))

    def test_bvh_falls_back_without_tree(self):
        """Instanced scenes invalidate the host-built tree; accel='bvh'
        must transparently fall back to the flat cull."""
        from rust_wgpu_raytracing_tpu.ops.instances import (InstancedScene,
                                                            grid_transforms)

        inst = InstancedScene.from_config(
            MeshConfig(obj_path="builtin:cube"), 4)
        sd = inst.instantiate(grid_transforms(4, spacing=2.0, z=-6.0))
        assert sd.bvh_nodes == 0
        cfg = SceneConfig(camera=CameraConfig(),
                          render=RenderConfig(width=64, height=64))
        uni = uni_for(cfg, 64, 64)
        a, _ = render_megakernel(sd, uni, width=64, height=64,
                                 interpret=True, accel="bvh")
        b, _ = render_megakernel(sd, uni, width=64, height=64,
                                 interpret=True, accel="cull")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestStreaming:
    def test_forced_stream_gbuffer_parity(self):
        cfg, s = terrain_scene(23)
        uni = CameraUniforms.unflat(uni_for(cfg, 128, 128))
        dx, dy, dz = raygen_planar(128, 128, uni)
        gv = gbuffer_pallas(s.data, uni.origin, dx, dy, dz, interpret=True,
                            stream=False)
        gs = gbuffer_pallas(s.data, uni.origin, dx, dy, dz, interpret=True,
                            stream=True)
        for name in ("t", "face", "u", "v", "nd", "uvx", "uvy",
                     "nx", "ny", "nz", "mat"):
            np.testing.assert_array_equal(
                np.asarray(getattr(gv, name)), np.asarray(getattr(gs, name)),
                err_msg=name)

    def test_forced_stream_anyhit_parity(self):
        cfg, s = terrain_scene(23)
        uni = CameraUniforms.unflat(uni_for(cfg, 128, 128))
        dx, dy, dz = raygen_planar(128, 128, uni)
        r = dx.shape[0]
        ox = jnp.full((r,), float(uni.origin[0]))
        oy = jnp.full((r,), float(uni.origin[1]))
        oz = jnp.full((r,), float(uni.origin[2]))
        act = jnp.ones((r,), bool)
        ov = anyhit_pallas(s.data, ox, oy, oz, dx, dy, dz, act,
                           interpret=True, stream=False)
        os_ = anyhit_pallas(s.data, ox, oy, oz, dx, dy, dz, act,
                            interpret=True, stream=True)
        assert np.asarray(ov).any()  # something occludes
        np.testing.assert_array_equal(np.asarray(ov), np.asarray(os_))

    def test_stream_anyhit_perray_mask_identical(self, monkeypatch):
        """RT_AH_PERRAY word refinement is output-identical: it only
        clears mask words no live ray's forward line can touch (a
        conservative-superset shrink; tools/probe_ah_gap.py has the
        perf decision rule)."""
        import jax

        from rust_wgpu_raytracing_tpu.ops import megakernel as mk

        cfg, s = terrain_scene(23)
        uni = CameraUniforms.unflat(uni_for(cfg, 128, 128))
        dx, dy, dz = raygen_planar(128, 128, uni)
        r = dx.shape[0]
        ox = jnp.full((r,), float(uni.origin[0]))
        oy = jnp.full((r,), float(uni.origin[1]))
        oz = jnp.full((r,), float(uni.origin[2]))
        # mixed live/parked lanes exercise the act-aware refinement
        act = (jnp.arange(r) % 3) != 0
        dxa = jnp.where(act, dx, 0.0)
        dya = jnp.where(act, dy, 0.0)
        dza = jnp.where(act, dz, 0.0)
        base = anyhit_pallas(s.data, ox, oy, oz, dxa, dya, dza, act,
                             interpret=True, stream=True)
        monkeypatch.setattr(mk, "AH_PERRAY_MASK", True)
        jax.clear_caches()  # the flag is read at trace time
        try:
            ref = anyhit_pallas(s.data, ox, oy, oz, dxa, dya, dza, act,
                                interpret=True, stream=True)
        finally:
            jax.clear_caches()  # don't leak the flagged trace
        assert np.asarray(base).any()
        np.testing.assert_array_equal(np.asarray(base), np.asarray(ref))

    def test_perray_boxes_any_matches_super_any(self):
        """perray_boxes_any with every tile given the SAME box table
        must reproduce perray_super_any bit-for-bit (same slab math,
        same conservative margins) — including zero-direction parked
        rays and neutralized (lo=+inf, hi=-inf) padding boxes."""
        from rust_wgpu_raytracing_tpu.ops.traverse import (
            perray_boxes_any, perray_super_any)

        rng = np.random.default_rng(11)
        tile_r, n_tiles, c = 16, 4, 9
        r = tile_r * n_tiles
        o = [jnp.asarray(rng.uniform(-2, 2, r).astype(np.float32))
             for _ in range(3)]
        d = [jnp.asarray(rng.uniform(-1, 1, r).astype(np.float32))
             for _ in range(3)]
        # park some rays (zero direction) and mark some padding lanes
        park = jnp.asarray(rng.uniform(size=r) < 0.25)
        d = [jnp.where(park, 0.0, a) for a in d]
        act = jnp.asarray(rng.uniform(size=r) < 0.9)
        lo = rng.uniform(-2, 0, (c, 3)).astype(np.float32)
        hi = lo + rng.uniform(0.1, 2, (c, 3)).astype(np.float32)
        lo[-1], hi[-1] = np.inf, -np.inf  # a padding box
        slo, shi = jnp.asarray(lo), jnp.asarray(hi)
        ref = perray_super_any(slo, shi, *o, *d, tile_r, act=act,
                               chunk=4)
        got = perray_boxes_any(
            jnp.broadcast_to(slo, (n_tiles, c, 3)),
            jnp.broadcast_to(shi, (n_tiles, c, 3)),
            *o, *d, tile_r, act=act, chunk=4)
        assert np.asarray(ref).any() and not np.asarray(ref).all()
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_stream_gbuffer_krefine_identical(self, monkeypatch):
        """RT_PT_KREFINE cluster-bit refinement is output-identical:
        a cluster bit is cleared only when NO live ray's forward line
        intersects that cluster's AABB, so no tested face intersection
        can be lost (conservative-superset shrink, like the word-level
        refinement above it)."""
        import jax

        from rust_wgpu_raytracing_tpu.ops import megakernel as mk
        from rust_wgpu_raytracing_tpu.ops.megakernel import (
            gbuffer_perray_pallas)

        cfg, s = terrain_scene(23)
        uni = CameraUniforms.unflat(uni_for(cfg, 128, 128))
        dx, dy, dz = raygen_planar(128, 128, uni)
        r = dx.shape[0]
        rng = np.random.default_rng(13)
        ox = jnp.asarray(uni.origin[0] + rng.uniform(-1, 1, r)
                         .astype(np.float32))
        oy = jnp.asarray(uni.origin[1] + rng.uniform(-1, 1, r)
                         .astype(np.float32))
        oz = jnp.asarray(uni.origin[2] + rng.uniform(-1, 1, r)
                         .astype(np.float32))
        # park a third of the lanes: the refinement must stay exact
        # with act-gated tiles (parked rays self-cull in the slab test)
        park = (jnp.arange(r) % 3) == 0
        dxa = jnp.where(park, 0.0, dx)
        dya = jnp.where(park, 0.0, dy)
        dza = jnp.where(park, 0.0, dz)
        base = gbuffer_perray_pallas(s.data, ox, oy, oz, dxa, dya, dza,
                                     interpret=True, stream=True)
        monkeypatch.setattr(mk, "PT_KREFINE", 2)
        jax.clear_caches()  # the flag is read at trace time
        try:
            ref = gbuffer_perray_pallas(s.data, ox, oy, oz,
                                        dxa, dya, dza,
                                        interpret=True, stream=True)
        finally:
            jax.clear_caches()  # don't leak the flagged trace
        assert np.isfinite(np.asarray(base.t)).any()
        for name in ("t", "face", "u", "v", "nd", "uvx", "uvy",
                     "nx", "ny", "nz", "mat"):
            np.testing.assert_array_equal(
                np.asarray(getattr(base, name)),
                np.asarray(getattr(ref, name)), err_msg=name)

    def test_forced_stream_perray_gbuffer_parity(self):
        """Per-ray-origin (bounce) closest hit: the slim streamed kernel
        + post-sweep attribute gather must equal the all-VMEM fat
        kernel exactly (same merge rule, same interpolation products)."""
        from rust_wgpu_raytracing_tpu.ops.megakernel import (
            gbuffer_perray_pallas)

        cfg, s = terrain_scene(23)
        uni = CameraUniforms.unflat(uni_for(cfg, 128, 128))
        dx, dy, dz = raygen_planar(128, 128, uni)
        r = dx.shape[0]
        rng = np.random.default_rng(7)
        ox = jnp.asarray(uni.origin[0] + rng.uniform(-1, 1, r)
                         .astype(np.float32))
        oy = jnp.asarray(uni.origin[1] + rng.uniform(-1, 1, r)
                         .astype(np.float32))
        oz = jnp.asarray(uni.origin[2] + rng.uniform(-1, 1, r)
                         .astype(np.float32))
        gv = gbuffer_perray_pallas(s.data, ox, oy, oz, dx, dy, dz,
                                   interpret=True, stream=False)
        gs = gbuffer_perray_pallas(s.data, ox, oy, oz, dx, dy, dz,
                                   interpret=True, stream=True)
        assert np.isfinite(np.asarray(gs.t)).any()
        for name in ("t", "face", "u", "v", "nd", "uvx", "uvy",
                     "nx", "ny", "nz", "mat"):
            np.testing.assert_array_equal(
                np.asarray(getattr(gv, name)), np.asarray(getattr(gs, name)),
                err_msg=name)

    def test_reordered_anyhit_matches_plain(self):
        """Origin-Morton shadow reordering is a pure permutation: per-ray
        occlusion must equal the unsorted kernel exactly."""
        from rust_wgpu_raytracing_tpu.ops.megakernel import (
            anyhit_reordered_pallas)

        cfg, s = terrain_scene(23)
        uni = CameraUniforms.unflat(uni_for(cfg, 128, 128))
        dx, dy, dz = raygen_planar(128, 128, uni)
        r = dx.shape[0]
        # shadow-like rays: origins spread on the terrain, one direction
        ox = jnp.where(dz < 0, uni.origin[0] + dx * 2.0, 1e9)
        oy = jnp.where(dz < 0, uni.origin[1] + dy * 2.0, 1e9)
        oz = jnp.where(dz < 0, uni.origin[2] + dz * 2.0, 1e9)
        sdx = jnp.full((r,), 0.19)
        sdy = jnp.full((r,), -0.19)
        sdz = jnp.full((r,), -0.96)
        act = dz < 0
        a = anyhit_pallas(s.data, ox, oy, oz, sdx, sdy, sdz, act,
                          interpret=True)
        b = anyhit_reordered_pallas(s.data, ox, oy, oz, sdx, sdy, sdz,
                                    act, interpret=True)
        assert np.asarray(a).any()
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_auto_stream_threshold(self):
        assert not _should_stream(1024, 32)
        assert _should_stream(20480, 32)
        assert not _should_stream(20480 + 128, 32)  # not superblock-aligned
        cfg, s = terrain_scene(23)
        assert not _should_stream(s.data.padded_faces, 32)

    def test_big_scene_auto_streams_and_renders(self):
        """19.6k faces: pads to the 1024 superblock, auto-streams, and the
        full frame (with shadows) matches across cull and bvh."""
        cfg, s = terrain_scene(100)
        assert s.data.padded_faces % 1024 == 0
        assert _should_stream(s.data.padded_faces, 32)
        uni = uni_for(cfg, 128, 128)
        a, d = render_megakernel(s.data, uni, width=128, height=128,
                                 shadows=True, interpret=True, accel="cull")
        b, _ = render_megakernel(s.data, uni, width=128, height=128,
                                 shadows=True, interpret=True, accel="bvh")
        assert float((np.asarray(d) < 1.0).mean()) > 0.02  # scene visible
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTerrainAsset:
    def test_counts_and_normals(self):
        from rust_wgpu_raytracing_tpu.io.obj import make_terrain

        m = make_terrain(16)
        assert m.positions.shape == (256, 3)
        assert m.faces.shape == (2 * 15 * 15, 3)
        l = np.linalg.norm(m.normals, axis=1)
        np.testing.assert_allclose(l, 1.0, atol=1e-5)
        assert m.uvs.min() == 0.0 and m.uvs.max() == 1.0


class TestStreamPack:
    def test_host_pack_matches_in_jit_build(self, monkeypatch):
        """SceneData.spack (numpy transcription, core/scene.py
        _stream_pack_np) must match the in-jit pack_stream_columns it
        replaces — it only activates above STREAM_FACES, which no test
        scene reaches naturally, so force it low here. Cols 13-15 (unit
        normal) may drift by ~1 ulp (XLA lowers n/sqrt(s) with
        rsqrt-style contractions numpy cannot reproduce); everything
        else is exact. A transcription slip would otherwise ship green
        and corrupt every big-scene render silently."""
        from rust_wgpu_raytracing_tpu.core import scene as scene_mod
        from rust_wgpu_raytracing_tpu.ops.megakernel import (
            pack_stream_columns)

        monkeypatch.setattr(scene_mod, "STREAM_FACES", 100)
        cfg, s = terrain_scene(23)  # 968 faces > patched threshold
        assert s.data.spack.shape == (s.data.padded_faces, 128)
        host = np.asarray(s.data.spack)
        jit = np.asarray(pack_stream_columns(s.data))
        exact_cols = [c for c in range(jit.shape[1])
                      if c not in (13, 14, 15)]
        np.testing.assert_array_equal(host[:, exact_cols],
                                      jit[:, exact_cols])
        np.testing.assert_allclose(host[:, 13:16], jit[:, 13:16],
                                   rtol=3e-7, atol=1e-7)
        # the reserved origin-term slot must be zero in the static pack
        assert not host[:, 48:56].any()


class TestBounceSort:
    def test_sorted_extend_shadow_matches_unsorted(self, monkeypatch):
        """The streamed extend+shadow fallback reorders the wavefront by
        (origin-Morton, direction octant); a permutation is
        semantics-free, so G-buffer and occlusion must equal the plain
        unsorted kernels exactly."""
        from rust_wgpu_raytracing_tpu.ops import megakernel as mk

        cfg, s = terrain_scene(23)
        uni = CameraUniforms.unflat(uni_for(cfg, 128, 128))
        dx, dy, dz = raygen_planar(128, 128, uni)
        r = dx.shape[0]
        rng = np.random.default_rng(3)
        # bounce-like wavefront: origins on a slab, random unit dirs,
        # ~25% parked (zero dirs, far origins)
        o = np.stack([rng.uniform(-1, 1, r), rng.uniform(-0.5, 0.5, r),
                      rng.uniform(-3.5, -2.5, r)]).astype(np.float32)
        d = rng.normal(size=(3, r)).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        live = rng.uniform(size=r) > 0.25
        o = np.where(live, o, 1e9).astype(np.float32)
        d = np.where(live, d, 0.0).astype(np.float32)
        sd_ = np.tile(np.array([[0.2], [-0.3], [-0.93]], np.float32),
                      (1, r))
        ox, oy, oz = map(jnp.asarray, o)
        dxx, dyy, dzz = map(jnp.asarray, d)
        sdx, sdy, sdz = map(jnp.asarray, sd_)
        act = jnp.asarray(live)

        monkeypatch.setattr(mk, "_should_stream", lambda *a: True)
        gb_s, occ_s = mk.extend_shadow_pallas(
            s.data, ox, oy, oz, dxx, dyy, dzz,
            ox, oy, oz, sdx, sdy, sdz, act, interpret=True)
        gb_u = mk.gbuffer_perray_pallas(s.data, ox, oy, oz,
                                        dxx, dyy, dzz, interpret=True)
        occ_u = mk.anyhit_pallas(s.data, ox, oy, oz, sdx, sdy, sdz,
                                 act, interpret=True)
        assert np.asarray(jnp.isfinite(gb_u.t)).any()
        assert np.asarray(occ_u).any()
        for name in ("t", "face", "u", "v", "nd", "uvx", "uvy",
                     "nx", "ny", "nz", "mat"):
            np.testing.assert_array_equal(
                np.asarray(getattr(gb_s, name)),
                np.asarray(getattr(gb_u, name)), err_msg=name)
        np.testing.assert_array_equal(np.asarray(occ_s),
                                      np.asarray(occ_u))


class TestStreamingMultiSuper:
    def test_forced_stream_multi_superblock_parity(self):
        """Double-buffered slot alternation across SEVERAL nonzero mask
        words (terrain:46 pads to 4 superblocks) — the single-word
        terrain:23 case never flips the DMA slot. Streamed G-buffer and
        any-hit must equal the all-VMEM kernels exactly."""
        cfg, s = terrain_scene(46)
        assert s.data.padded_faces == 4096  # 4 superblocks
        uni = CameraUniforms.unflat(uni_for(cfg, 128, 128))
        dx, dy, dz = raygen_planar(128, 128, uni)
        gv = gbuffer_pallas(s.data, uni.origin, dx, dy, dz, interpret=True,
                            stream=False)
        gs = gbuffer_pallas(s.data, uni.origin, dx, dy, dz, interpret=True,
                            stream=True)
        for name in ("t", "face", "u", "v", "nd", "uvx", "uvy",
                     "nx", "ny", "nz", "mat"):
            np.testing.assert_array_equal(
                np.asarray(getattr(gv, name)), np.asarray(getattr(gs, name)),
                err_msg=name)
        r = dx.shape[0]
        ox = jnp.full((r,), float(uni.origin[0]))
        oy = jnp.full((r,), float(uni.origin[1]))
        oz = jnp.full((r,), float(uni.origin[2]))
        act = jnp.ones((r,), bool)
        ov = anyhit_pallas(s.data, ox, oy, oz, dx, dy, dz, act,
                           interpret=True, stream=False)
        os_ = anyhit_pallas(s.data, ox, oy, oz, dx, dy, dz, act,
                            interpret=True, stream=True)
        assert np.asarray(ov).any()
        np.testing.assert_array_equal(np.asarray(ov), np.asarray(os_))
