"""Acceleration structure tests: Morton ordering, cluster AABBs, LBVH
build/refit, and conservativeness of the tile cull mask."""

import jax.numpy as jnp
import numpy as np
import pytest

from rust_wgpu_raytracing_tpu.config import (MeshConfig, RenderConfig,
                                             SceneConfig)
from rust_wgpu_raytracing_tpu.core.scene import CULL_BLOCK, Scene
from rust_wgpu_raytracing_tpu.ops import bvh
from rust_wgpu_raytracing_tpu.ops import intersect as oracle_isect
from rust_wgpu_raytracing_tpu.ops.megakernel import (TILE_R, _pad1,
                                                     tile_cull_mask)


def make_cloud(tmp_path, nfaces=64, seed=3):
    rng = np.random.default_rng(seed)
    verts, faces = [], []
    for i in range(nfaces):
        c = rng.uniform([-3, -3, -8], [3, 3, -2])
        tri = c + rng.uniform(-0.5, 0.5, size=(3, 3))
        verts.extend(tri.tolist())
        faces.append(f"f {3*i+1}/1 {3*i+2}/2 {3*i+3}/3")
    obj = tmp_path / "cloud.obj"
    lines = [f"v {x} {y} {z}" for x, y, z in verts]
    lines += ["vt 0 0", "vt 1 0", "vt 0 1"] + faces
    obj.write_text("\n".join(lines) + "\n")
    return Scene.build(SceneConfig(meshes=(MeshConfig(obj_path=str(obj)),),
                                   render=RenderConfig(width=8, height=8)))


class TestMorton:
    def test_expand_bits(self):
        assert bvh.expand_bits(np.array([0b111]))[0] == 0b1001001

    def test_codes_order_locality(self):
        # points along a line get monotonically ordered codes
        pts = np.stack([np.linspace(0, 1, 16)] * 3, axis=1)
        codes = bvh.morton3d(pts)
        assert (np.diff(codes.astype(np.int64)) > 0).all()

    def test_stable_ties(self):
        pts = np.zeros((5, 3))
        order = bvh.morton_order(pts, pts, pts)
        np.testing.assert_array_equal(order, np.arange(5))


class TestClusters:
    def test_aabbs_cover_faces(self, tmp_path):
        scene = make_cloud(tmp_path, nfaces=40).data
        f = scene.tri_p0.shape[0]
        lo = np.asarray(scene.blk_lo)
        hi = np.asarray(scene.blk_hi)
        cull = f // lo.shape[0]  # scene-local granularity (8 if small)
        p0 = np.asarray(scene.tri_p0)
        valid = np.asarray(scene.tri_valid) > 0
        for i in np.nonzero(valid)[0]:
            b = i // cull
            assert (p0[i] >= lo[b] - 1e-5).all()
            assert (p0[i] <= hi[b] + 1e-5).all()
        # padding-only clusters are inverted
        last = f // cull - 1
        if not valid[last * cull:].any():
            assert np.isinf(lo[last]).all()


class TestLBVH:
    def test_build_shapes(self):
        rng = np.random.default_rng(0)
        n = 33
        pts = rng.uniform(size=(n, 3)).astype(np.float32)
        codes = np.sort(bvh.morton3d(pts))
        lo = pts - 0.01
        hi = pts + 0.01
        tree = bvh.build_lbvh(codes, lo, hi)
        assert tree.left.shape == (n - 1,)
        assert tree.parent[0] == -1 or (tree.parent == -1).sum() == 1
        # every node except the root has a parent
        assert (tree.parent[1:] >= 0).sum() + (tree.parent[1:] < 0).sum() \
            == 2 * n - 2

    def test_root_covers_all(self):
        rng = np.random.default_rng(1)
        n = 64
        pts = rng.uniform(size=(n, 3)).astype(np.float32)
        order = np.argsort(bvh.morton3d(pts), kind="stable")
        pts = pts[order]
        codes = bvh.morton3d(pts)
        tree = bvh.build_lbvh(codes, pts - 0.02, pts + 0.02)
        np.testing.assert_allclose(tree.node_lo[0], (pts - 0.02).min(0),
                                   atol=1e-6)
        np.testing.assert_allclose(tree.node_hi[0], (pts + 0.02).max(0),
                                   atol=1e-6)

    def test_refit_tracks_motion(self):
        rng = np.random.default_rng(2)
        n = 16
        pts = rng.uniform(size=(n, 3)).astype(np.float32)
        order = np.argsort(bvh.morton3d(pts), kind="stable")
        pts = pts[order]
        codes = bvh.morton3d(pts)
        tree = bvh.build_lbvh(codes, pts - 0.01, pts + 0.01)
        moved = pts + np.float32([5.0, 0.0, 0.0])
        tree.refit(moved - 0.01, moved + 0.01)
        np.testing.assert_allclose(tree.node_lo[0], (moved - 0.01).min(0),
                                   atol=1e-6)


class TestCullMask:
    def test_conservative_vs_bruteforce(self, tmp_path):
        """Every actual hit must come from an unmasked (tile, cluster):
        the mask may only skip work, never change the image."""
        scene = make_cloud(tmp_path, nfaces=96).data
        rng = np.random.default_rng(9)
        n = TILE_R * 2
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        origin = jnp.zeros(3)

        th = oracle_isect.intersect_tris(scene, origin, d)
        hits = np.isfinite(np.asarray(th.t))
        faces = np.asarray(th.face)

        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        mask = np.asarray(tile_cull_mask(
            scene, origin[0], origin[1], origin[2],
            _pad1(dx, TILE_R), _pad1(dy, TILE_R), _pad1(dz, TILE_R), TILE_R))

        cull = scene.tri_p0.shape[0] // mask.shape[1]
        for i in np.nonzero(hits)[0]:
            tile = i // TILE_R
            blk = faces[i] // cull
            assert mask[tile, blk] == 1, (i, tile, blk)

    def test_numpy_reference_agrees(self, tmp_path):
        scene = make_cloud(tmp_path, nfaces=64).data
        rng = np.random.default_rng(11)
        t_cnt = 7
        dmin = rng.uniform(-1, 0.5, size=(t_cnt, 3)).astype(np.float32)
        dmax = dmin + rng.uniform(0, 0.5, size=(t_cnt, 3)).astype(np.float32)
        omin = rng.uniform(-0.5, 0.0, size=(t_cnt, 3)).astype(np.float32)
        omax = omin + 0.1
        lo = np.asarray(scene.blk_lo)
        hi = np.asarray(scene.blk_hi)
        ref = bvh.tile_cull_mask_np(dmin, dmax, omin, omax, lo, hi)
        # jnp path needs planar rays; emulate by constructing per-tile
        # rays achieving exactly these bounds (2 rays per tile)
        reps = TILE_R // 2
        def plane(lo_, hi_):
            return jnp.asarray(np.repeat(
                np.stack([lo_, hi_], axis=1), reps, axis=1).reshape(-1))
        mask = np.asarray(tile_cull_mask(
            scene,
            plane(omin[:, 0], omax[:, 0]), plane(omin[:, 1], omax[:, 1]),
            plane(omin[:, 2], omax[:, 2]),
            plane(dmin[:, 0], dmax[:, 0]), plane(dmin[:, 1], dmax[:, 1]),
            plane(dmin[:, 2], dmax[:, 2]), TILE_R))
        np.testing.assert_array_equal(mask.astype(bool), ref)
