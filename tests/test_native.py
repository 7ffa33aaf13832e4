"""Native C++ component tests: OBJ parser and LBVH builder must agree
with the pure-Python reference implementations."""

import os

import numpy as np
import pytest

from rust_wgpu_raytracing_tpu import native as nat
from rust_wgpu_raytracing_tpu.io.obj import (_load_obj_python, load_obj)
from rust_wgpu_raytracing_tpu.ops import bvh

REF_RES = "/root/reference/res"
needs_assets = pytest.mark.skipif(
    not os.path.isdir(REF_RES), reason="reference assets not mounted")
needs_native = pytest.mark.skipif(
    not nat.available(), reason="native toolchain unavailable")


@needs_native
class TestNativeObj:
    @needs_assets
    def test_suzanne_matches_python(self):
        path = os.path.join(REF_RES, "suzanne_lowpoly.obj")
        py_meshes, py_mats = _load_obj_python(path)
        nat_meshes, nat_mats = load_obj(path, use_native=True)
        pm, nm = py_meshes[0], nat_meshes[0]
        np.testing.assert_array_equal(pm.faces, nm.faces)
        np.testing.assert_allclose(pm.positions, nm.positions, rtol=1e-6)
        np.testing.assert_allclose(pm.uvs, nm.uvs, rtol=1e-6)
        np.testing.assert_allclose(pm.normals, nm.normals, rtol=1e-6)
        assert [m.name for m in py_mats] == [m.name for m in nat_mats]

    @needs_assets
    def test_cube_matches_python(self):
        path = os.path.join(REF_RES, "cube.obj")
        pm = _load_obj_python(path)[0][0]
        nm = load_obj(path, use_native=True)[0][0]
        np.testing.assert_array_equal(pm.faces, nm.faces)
        np.testing.assert_allclose(pm.positions, nm.positions, rtol=1e-6)

    def test_quad_and_negative_indices(self, tmp_path):
        obj = tmp_path / "q.obj"
        obj.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                       "f -4 -3 -2 -1\n")
        pm = _load_obj_python(str(obj))[0][0]
        nm = load_obj(str(obj), use_native=True)[0][0]
        np.testing.assert_array_equal(pm.faces, nm.faces)
        np.testing.assert_allclose(pm.positions, nm.positions)

    def test_missing_file_raises(self):
        with pytest.raises((ValueError, FileNotFoundError)):
            nat.obj_parse_native("/nonexistent/file.obj")


@needs_native
class TestNativeBVH:
    def test_morton_matches_python(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
        py = bvh.morton3d(pts)
        nt = nat.morton3d_native(pts)
        np.testing.assert_array_equal(py, nt)

    def test_radix_sort_matches_argsort(self):
        rng = np.random.default_rng(1)
        codes = rng.integers(0, 2**30, size=2000).astype(np.uint32)
        order = nat.radix_argsort_native(codes)
        np.testing.assert_array_equal(codes[order],
                                      codes[np.argsort(codes, kind="stable")])
        # stability: equal codes keep original order
        codes2 = np.zeros(100, np.uint32)
        np.testing.assert_array_equal(nat.radix_argsort_native(codes2),
                                      np.arange(100))

    def test_lbvh_matches_python(self):
        rng = np.random.default_rng(2)
        n = 200
        pts = rng.uniform(size=(n, 3)).astype(np.float32)
        order = np.argsort(bvh.morton3d(pts), kind="stable")
        pts = pts[order]
        codes = bvh.morton3d(pts)
        lo, hi = pts - 0.01, pts + 0.01
        py = bvh.build_lbvh(codes, lo, hi, use_native=False)
        nt = bvh.build_lbvh(codes, lo, hi, use_native=True)
        np.testing.assert_array_equal(py.left, nt.left)
        np.testing.assert_array_equal(py.right, nt.right)
        np.testing.assert_array_equal(py.parent, nt.parent)
        np.testing.assert_allclose(py.node_lo, nt.node_lo, atol=1e-6)
        np.testing.assert_allclose(py.node_hi, nt.node_hi, atol=1e-6)

    def test_native_faster_on_big_input(self):
        import time

        rng = np.random.default_rng(3)
        n = 20000
        pts = rng.uniform(size=(n, 3)).astype(np.float32)
        order = np.argsort(bvh.morton3d(pts), kind="stable")
        pts = pts[order]
        codes = bvh.morton3d(pts)
        lo, hi = pts - 0.01, pts + 0.01
        t0 = time.perf_counter()
        bvh.build_lbvh(codes, lo, hi, use_native=True)
        t_native = time.perf_counter() - t0
        # python build of 20k leaves takes seconds; native must be fast
        assert t_native < 0.5
