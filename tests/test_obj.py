"""OBJ/MTL importer tests (SURVEY §4: counts & re-indexing semantics per
reference resources.rs:163-264 with tobj single_index)."""

import os

import numpy as np
import pytest

from rust_wgpu_raytracing_tpu.io.obj import load_obj, make_cube, parse_mtl

REF_RES = "/root/reference/res"
needs_assets = pytest.mark.skipif(
    not os.path.isdir(REF_RES), reason="reference assets not mounted")


def test_procedural_cube():
    cube = make_cube()
    assert cube.positions.shape == (24, 3)
    assert cube.faces.shape == (12, 3)
    assert cube.faces.max() == 23
    # outward normals: each face normal points away from the center
    p = cube.positions
    f = cube.faces
    n = np.cross(p[f[:, 1]] - p[f[:, 0]], p[f[:, 2]] - p[f[:, 0]])
    centers = p[f].mean(axis=1)
    assert (np.einsum("ij,ij->i", n, centers) > 0).all()


def test_single_index_dedup(tmp_path):
    # two triangles sharing an edge but with different uv on one corner:
    # v1/vt1 appears twice with different vt -> must split into 2 vertices
    obj = tmp_path / "t.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\nvt 1 1\n"
        "f 1/1 2/2 3/3\n"
        "f 2/4 4/2 3/3\n"  # corner 2 re-used with DIFFERENT vt (4 vs 2)
    )
    meshes, _ = load_obj(str(obj))
    m = meshes[0]
    assert m.faces.shape == (2, 3)
    # 4 distinct triples from face 1 + (2/4) new + (4/2) new = 5... corners:
    # (1,1),(2,2),(3,3),(2,4),(4,2) -> 5 unique vertices
    assert m.positions.shape[0] == 5


def test_fan_triangulation_and_negative_indices(tmp_path):
    obj = tmp_path / "q.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f -4 -3 -2 -1\n"  # quad with negative (relative) indices
    )
    meshes, _ = load_obj(str(obj))
    m = meshes[0]
    assert m.faces.shape == (2, 3)  # fan: (0,1,2), (0,2,3)
    np.testing.assert_array_equal(m.faces, [[0, 1, 2], [0, 2, 3]])


@needs_assets
def test_suzanne_counts():
    """The live reference asset: 67 positions / 111 faces in the OBJ; after
    single_index re-indexing the GPU-visible counts grow to the number of
    unique v/vt/vn triples (what the reference's storage buffers hold)."""
    meshes, materials = load_obj(os.path.join(REF_RES, "suzanne_lowpoly.obj"))
    assert len(meshes) == 1
    m = meshes[0]
    assert m.faces.shape == (111, 3)
    assert m.positions.shape[0] >= 67
    assert m.positions.shape[0] == m.uvs.shape[0] == m.normals.shape[0]
    # every face index valid
    assert m.faces.min() >= 0 and m.faces.max() < m.positions.shape[0]

    assert len(materials) == 1
    mat = materials[0]
    np.testing.assert_allclose(mat.ambient, (0.01, 0.01, 0.01))
    np.testing.assert_allclose(mat.diffuse, (0.8, 0.8, 0.8))
    np.testing.assert_allclose(mat.specular, (0.170455,) * 3)
    assert mat.map_kd == "suzanne_diffuse.png"


@needs_assets
def test_cube_asset_counts():
    meshes, materials = load_obj(os.path.join(REF_RES, "cube.obj"))
    assert sum(m.faces.shape[0] for m in meshes) == 428
    assert materials[0].map_kd == "cube-diffuse.jpg"
    assert materials[0].map_bump == "cube-normal.png"


@needs_assets
def test_mtl_parse():
    mats = parse_mtl(os.path.join(REF_RES, "cube.mtl"))
    assert len(mats) == 1
    np.testing.assert_allclose(mats[0].specular, (0.5, 0.5, 0.5))
    np.testing.assert_allclose(mats[0].shininess, 323.999994)


class TestParserParity:
    def test_multi_usemtl_group_splits_per_material(self, tmp_path):
        """tobj semantics: a group spanning several usemtl directives
        SPLITS into one mesh per material run (the reference splits a
        model whenever the material changes — tobj single_index). Both
        parser paths must agree (the native wrapper defers to python
        for multi-material groups)."""
        from rust_wgpu_raytracing_tpu.io.obj import (_load_obj_python,
                                                     load_obj)

        mtl = tmp_path / "m.mtl"
        mtl.write_text("newmtl A\nKd 1 0 0\nnewmtl B\nKd 0 1 0\n")
        obj = tmp_path / "t.obj"
        obj.write_text(
            "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
            "usemtl A\nf 1 2 3\nusemtl B\nf 2 4 3\n")
        for loader in (_load_obj_python, load_obj):
            meshes, mats = loader(str(obj))
            assert [m.name for m in mats] == ["A", "B"]
            assert len(meshes) == 2
            assert meshes[0].material_id == 0  # faces before the switch
            assert meshes[1].material_id == 1  # faces after it
            assert meshes[0].faces.shape[0] == 1
            assert meshes[1].faces.shape[0] == 1

    def test_native_bails_to_python_on_wide_polygon(self, tmp_path):
        """A polygon wider than the native fan buffer must fall back to
        the python parser (not silently truncate)."""
        from rust_wgpu_raytracing_tpu.io.obj import load_obj

        n = 300
        verts = "".join(
            f"v {np.cos(2*np.pi*i/n)} {np.sin(2*np.pi*i/n)} 0\n"
            for i in range(n))
        face = "f " + " ".join(str(i + 1) for i in range(n)) + "\n"
        obj = tmp_path / "poly.obj"
        obj.write_text(verts + face)
        meshes, _ = load_obj(str(obj))
        assert meshes[0].faces.shape[0] == n - 2  # full fan either way
