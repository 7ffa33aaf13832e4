"""Scene assembly: configs + assets -> device-resident SoA arrays.

TPU-native counterpart of the reference's GPU resource wiring: where the
reference creates storage buffers of padded ModelVertexSmall/ModelFaceSmall
structs plus uniform blocks and bind groups (src/resources.rs:215-261,
src/models/triangle_list/triangle_list.rs:79-226), we build one flat
"triangle soup" across all meshes with per-face attribute ids, precompute
the per-face edge-plane data that turns ray-triangle intersection into MXU
matmuls (see ops/megakernel.py), and register the whole thing as a JAX
pytree so it can flow through jit/shard_map and be donated.

Intersection precompute (derivation): the reference's kernel
(triangle_list/compute.wgsl:82-148) computes, per (ray, face),
    N = e0 x (p2-p0),  t = -(N.O + d)/(N.D),  P = O + tD
and three inside-outside values dot(N, cross(edge_i, P - p_i)). Using the
scalar-triple identity (a x b).c = (b x c).a, each inside-outside value is
    (P - p_i).(N x edge_i) = O.g_i + t*(D.g_i) - p_i.g_i,  g_i = N x edge_i
— affine in the ray, so for a tile of R rays all F faces are covered by the
single matmul (R,3) @ (3, 4F) over the packed [N | g0 | g1 | g2] planes.
This is the TPU-first replacement for the WGSL per-thread loop.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import List, Tuple

import jax
import numpy as np

from ..config import SceneConfig, resolve_asset
from ..io.obj import ObjMaterial
from ..io.textures import TextureData, load_texture_file, solid_texture

# Pad face count to a multiple of this so tiles map cleanly onto the VPU/MXU.
FACE_PAD = 128
# Faces per cull cluster (= the intersection kernel's face-block size):
# faces are Morton-sorted and grouped; per-tile interval culling skips
# whole clusters (see ops/bvh.py and ops/megakernel.py).
CULL_BLOCK = 32
# Small scenes cull at finer granularity: at 111 faces (suzanne) a
# 32-face cluster covers a whole quadrant of the mesh and a dense-view
# ray tests ~every face; 8-face clusters cut the tested faces ~2x
# (measured: 1080p dense gbuffer 8.8 -> 6.9 ms). The kernels read the
# granularity off blk_lo's shape, so this is scene-local.
SMALL_CULL_BLOCK = 8
SMALL_CLUSTER_FACES = 4096
# HBM-streaming superblock: 32 clusters = one packed mask word. Scenes
# beyond STREAM_FACES no longer fit the all-VMEM kernels ((F,40) f32 at
# 100k faces ~ 16 MB, at/over v5e VMEM); they pad to SUPER_F and the
# kernels DMA active superblocks from HBM (ops/megakernel.py).
SUPER_F = 32 * CULL_BLOCK
STREAM_FACES = 16384

# Streaming pack layout: Mosaic requires DMA slice minor dims aligned to
# the 128-lane tiling, so the HBM-streamed face record is one 128-col f32
# row per face (the VMEM scratch is lane-padded to 128 either way):
#   0-39   fpack (the static per-face columns, ops/megakernel.py)
#   40-43  [d, c0, c1, c2] plane constants (per-ray-origin kernels)
#   48-55  shared-origin terms — zero in the precomputed record, spliced
#          in per frame by ONE dynamic_update_slice (ops/megakernel.py
#          gbuffer_pallas; DMA minor dims must be 128-aligned, so they
#          cannot stream as their own (F, 8) array)
STREAM_COLS = 128
SC_DC = 40
SC_OT = 48

# Winner-attribute table for the slim-MERGE closest-hit kernels: the
# CH *test* reads only 16 of the 128 streamed columns, so the sweep
# tracks only the lexicographic (t, face) winner and EVERYTHING else —
# barycentrics, plane values, normals, uv, material — is resolved
# AFTER the sweep by one planar gather from this (GPACK_ROWS, F) table
# — attrs on rows so the gather yields (A, R) with rays on lanes (same
# trick as the packed texel pools). Rows GP_N.. carry the winner's raw
# intersection columns (unnormalized N, edge planes g1/g2, plane
# constants c1/c2) so h1/h2/ndotd are RECOMPUTED per ray with exactly
# the kernels' expressions (same floats, same op order — bit-identical,
# tested).
GP_INVD = 0
GP_UN = 1  # 1-3 unit normal
GP_UV = 4  # 4-9 uv corners (u0,v0,u1,v1,u2,v2)
GP_MAT = 10
GP_VN = 11  # 11-19 per-corner vertex normals
GP_TAN = 20  # 20-22 tangent, 23-25 bitangent
GP_N = 26  # 26-28 unnormalized geometric normal (ndotd recompute)
GP_G1 = 29  # 29-31 edge plane g1 (h1 recompute)
GP_G2 = 32  # 32-34 edge plane g2 (h2 recompute)
GP_C1 = 35  # plane constants c1/c2 (per-ray-origin h recompute)
GP_C2 = 36
GPACK_ROWS = 37
# spack columns feeding each gpack row (invd, un, uv, mat, vn, tan+bi,
# n, g1, g2, c1, c2); SC_DC holds [d, c0, c1, c2]
GPACK_SRC_COLS = ([12, 13, 14, 15] + list(range(16, 22)) + [22]
                  + list(range(30, 39)) + list(range(24, 30))
                  + [0, 1, 2] + [6, 7, 8] + [9, 10, 11]
                  + [SC_DC + 2, SC_DC + 3])


def _pad_rows(a: np.ndarray, n: int, fill=0) -> np.ndarray:
    if a.shape[0] == n:
        return a
    pad = np.full((n - a.shape[0],) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


def _stream_pack_np(padded: int, n, d, g, c, inv_denom, uv3, vn3,
                    face_mat, orig_ids, tangent, bitangent) -> np.ndarray:
    """Host (numpy) build of the (padded, STREAM_COLS) streaming face
    record — same column layout as ops/megakernel.py pack_face_columns
    (cols 0-39) plus the [d, c] plane constants at SC_DC. Padding faces
    are all-zero rows, matching _pad_rows semantics. See SceneData.spack
    for why this must not be built inside XLA."""
    f = n.shape[0]
    pack = np.zeros((padded, STREAM_COLS), np.float32)
    nlen = np.linalg.norm(n, axis=1, keepdims=True)
    un = np.where(nlen > 0, n / np.maximum(nlen, 1e-30), 0.0)
    pack[:f, 0:3] = n
    pack[:f, 3:12] = g.reshape(f, 9)
    pack[:f, 12] = inv_denom
    pack[:f, 13:16] = un
    pack[:f, 16:22] = uv3.reshape(f, 6)
    pack[:f, 22] = face_mat.astype(np.float32)
    pack[:f, 23] = orig_ids.astype(np.float32)
    pack[:f, 24:27] = tangent
    pack[:f, 27:30] = bitangent
    pack[:f, 30:39] = vn3.reshape(f, 9)
    pack[:f, SC_DC] = d
    pack[:f, SC_DC + 1:SC_DC + 4] = c
    return pack


def _face_uvscale(n: np.ndarray, uv3: np.ndarray) -> np.ndarray:
    """(F,) uv-per-world-unit density sqrt(uv_area / world_area): the
    per-face static factor of the ray-cone mip footprint (ops/miptex.py).
    n = unnormalized geometric normal (|n| = 2 * world area); uv areas
    from the 2D cross of the uv edge deltas. Degenerate faces -> 0."""
    duv1 = uv3[:, 1] - uv3[:, 0]
    duv2 = uv3[:, 2] - uv3[:, 0]
    det = np.abs(duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0])
    nlen = np.linalg.norm(n, axis=1)
    return np.sqrt(np.where(nlen > 1e-30, det / np.maximum(nlen, 1e-30),
                            0.0)).astype(np.float32)


def _mip_chain(img: np.ndarray):
    """Linear-light box-filter pyramid [level0, level1, ...] down to
    1x1. Odd sizes edge-replicate one row/col before the 2x2 mean
    (clamp-to-edge-consistent)."""
    levels = [img.astype(np.float32)]
    cur = levels[0]
    while cur.shape[0] > 1 or cur.shape[1] > 1:
        if cur.shape[0] % 2:
            cur = np.concatenate([cur, cur[-1:]], axis=0)
        if cur.shape[1] % 2:
            cur = np.concatenate([cur, cur[:, -1:]], axis=1)
        h2, w2 = cur.shape[0] // 2, cur.shape[1] // 2
        cur = cur.reshape(h2, 2, w2, 2, 3).mean(axis=(1, 3),
                                                dtype=np.float32)
        levels.append(cur)
    return levels


def _gpack_np(spack: np.ndarray) -> np.ndarray:
    """Host build of the (GPACK_ROWS, F) winner-attribute table from the
    full streaming record (spack col layout: _stream_pack_np). Row
    order must match the GP_* constants. Kept as the layout spec /
    test oracle; Scene.build uses _gpack_sources_np (same values
    without routing 37 strided reads through the 128-col record)."""
    assert len(GPACK_SRC_COLS) == GPACK_ROWS
    return np.ascontiguousarray(spack[:, GPACK_SRC_COLS].T)


def _gpack_sources_np(padded: int, n, g, c, inv_denom, uv3, vn3,
                      face_mat, tangent, bitangent) -> np.ndarray:
    """(GPACK_ROWS, padded) winner-attribute table straight from the
    planar source arrays — value-identical to
    _gpack_np(_stream_pack_np(...)) (tested), one sequential read per
    source instead of 37 strided passes over the (F, 128) record, and
    no record at all for sub-streaming scenes (which discard it)."""
    f = n.shape[0]
    out = np.zeros((GPACK_ROWS, padded), np.float32)
    nlen = np.linalg.norm(n, axis=1, keepdims=True)
    un = np.where(nlen > 0, n / np.maximum(nlen, 1e-30), 0.0)
    out[GP_INVD, :f] = inv_denom
    out[GP_UN:GP_UN + 3, :f] = un.T
    out[GP_UV:GP_UV + 6, :f] = uv3.reshape(f, 6).T
    out[GP_MAT, :f] = face_mat.astype(np.float32)
    out[GP_VN:GP_VN + 9, :f] = vn3.reshape(f, 9).T
    out[GP_TAN:GP_TAN + 3, :f] = tangent.T
    out[GP_TAN + 3:GP_TAN + 6, :f] = bitangent.T
    out[GP_N:GP_N + 3, :f] = n.T
    out[GP_G1:GP_G1 + 3, :f] = g[:, 1, :].T
    out[GP_G2:GP_G2 + 3, :f] = g[:, 2, :].T
    out[GP_C1, :f] = c[:, 1]
    out[GP_C2, :f] = c[:, 2]
    return out


@dataclass
class SceneData:
    """Device-resident scene (a pytree of jnp arrays).

    Faces across all meshes are concatenated in pass order, so a global
    argmin over faces reproduces the reference's sequential-pass + strict-<
    depth compositing semantics (earlier pass wins ties; within a pass the
    first face wins, triangle_list/compute.wgsl:198).
    """

    # --- spheres (pass order precedes meshes, src/lib.rs:1106-1184) ---
    sphere_center: jax.Array  # (S,3) f32
    sphere_radius: jax.Array  # (S,)  f32
    sphere_color: jax.Array  # (S,3) f32
    sphere_coeff: jax.Array  # (S,3) f32  [ambient, diffuse, specular]
    sphere_light: jax.Array  # (S,3) f32  per-sphere light dir (quirk)

    # --- triangle soup ---
    tri_p0: jax.Array  # (F,3) f32
    tri_n: jax.Array  # (F,3) f32   geometric normal (unnormalized)
    tri_d: jax.Array  # (F,)  f32   -N.p0
    tri_g: jax.Array  # (F,3,3) f32 g_i = N x edge_i  for i=0,1,2
    tri_c: jax.Array  # (F,3)  f32  c_i = p_i.g_i
    tri_inv_denom: jax.Array  # (F,) f32  1/(N.N), 0 for padding faces
    tri_uv: jax.Array  # (F,3,2) f32 per-corner uvs
    tri_vn: jax.Array  # (F,3,3) f32 per-corner shading normals (normal ext)
    tri_mat: jax.Array  # (F,) i32 material id
    tri_valid: jax.Array  # (F,) f32 1.0 for real faces, 0.0 for padding
    tri_orig: jax.Array  # (F,) i32 original (pre-Morton-sort) face index

    # --- acceleration (Morton clusters; ops/bvh.py) ---
    blk_lo: jax.Array  # (F/CULL_BLOCK, 3) f32 cluster AABB min
    blk_hi: jax.Array  # (F/CULL_BLOCK, 3) f32 cluster AABB max
    # LBVH over REAL cluster leaves, DFS-linearized with skip pointers
    # (ops/bvh.py:linearize_bvh; the deep stackless walk lives in
    # ops/traverse.py and is exercised by tests). NOTE: the RENDER
    # path's accel="bvh" (ops/traverse_pallas.py) derives its 2-level
    # hierarchy from blk_lo/blk_hi directly and never reads this pack
    # or bvh_nodes — device-refit instanced scenes therefore get
    # hierarchical culling even with bvh_nodes == 0 ("no valid tree":
    # meshless scenes, or geometry moved out from under the host-built
    # topology).
    bvh_pack: jax.Array  # (9, M) f32

    # --- materials ---
    mat_ambient: jax.Array  # (M,3) f32
    mat_specular: jax.Array  # (M,3) f32
    mat_diffuse: jax.Array  # (M,3) f32 (Kd; unused by parity shading, kept)
    mat_shininess: jax.Array  # (M,) f32 (parity shading hardcodes 32)
    mat_light: jax.Array  # (M,3) f32 light dir for faces of this material
    mat_tex: jax.Array  # (M,) i32 diffuse texture index

    # --- textures (stacked, padded to common size) ---
    textures: jax.Array  # (T, TH, TW, 3) f32 linear
    tex_hw: jax.Array  # (T,2) i32 true (h,w) per texture
    # Packed bilinear texture for the TPU fast path: for each texel, its
    # 2x2 clamped neighborhood [t00,t01,t10,t11] x RGB as 16-bit
    # fixed-point LINEAR-light values, stored TRANSPOSED (12, N).
    # Rationale (measured on TPU v5e):
    # - one narrow-payload gather fetches everything bilinear filtering
    #   needs (XLA TPU gathers cost ~fixed ns/element; byte-ish payloads
    #   are ~4x cheaper than f32) — vs 4 f32 gathers at ~20 ms each;
    # - values are PRE-LINEARIZED (sRGB EOTF applied at import, matching
    #   texture.rs:122 Rgba8UnormSrgb semantics) because computing pow()
    #   on 12 planes per frame costs ~30 ms; u16 quantization error is
    #   1.5e-5, invisible at the framebuffer's 8 bits;
    # - transposed so the gather (offset_dims=(0,)) yields (12, R) with
    #   rays on lanes — each tap row is a clean planar (R,) slice;
    # - the bilinear mix itself runs in a small Pallas kernel
    #   (ops/megakernel.py texfilter) because XLA leaves gather-output
    #   slices unfused (~0.5 ms per stray elementwise op at 1080p).
    # COMPACT pools (no per-texture padding): diffuse and bump textures
    # in separate pools so each gather operand stays under the ~16 MB
    # VMEM-staging threshold (measured: gathers from operands beyond it
    # run ~2.2x slower). Per-material base/size planes resolve addressing.
    tex_packed: jax.Array  # (12, Nd) u16 diffuse pool, linear fixed-point
    tex_packed_bump: jax.Array  # (12, Nb) u16 bump pool (raw values)
    mat_tex_base: jax.Array  # (M,) i32 texel offset of the diffuse map
    mat_tex_h: jax.Array  # (M,) f32
    mat_tex_w: jax.Array  # (M,) f32
    mat_bump_base: jax.Array  # (M,) i32 (-1 = no bump map)
    mat_bump_h: jax.Array  # (M,) f32
    mat_bump_w: jax.Array  # (M,) f32

    # --- normal mapping (BASELINE-added capability; the reference ships
    # cube-normal.png + map_Bump in cube.mtl:13 but never samples it) ---
    tri_tangent: jax.Array  # (F,3) f32 per-face tangent (uv-aligned)
    tri_bitangent: jax.Array  # (F,3) f32
    mat_bump: jax.Array  # (M,) i32 bump texture index, -1 = none

    # --- mip chains (EXTENSION, off by default — the reference forces
    # mip 0 via textureSampleGrad(..., 0, 0),
    # triangle_list/compute.wgsl:225). A SEPARATE packed pool holding
    # the full pyramid (level 0 included) so the parity path's
    # tex_packed stays byte-identical; ops/miptex.py samples it with a
    # ray-cone LOD. Tables are (M, mip_levels), rows padded by
    # repeating the texture's last real level (clamping deep LODs).
    tex_mips: jax.Array = None  # (12, Nm) u16 pyramid pool
    mat_mip_base: jax.Array = None  # (M, L) i32
    mat_mip_h: jax.Array = None  # (M, L) f32
    mat_mip_w: jax.Array = None  # (M, L) f32
    # per-face uv-per-world-unit density sqrt(uv_area / world_area) —
    # the static half of the ray-cone footprint (ops/miptex.py).
    # Device-refit instancing recomputes it in-jit from the refit
    # normals (exact under any affine transform, ops/instances.py).
    tri_uvscale: jax.Array = None  # (F,) f32

    # (F, STREAM_COLS) f32 HOST-precomputed streaming face record for
    # scenes past STREAM_FACES; (0, STREAM_COLS) otherwise (the kernels
    # fall back to building it in-jit). Precomputing in numpy matters:
    # assembling the 128-col record inside XLA forces every narrow
    # (F, k) operand into the result's (8,128)-tiled layout — ~18 one-GB
    # copies at 2M faces, an HBM OOM the host build avoids entirely.
    spack: jax.Array = None

    # (GPACK_ROWS, F) f32 winner-attribute table for the slim streaming
    # closest-hit's post-sweep gather ((0, 0) when not streaming).
    gpack: jax.Array = None

    # static metadata (not traced)
    num_faces: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_spheres: int = dataclasses.field(metadata=dict(static=True), default=0)
    bvh_nodes: int = dataclasses.field(metadata=dict(static=True), default=0)
    # total pyramid levels (incl. level 0) in the mip tables; 0 when no
    # pyramid was built (meshless scenes)
    mip_levels: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def padded_faces(self) -> int:
        return self.tri_p0.shape[0]


jax.tree_util.register_dataclass(
    SceneData,
    data_fields=[f.name for f in dataclasses.fields(SceneData)
                 if not f.metadata.get("static")],
    meta_fields=[f.name for f in dataclasses.fields(SceneData)
                 if f.metadata.get("static")],
)


def _precompute_faces(positions: np.ndarray, uvs: np.ndarray, normals: np.ndarray,
                      faces: np.ndarray):
    """Per-face edge-plane precompute (see module docstring)."""
    p0 = positions[faces[:, 0]]
    p1 = positions[faces[:, 1]]
    p2 = positions[faces[:, 2]]
    e0 = p1 - p0
    e1 = p2 - p1
    e2 = p0 - p2
    n = np.cross(e0, p2 - p0)
    denom = np.einsum("fi,fi->f", n, n)
    d = -np.einsum("fi,fi->f", n, p0)
    g0 = np.cross(n, e0)
    g1 = np.cross(n, e1)
    g2 = np.cross(n, e2)
    c0 = np.einsum("fi,fi->f", p0, g0)
    c1 = np.einsum("fi,fi->f", p1, g1)
    c2 = np.einsum("fi,fi->f", p2, g2)
    with np.errstate(divide="ignore"):
        inv_denom = np.where(denom > 0, 1.0 / np.maximum(denom, 1e-30), 0.0)
    uv3 = uvs[faces]  # (F,3,2)
    vn3 = normals[faces]  # (F,3,3)
    g = np.stack([g0, g1, g2], axis=1)  # (F,3,3)
    c = np.stack([c0, c1, c2], axis=1)  # (F,3)

    # per-face tangent frame from uv deltas (standard tangent-space
    # construction; flat per face, matching the flat geometric normals)
    duv1 = uv3[:, 1] - uv3[:, 0]  # (F,2)
    duv2 = uv3[:, 2] - uv3[:, 0]
    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    inv_det = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det),
                       0.0)
    ep1 = p1 - p0
    ep2 = p2 - p0
    tangent = (ep1 * duv2[:, 1:2] - ep2 * duv1[:, 1:2]) * inv_det[:, None]
    bitangent = (ep2 * duv1[:, 0:1] - ep1 * duv2[:, 0:1]) * inv_det[:, None]

    def _norm_rows(x):
        l = np.linalg.norm(x, axis=1, keepdims=True)
        return np.where(l > 1e-12, x / np.maximum(l, 1e-12), 0.0)

    tangent = _norm_rows(tangent).astype(np.float32)
    bitangent = _norm_rows(bitangent).astype(np.float32)

    return (p0, n, d, g, c, inv_denom.astype(np.float32), uv3, vn3,
            tangent, bitangent)


@dataclass
class Scene:
    """Host-side scene: config + loaded assets + the device SceneData."""

    config: SceneConfig
    data: SceneData
    mesh_names: List[str]

    @staticmethod
    def build(config: SceneConfig) -> "Scene":
        import jax.numpy as jnp

        # L2 model layer (lazy import: models/* import this module).
        # Each primitive model owns its config->SoA assembly, as the
        # reference's Sphere/TriangleList own their buffer inits
        # (sphere.rs:18-96, triangle_list.rs:79-226); Scene.build owns
        # only the cross-model soup concat + device layout.
        from ..models.sphere import Sphere
        from ..models.triangle_list import TriangleList

        # ---- spheres ----
        spheres = config.spheres
        s_center, s_radius, s_color, s_coeff, s_light = Sphere.soa(spheres)

        # ---- meshes -> one soup ----
        all_pos: List[np.ndarray] = []
        all_uv: List[np.ndarray] = []
        all_nrm: List[np.ndarray] = []
        all_faces: List[np.ndarray] = []
        all_face_mat: List[np.ndarray] = []
        mesh_names: List[str] = []
        materials: List[ObjMaterial] = []
        mat_light: List[Tuple[float, float, float]] = []
        vert_off = 0

        for mesh_cfg in config.meshes:
            model = TriangleList(mesh_cfg)
            meshes, mats = model.load()
            mat_off = len(materials)
            materials.extend(mats)
            mat_light.extend([mesh_cfg.light_direction] * len(mats))
            for m in meshes:
                pos = model.world_positions(m)
                all_pos.append(pos)
                all_uv.append(m.uvs)
                all_nrm.append(m.normals)
                all_faces.append(m.faces + vert_off)
                all_face_mat.append(
                    np.full((m.faces.shape[0],), mat_off + m.material_id, dtype=np.int32))
                vert_off += pos.shape[0]
                mesh_names.append(m.name)

        if all_pos:
            positions = np.concatenate(all_pos, axis=0).astype(np.float32)
            uvs = np.concatenate(all_uv, axis=0).astype(np.float32)
            normals = np.concatenate(all_nrm, axis=0).astype(np.float32)
            faces = np.concatenate(all_faces, axis=0).astype(np.int32)
            face_mat = np.concatenate(all_face_mat, axis=0)
        else:
            positions = np.zeros((3, 3), np.float32)
            uvs = np.zeros((3, 2), np.float32)
            normals = np.zeros((3, 3), np.float32)
            faces = np.zeros((0, 3), np.int32)
            face_mat = np.zeros((0,), np.int32)

        if not materials:
            materials = [ObjMaterial(name="default")]
            mat_light = [(1.0, -1.0, -5.0)]

        num_faces = faces.shape[0]
        # Big scenes pad to the streaming superblock so the HBM-streaming
        # kernels see whole 1024-face superblocks (= one mask word each).
        pad_unit = SUPER_F if num_faces > STREAM_FACES else FACE_PAD
        padded = max(pad_unit, -(-max(num_faces, 1) // pad_unit) * pad_unit)

        if num_faces:
            # Morton-sort faces by centroid so fixed-size clusters are
            # spatially compact (ops/bvh.py). Stable sort: equal codes
            # keep buffer order. NOTE: with culling enabled the
            # first-face-wins tie rule applies in MORTON order; exact
            # float-equal hits of overlapping coplanar faces are the only
            # observable difference vs the reference (none in real
            # meshes).
            from ..ops.bvh import (build_lbvh, cluster_aabbs, linearize_bvh,
                                   morton3d, morton_order)

            order = morton_order(positions[faces[:, 0]],
                                 positions[faces[:, 1]],
                                 positions[faces[:, 2]])
            faces = faces[order]
            face_mat = face_mat[order]
            orig_ids = order.astype(np.int32)

            (p0, n, d, g, c, inv_denom, uv3, vn3, tangent,
             bitangent) = _precompute_faces(positions, uvs, normals, faces)
            uvscale = _face_uvscale(n, uv3)
            cull = (SMALL_CULL_BLOCK if num_faces <= SMALL_CLUSTER_FACES
                    else CULL_BLOCK)
            blk_lo, blk_hi = cluster_aabbs(
                _pad_rows(positions[faces[:, 0]], padded),
                _pad_rows(positions[faces[:, 1]], padded),
                _pad_rows(positions[faces[:, 2]], padded),
                cull, num_faces)

            # LBVH over the REAL cluster leaves. Leaf Morton keys are the
            # sorted face codes sampled at cluster starts — guaranteed
            # non-decreasing (the Karras build requires sorted codes;
            # ties break by index).
            n_real_clusters = -(-num_faces // cull)
            centroids_sorted = (positions[faces[:, 0]]
                                + positions[faces[:, 1]]
                                + positions[faces[:, 2]]) / 3.0
            codes_sorted = morton3d(centroids_sorted)
            cluster_codes = codes_sorted[np.arange(n_real_clusters)
                                         * cull]
            bvh = build_lbvh(cluster_codes,
                             blk_lo[:n_real_clusters].copy(),
                             blk_hi[:n_real_clusters].copy())
            bvh_pack = linearize_bvh(bvh)
            bvh_nodes = 2 * n_real_clusters - 1

            # gpack is ALWAYS host-precomputed (every closest-hit path
            # resolves the winner's attributes from it post-sweep);
            # the full streaming record ships only past streaming scale
            gpack_np = _gpack_sources_np(padded, n, g, c, inv_denom,
                                         uv3, vn3, face_mat,
                                         tangent, bitangent)
            if num_faces > STREAM_FACES:
                spack_np = _stream_pack_np(padded, n, d, g, c, inv_denom,
                                           uv3, vn3, face_mat, orig_ids,
                                           tangent, bitangent)
            else:
                spack_np = np.zeros((0, STREAM_COLS), np.float32)
        else:
            p0 = np.zeros((0, 3), np.float32)
            n = np.zeros((0, 3), np.float32)
            d = np.zeros((0,), np.float32)
            g = np.zeros((0, 3, 3), np.float32)
            c = np.zeros((0, 3), np.float32)
            inv_denom = np.zeros((0,), np.float32)
            uv3 = np.zeros((0, 3, 2), np.float32)
            vn3 = np.zeros((0, 3, 3), np.float32)
            tangent = np.zeros((0, 3), np.float32)
            bitangent = np.zeros((0, 3), np.float32)
            uvscale = np.zeros((0,), np.float32)
            orig_ids = np.zeros((0,), np.int32)
            nb = padded // CULL_BLOCK
            blk_lo = np.full((nb, 3), np.inf, np.float32)
            blk_hi = np.full((nb, 3), -np.inf, np.float32)
            bvh_pack = np.zeros((9, 1), np.float32)
            bvh_nodes = 0
            spack_np = np.zeros((0, STREAM_COLS), np.float32)
            gpack_np = np.zeros((GPACK_ROWS, 0), np.float32)

        # ---- textures (diffuse sRGB-decoded; bump maps raw) ----
        # deduplicated by (resolved path, srgb): real assets routinely
        # share one map across materials, and duplicate copies bloat
        # both the f32 stack and the u16 packed pools (pools past the
        # ~16 MB gather threshold cost ~2.2x per sample, and past 2^24
        # texels base offsets would stop being exact)
        textures: List[TextureData] = []
        tex_cache: dict = {}
        mat_tex: List[int] = []
        mat_bump: List[int] = []

        def tex_id(key, loader):
            if key not in tex_cache:
                tex_cache[key] = len(textures)
                textures.append(loader())
            return tex_cache[key]

        for mat in materials:
            if mat.map_kd:
                path = resolve_asset(mat.map_kd)
                mat_tex.append(tex_id((path, True),
                                      lambda p=path: load_texture_file(p)))
            else:
                mat_tex.append(tex_id(("__solid_white__", True),
                                      lambda: solid_texture((1.0,) * 3)))
        for mat in materials:
            if mat.map_bump:
                path = resolve_asset(mat.map_bump)
                mat_bump.append(tex_id(
                    (path, False),
                    lambda p=path: load_texture_file(p, srgb=False)))
            else:
                mat_bump.append(-1)
        th = max(t.height for t in textures)
        tw = max(t.width for t in textures)
        tex_stack = np.zeros((len(textures), th, tw, 3), np.float32)
        tex_hw = np.zeros((len(textures), 2), np.int32)
        for i, t in enumerate(textures):
            tex_stack[i, : t.height, : t.width] = t.rgb_linear
            tex_hw[i] = (t.height, t.width)

        def pack_neighborhoods(rgb_linear: np.ndarray) -> np.ndarray:
            """(h*w, 12) u16: each texel's clamped 2x2 neighborhood."""
            lin16 = np.clip(rgb_linear * 65535.0 + 0.5, 0,
                            65535).astype(np.uint16)
            h, w = rgb_linear.shape[:2]
            yy1 = np.minimum(np.arange(h) + 1, h - 1)
            xx1 = np.minimum(np.arange(w) + 1, w - 1)
            out = np.zeros((h, w, 12), np.uint16)
            out[:, :, 0:3] = lin16
            out[:, :, 3:6] = lin16[:, xx1]
            out[:, :, 6:9] = lin16[yy1, :]
            out[:, :, 9:12] = lin16[yy1][:, xx1]
            return out.reshape(-1, 12)

        def build_pool(tex_ids):
            base = {}
            chunks = []
            off = 0
            for t_id in tex_ids:
                t = textures[t_id]
                base[t_id] = off
                chunks.append(pack_neighborhoods(t.rgb_linear))
                off += t.height * t.width
            pool = (np.concatenate(chunks, axis=0) if chunks
                    else np.zeros((1, 12), np.uint16))
            return np.ascontiguousarray(pool.T), base

        diffuse_ids = sorted(set(mat_tex))
        bump_ids = sorted(set(b for b in mat_bump if b >= 0))
        pool_d, base_d = build_pool(diffuse_ids)
        pool_b, base_b = build_pool(bump_ids)

        # ---- mip pyramid pool (extension; sampled by ops/miptex.py).
        # Level 0 is DUPLICATED into this pool so the mip path samples
        # one pool with one table and the parity pool stays untouched.
        mip_chains = {t_id: _mip_chain(textures[t_id].rgb_linear)
                      for t_id in diffuse_ids}
        mip_levels = max((len(c) for c in mip_chains.values()), default=0)
        mip_base: dict = {}
        mip_chunks = []
        moff = 0
        for t_id in diffuse_ids:
            for lv, img in enumerate(mip_chains[t_id]):
                mip_base[(t_id, lv)] = (moff, img.shape[0], img.shape[1])
                mip_chunks.append(pack_neighborhoods(img))
                moff += img.shape[0] * img.shape[1]
        mip_pool = (np.ascontiguousarray(
            np.concatenate(mip_chunks, axis=0).T) if mip_chunks
            else np.zeros((12, 1), np.uint16))
        n_mat = len(materials)
        m_mip_base = np.zeros((n_mat, max(mip_levels, 1)), np.int32)
        m_mip_h = np.ones((n_mat, max(mip_levels, 1)), np.float32)
        m_mip_w = np.ones((n_mat, max(mip_levels, 1)), np.float32)
        for mi, t_id in enumerate(mat_tex):
            last = len(mip_chains[t_id]) - 1
            for lv in range(max(mip_levels, 1)):
                b, h, w = mip_base[(t_id, min(lv, last))]
                m_mip_base[mi, lv] = b
                m_mip_h[mi, lv] = h
                m_mip_w[mi, lv] = w

        # i32 base offsets: exact at any pool size (f32 loses integers
        # past 2^24 texels — see ops/megakernel.py _mat_const)
        m_tex_base = np.array([base_d[t] for t in mat_tex], np.int32)
        m_tex_h = np.array([textures[t].height for t in mat_tex], np.float32)
        m_tex_w = np.array([textures[t].width for t in mat_tex], np.float32)
        m_bump_base = np.array(
            [base_b.get(b, -1) if b >= 0 else -1 for b in mat_bump],
            np.int32)
        m_bump_h = np.array(
            [textures[b].height if b >= 0 else 1 for b in mat_bump],
            np.float32)
        m_bump_w = np.array(
            [textures[b].width if b >= 0 else 1 for b in mat_bump],
            np.float32)

        data = SceneData(
            sphere_center=jnp.asarray(s_center),
            sphere_radius=jnp.asarray(s_radius),
            sphere_color=jnp.asarray(s_color),
            sphere_coeff=jnp.asarray(s_coeff),
            sphere_light=jnp.asarray(s_light),
            tri_p0=jnp.asarray(_pad_rows(p0.astype(np.float32), padded)),
            tri_n=jnp.asarray(_pad_rows(n.astype(np.float32), padded)),
            tri_d=jnp.asarray(_pad_rows(d.astype(np.float32), padded)),
            tri_g=jnp.asarray(_pad_rows(g.astype(np.float32), padded)),
            tri_c=jnp.asarray(_pad_rows(c.astype(np.float32), padded)),
            tri_inv_denom=jnp.asarray(_pad_rows(inv_denom, padded)),
            tri_uv=jnp.asarray(_pad_rows(uv3.astype(np.float32), padded)),
            tri_vn=jnp.asarray(_pad_rows(vn3.astype(np.float32), padded)),
            tri_mat=jnp.asarray(_pad_rows(face_mat, padded)),
            tri_valid=jnp.asarray(
                _pad_rows(np.ones((num_faces,), np.float32), padded)),
            tri_orig=jnp.asarray(_pad_rows(orig_ids, padded)),
            blk_lo=jnp.asarray(blk_lo),
            blk_hi=jnp.asarray(blk_hi),
            bvh_pack=jnp.asarray(bvh_pack),
            mat_ambient=jnp.asarray(
                np.array([m.ambient for m in materials], np.float32)),
            mat_specular=jnp.asarray(
                np.array([m.specular for m in materials], np.float32)),
            mat_diffuse=jnp.asarray(
                np.array([m.diffuse for m in materials], np.float32)),
            mat_shininess=jnp.asarray(
                np.array([m.shininess for m in materials], np.float32)),
            mat_light=jnp.asarray(np.array(mat_light, np.float32).reshape(-1, 3)),
            mat_tex=jnp.asarray(np.array(mat_tex, np.int32)),
            textures=jnp.asarray(tex_stack),
            tex_hw=jnp.asarray(tex_hw),
            tex_packed=jnp.asarray(pool_d),
            tex_packed_bump=jnp.asarray(pool_b),
            mat_tex_base=jnp.asarray(m_tex_base),
            mat_tex_h=jnp.asarray(m_tex_h),
            mat_tex_w=jnp.asarray(m_tex_w),
            mat_bump_base=jnp.asarray(m_bump_base),
            mat_bump_h=jnp.asarray(m_bump_h),
            mat_bump_w=jnp.asarray(m_bump_w),
            tri_tangent=jnp.asarray(_pad_rows(tangent, padded)),
            tri_bitangent=jnp.asarray(_pad_rows(bitangent, padded)),
            mat_bump=jnp.asarray(np.array(mat_bump, np.int32)),
            tex_mips=jnp.asarray(mip_pool),
            mat_mip_base=jnp.asarray(m_mip_base),
            mat_mip_h=jnp.asarray(m_mip_h),
            mat_mip_w=jnp.asarray(m_mip_w),
            tri_uvscale=jnp.asarray(_pad_rows(uvscale, padded)),
            spack=jnp.asarray(spack_np),
            gpack=jnp.asarray(gpack_np),
            num_faces=num_faces,
            num_spheres=len(spheres),
            bvh_nodes=bvh_nodes,
            mip_levels=mip_levels,
        )
        return Scene(config=config, data=data, mesh_names=mesh_names)
