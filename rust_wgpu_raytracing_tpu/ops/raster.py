"""Forward raster pipeline — the reference's DEAD raster model path.

The reference carries a complete-but-disabled forward rasterizer left
over from the learn-wgpu tutorial it grew from: `src/shader.wgsl:1-51`
(textured VS/FS), the `DrawModel` trait (`src/model.rs:130-197`), the
raster `load_model` (`src/resources.rs:68-161`), the 10x10
quaternion-rotated instance grid (`src/lib.rs:66,114-134,400-421`), the
forward `CameraUniform` (`src/lib.rs:68-84`), and a commented
depth-stencil attachment (`src/lib.rs:713-719`, Depth32Float /
CompareFunction::Less) with its `create_depth_texture` helper
(`src/texture.rs:13-54`). Every call site is commented out
(`src/lib.rs:454-463,685,1202-1209`), so this is dead-code PARITY, not
a live-path requirement — but "complete" means a user of the reference
finds the capability here too.

TPU-native design: rasterization is depth compositing, which this
framework already expresses functionally — so the raster pipeline is
one jitted loop over face chunks that lex-min-merges a (z, draw-order)
winner per pixel (the same (t, face) idiom as the ray kernels in
ops/megakernel.py), then shades only the winners with ONE texture
gather. There are no vertex/index GPU buffers to manage: the vertex
stage is a single einsum over all instances (MXU), and the "render
pass" is SSA values threading through `RasterEncoder` draws.

Pipeline-state semantics mirrored from the commented wgpu pipeline
(`src/lib.rs:679-729`):
- front face Ccw (in NDC), cull_mode Back;
- REPLACE blend (opaque overwrite);
- depth: Depth32Float, CompareFunction::Less, write enabled (the
  commented attachment) — sequential draw order breaks z ties in favor
  of the earlier triangle, which the lexicographic (z, order) min
  reproduces exactly;
- clip position = (OPENGL_TO_WGPU @ proj @ view)  — the forward
  CameraUniform (`src/lib.rs:89-91`) — @ model_matrix @ [p, 1]
  (`shader.wgsl:25-39`);
- fs_main: textureSample(diffuse) only — no lighting, and (unlike the
  compute kernels) NO V-flip: the dead loader passes tex_coords raw
  (`resources.rs:131`);
- wgpu raster rules: pixel centers at +0.5, top-left fill rule,
  perspective-correct interpolation; no near-plane clipping is
  performed — triangles touching w<=0 are dropped whole (documented
  divergence; none of the reference assets cross the near plane from
  its camera placements).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

F32_INF = jnp.float32(jnp.inf)
_KEY_MAX = np.iinfo(np.int32).max


# --- instance grid (src/lib.rs:66,114-134,400-421) -------------------


def quat_axis_angle(axis, deg: float) -> np.ndarray:
    """cgmath Quaternion::from_axis_angle — (w, x, y, z), axis unit."""
    half = np.deg2rad(deg) / 2.0
    a = np.asarray(axis, np.float64)
    return np.concatenate([[np.cos(half)], np.sin(half) * a])


def quat_to_matrix(q) -> np.ndarray:
    """cgmath Matrix4::from(Quaternion) — rotation about the origin."""
    w, x, y, z = [float(v) for v in q]
    return np.array(
        [[1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y), 0],
         [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x), 0],
         [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y), 0],
         [0, 0, 0, 1]], np.float64)


def reference_instance_grid(n_per_row: int = 10,
                            spacing: float = 3.0) -> np.ndarray:
    """The reference's exact instance grid (src/lib.rs:400-421): for
    z, x in [0, N)^2, position = SPACE_BETWEEN * (i - N/2) on x/z, y=0;
    rotation 45 deg about normalize(position) (identity at the origin).
    Returns (N*N, 4, 4) model matrices = translation @ rotation
    (Instance::to_raw, src/lib.rs:119-127)."""
    mats = []
    for z in range(n_per_row):
        for x in range(n_per_row):
            px = spacing * (x - n_per_row / 2.0)
            pz = spacing * (z - n_per_row / 2.0)
            p = np.array([px, 0.0, pz], np.float64)
            norm = np.linalg.norm(p)
            if norm == 0.0:
                rot = quat_to_matrix(quat_axis_angle([0, 0, 1], 0.0))
            else:
                rot = quat_to_matrix(quat_axis_angle(p / norm, 45.0))
            m = rot.copy()
            m[:3, 3] = p
            mats.append(m)
    return np.stack(mats).astype(np.float32)


# --- depth texture + compare sampler (src/texture.rs:13-54) ----------


@dataclasses.dataclass
class DepthTexture:
    """Depth32Float texture + LessEqual compare sampler — the
    create_depth_texture helper (texture.rs:13-54). The raster pipeline
    itself owns a plain (H, W) depth array; this object adds the
    SAMPLED-depth capability (comparison sampling / PCF) that the
    helper's `compare: Some(CompareFunction::LessEqual)` linear-filter
    sampler provides."""

    data: jnp.ndarray  # (H, W) f32

    @staticmethod
    def create(height: int, width: int, fill: float = 1.0):
        return DepthTexture(jnp.full((height, width), fill, jnp.float32))

    def sample_compare(self, u, v, ref):
        """Bilinear-filtered LessEqual comparison sample (PCF).

        WGSL textureSampleCompare semantics with the helper's sampler
        state: per-texel test `ref <= texel` yields 0/1, the 2x2
        results are linearly filtered, addressing clamps to edge.
        u, v, ref broadcast; returns f32 in [0, 1]."""
        h, w = self.data.shape
        x = u * w - 0.5
        y = v * h - 0.5
        x0f, y0f = jnp.floor(x), jnp.floor(y)
        fx, fy = x - x0f, y - y0f
        x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
        x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
        y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
        y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)
        cmp = lambda yy, xx: (ref <= self.data[yy, xx]).astype(jnp.float32)
        top = cmp(y0, x0) * (1.0 - fx) + cmp(y0, x1) * fx
        bot = cmp(y1, x0) * (1.0 - fx) + cmp(y1, x1) * fx
        return top * (1.0 - fy) + bot * fy


# --- rasterization rules ----------------------------------------------


def _edge(ax, ay, bx, by, px, py):
    """Edge function (b-a) x (p-a) in screen space (y down)."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def _top_left(ax, ay, bx, by):
    """Top-left fill rule for edge a->b under the positive-interior
    orientation used below (y down). Derived from interior positivity:
    a TOP edge is horizontal with interior below it — E(p) =
    (b.x-a.x)(p.y-a.y) needs b.x > a.x; a LEFT edge has interior to its
    right — the vertical component needs b.y < a.y (edge points up)."""
    return ((ay == by) & (bx > ax)) | (by < ay)


def _covers(w, is_tl):
    """Fragment ownership: strictly inside, or ON a top-left edge."""
    return (w > 0.0) | ((w == 0.0) & is_tl)


def _face_chunk(tri_scr, order0: int, px, py, best):
    """Rasterize one (C,) chunk of SCREEN-space triangles vs all pixels.

    tri_scr: (C, 3, 4) — per corner (screen x, screen y, ndc z, clip w);
    order0: global draw index of the chunk's first triangle; px/py:
    (P,) pixel-center coordinates; best: carried (z, key, b0, b1)
    planar winner state. Returns the merged state. The chunk is a small
    static size, unrolled inside the jit."""
    C = tri_scr.shape[0]
    w_ok = jnp.all(tri_scr[:, :, 3] > 1e-6, axis=1)  # near/degenerate

    bz, bk, bb0, bb1 = best
    for c in range(C):
        X0, Y0, Z0 = tri_scr[c, 0, 0], tri_scr[c, 0, 1], tri_scr[c, 0, 2]
        X1, Y1, Z1 = tri_scr[c, 1, 0], tri_scr[c, 1, 1], tri_scr[c, 1, 2]
        X2, Y2, Z2 = tri_scr[c, 2, 0], tri_scr[c, 2, 1], tri_scr[c, 2, 2]
        # orient2d in screen space (y down): front face = Ccw in NDC
        # (lib.rs:703) flips to NEGATIVE screen-space area
        area2 = (X1 - X0) * (Y2 - Y0) - (Y1 - Y0) * (X2 - X0)
        front = (area2 < 0.0) & w_ok[c]  # cull_mode Back (lib.rs:704)

        # reversed edges -> positive interior weights for front faces
        w0 = _edge(X2, Y2, X1, Y1, px, py)
        w1 = _edge(X0, Y0, X2, Y2, px, py)
        w2 = _edge(X1, Y1, X0, Y0, px, py)
        inside = (front
                  & _covers(w0, _top_left(X2, Y2, X1, Y1))
                  & _covers(w1, _top_left(X0, Y0, X2, Y2))
                  & _covers(w2, _top_left(X1, Y1, X0, Y0)))
        a2 = -area2  # positive for front faces
        a2s = jnp.where(a2 != 0.0, a2, 1.0)
        l0, l1 = w0 / a2s, w1 / a2s  # screen-space barycentrics
        # z interpolates LINEARLY in screen space (it is already z/w)
        z = l0 * Z0 + l1 * Z1 + (1.0 - l0 - l1) * Z2
        inside = inside & (z >= 0.0) & (z <= 1.0)  # viewport depth range

        key = jnp.int32(order0 + c)
        z_cand = jnp.where(inside, z, F32_INF)
        # CompareFunction::Less under draw order: strictly smaller z
        # wins; an equal z keeps the EARLIER fragment (and the seeded
        # attachment value, whose key is INT32_MAX, loses only to
        # strictly closer fragments)
        take = z_cand < bz
        bz = jnp.where(take, z_cand, bz)
        bk = jnp.where(take, key, bk)
        bb0 = jnp.where(take, l0, bb0)
        bb1 = jnp.where(take, l1, bb1)
    return bz, bk, bb0, bb1


@functools.partial(jax.jit, static_argnames=("width", "height", "chunk"))
def rasterize(tri_clip, tri_uv, width: int, height: int, tex,
              color=None, depth=None, chunk: int = 16):
    """Rasterize pre-transformed clip-space triangles.

    tri_clip: (T, 3, 4) f32 clip positions (vs_main output);
    tri_uv: (T, 3, 2) f32 tex_coords; tex: (TH, TW, 3) linear diffuse.
    color/depth: optional existing attachments to composite over (the
    LoadOp::Load analogue); when None they clear to black / 1.0 —
    note a fragment at z exactly 1.0 FAILS Less against the clear.
    Returns (color (H, W, 3) linear f32, depth (H, W) f32)."""
    T = tri_clip.shape[0]
    P = width * height
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    px = jnp.tile(xs, height)
    py = jnp.repeat(ys, width)

    # vertex post-processing: NDC -> screen once, planar over T.
    # y flips (NDC y-up -> framebuffer row 0 at top); z is already in
    # [0, 1] (the OPENGL_TO_WGPU half-z premultiply, lib.rs:31-37)
    w_clip = tri_clip[:, :, 3]
    safe_w = jnp.where(jnp.abs(w_clip) > 1e-6, w_clip, 1.0)
    ndc = tri_clip[:, :, :3] / safe_w[:, :, None]
    tri_scr = jnp.stack(
        [(ndc[:, :, 0] * 0.5 + 0.5) * width,
         (0.5 - ndc[:, :, 1] * 0.5) * height,
         ndc[:, :, 2],
         w_clip], axis=-1)  # (T, 3, 4)

    pad = (-T) % chunk
    if pad:
        padv = jnp.zeros((pad, 3, 4), tri_scr.dtype)
        padv = padv.at[:, :, 3].set(-1.0)  # w <= 0 -> rejected whole
        tri_scr = jnp.concatenate([tri_scr, padv], axis=0)
    n_chunks = tri_scr.shape[0] // chunk

    best = ((jnp.ones((P,)) if depth is None else depth.reshape(-1)),
            jnp.full((P,), _KEY_MAX, jnp.int32),
            jnp.zeros((P,)), jnp.zeros((P,)))

    def body(i, carry):
        tc = jax.lax.dynamic_slice_in_dim(tri_scr, i * chunk, chunk)
        return _face_chunk(tc, i * chunk, px, py, carry)

    # the (z, order) lex-min is associative and the carry seeds from
    # the existing attachment, so chunked order equals sequential
    # per-triangle Less exactly.  order0 enters the loop as a traced
    # value via i * chunk — keys stay globally ascending across chunks.
    best_z, best_key, b0, b1 = jax.lax.fori_loop(0, n_chunks, body, best)

    hit = best_key != _KEY_MAX
    tri_idx = jnp.where(hit, jnp.minimum(best_key, T - 1), 0)

    # perspective-correct UV from the winner's screen barycentrics:
    # persp_i = (l_i / w_i) / sum_j (l_j / w_j) (shader-stage default)
    inv_w = 1.0 / jnp.maximum(tri_clip[:, :, 3], 1e-6)  # (T, 3)
    iw = inv_w[tri_idx]  # (P, 3)
    l2 = 1.0 - b0 - b1
    q0, q1, q2 = b0 * iw[:, 0], b1 * iw[:, 1], l2 * iw[:, 2]
    qs = q0 + q1 + q2
    qs = jnp.where(qs != 0.0, qs, 1.0)
    uvw = tri_uv[tri_idx]  # (P, 3, 2)
    uv = (q0[:, None] * uvw[:, 0] + q1[:, None] * uvw[:, 1]
          + q2[:, None] * uvw[:, 2]) / qs[:, None]

    # fs_main: textureSample(t_diffuse) — bilinear clamp-to-edge, NO
    # V-flip (resources.rs:131 passes tex_coords raw)
    from .shade import sample_texture_bilinear

    rgb = sample_texture_bilinear(
        tex[None], jnp.array([[tex.shape[0], tex.shape[1]]], jnp.int32),
        jnp.zeros((P,), jnp.int32), uv[:, 0], uv[:, 1])

    base_c = (jnp.zeros((P, 3)) if color is None
              else color.reshape(P, 3))
    base_d = (jnp.ones((P,)) if depth is None else depth.reshape(-1))
    out_c = jnp.where(hit[:, None], rgb, base_c).reshape(height, width, 3)
    out_d = jnp.where(hit, best_z, base_d).reshape(height, width)
    return out_c, out_d


# --- DrawModel (src/model.rs:130-197) ---------------------------------


@dataclasses.dataclass
class RasterMaterial:
    """model::Material for the raster path (model.rs:108-115): name,
    diffuse texture (the array itself plays the bind group), Ka/Kd/Ks."""

    name: str
    diffuse: np.ndarray  # (TH, TW, 3) linear f32
    ambient: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    diffuse_k: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    specular: Tuple[float, float, float] = (0.0, 0.0, 0.0)


@dataclasses.dataclass
class RasterMesh:
    """model::Mesh (model.rs:117-123) minus the GPU buffer handles:
    ModelVertex SoA (position + RAW tex_coords + normal,
    model.rs:37-43) and the index list, plus the material slot."""

    name: str
    positions: np.ndarray  # (V, 3) f32
    tex_coords: np.ndarray  # (V, 2) f32
    normals: np.ndarray  # (V, 3) f32
    faces: np.ndarray  # (F, 3) i32
    material: int = 0


@dataclasses.dataclass
class RasterModel:
    meshes: List[RasterMesh]
    materials: List[RasterMaterial]


def load_model_raster(obj_path: str) -> RasterModel:
    """The dead load_model (resources.rs:68-161): OBJ -> per-mesh
    ModelVertex arrays + per-material diffuse textures. Reuses the
    compute-path loader (identical tobj semantics) but keeps tex_coords
    RAW — the raster path has no V-flip anywhere."""
    import os

    from ..config import resolve_asset
    from ..io.obj import load_obj
    from ..io.textures import load_texture_file, solid_texture

    path = resolve_asset(obj_path)
    meshes, materials = load_obj(path)
    rmats = []
    for m in materials:
        if m.map_kd:
            tex = load_texture_file(
                os.path.join(os.path.dirname(path), m.map_kd))
        else:
            tex = solid_texture((1.0, 1.0, 1.0))
        rmats.append(RasterMaterial(
            name=m.name, diffuse=tex.rgb_linear, ambient=m.ambient,
            diffuse_k=m.diffuse, specular=m.specular))
    rmeshes = [RasterMesh(
        name=ms.name, positions=ms.positions, tex_coords=ms.uvs,
        normals=ms.normals, faces=ms.faces, material=ms.material_id)
        for ms in meshes]
    return RasterModel(rmeshes, rmats)


class RasterEncoder:
    """The RenderPass + DrawModel surface (model.rs:130-197).

    Owns the pass's color/depth attachments as SSA values; each draw_*
    composites into them under the pipeline rules above. `view_proj`
    plays the camera bind group (group 1, the forward CameraUniform =
    OPENGL_TO_WGPU @ proj @ view); the material's texture plays
    group 0. Instanced draws take (I, 4, 4) model matrices — the
    InstanceRaw vertex-buffer analogue (lib.rs:129-134)."""

    def __init__(self, width: int, height: int,
                 clear_color=(0.0, 0.0, 0.0)):
        self.width, self.height = width, height
        self.color = jnp.broadcast_to(
            jnp.asarray(clear_color, jnp.float32),
            (height, width, 3)).astype(jnp.float32)
        # create_depth_texture + Clear(1.0) (texture.rs:13-54)
        self.depth = DepthTexture.create(height, width)

    def _draw(self, mesh: RasterMesh, material: RasterMaterial,
              model_mats, view_proj):
        mm = jnp.asarray(model_mats, jnp.float32)  # (I, 4, 4)
        vp = jnp.asarray(view_proj, jnp.float32)
        pos = jnp.asarray(mesh.positions, jnp.float32)
        pos_h = jnp.concatenate(
            [pos, jnp.ones((pos.shape[0], 1), jnp.float32)], axis=1)
        # vs_main (shader.wgsl:25-39): clip = VP @ M @ p — one einsum
        # over every instance (the MXU vertex stage)
        mvp = jnp.einsum("ab,ibc->iac", vp, mm)  # (I, 4, 4)
        clip = jnp.einsum("iab,vb->iva", mvp, pos_h)  # (I, V, 4)
        faces = jnp.asarray(mesh.faces, jnp.int32)
        tri_clip = clip[:, faces].reshape(-1, 3, 4)  # (I*F, 3, 4)
        uvf = jnp.asarray(mesh.tex_coords, jnp.float32)[faces]  # (F,3,2)
        tri_uv = jnp.broadcast_to(
            uvf[None], (mm.shape[0],) + uvf.shape).reshape(-1, 3, 2)
        self.color, d = rasterize(
            tri_clip, tri_uv, self.width, self.height,
            jnp.asarray(material.diffuse, jnp.float32),
            color=self.color, depth=self.depth.data)
        self.depth = DepthTexture(d)
        return self

    # the four DrawModel methods (model.rs:130-197)
    def draw_mesh(self, mesh, material, view_proj):
        """draw_mesh = draw_mesh_instanced(0..1) (model.rs:158-166)."""
        return self.draw_mesh_instanced(
            mesh, material, np.eye(4, dtype=np.float32)[None], view_proj)

    def draw_mesh_instanced(self, mesh, material, instances, view_proj):
        return self._draw(mesh, material, instances, view_proj)

    def draw_model(self, model: RasterModel, view_proj):
        """draw_model = draw_model_instanced(0..1) (model.rs:182-184)."""
        return self.draw_model_instanced(
            model, np.eye(4, dtype=np.float32)[None], view_proj)

    def draw_model_instanced(self, model: RasterModel, instances,
                             view_proj):
        """Every mesh with its own material slot (model.rs:186-197)."""
        for mesh in model.meshes:
            self._draw(mesh, model.materials[mesh.material],
                       instances, view_proj)
        return self
