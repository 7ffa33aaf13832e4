"""Instancing + per-frame refit (BASELINE config 5).

The reference computes a 10x10 quaternion-rotated instance grid but
never renders it (dead code, src/lib.rs:114-134 — SURVEY §2.2); this
module provides the live capability: N transformed copies of a base
mesh rendered as one soup, with all per-frame work (vertex transform,
edge-plane precompute, cluster-AABB refit) running ON DEVICE inside the
frame jit — the TPU-native analogue of a BVH refit: a few fused
elementwise ops over (N*F) faces, no host round trip.

Transforms are (N, 3, 4) affine rows [R | t]. Faces of each instance
stay contiguous and cluster-aligned, so Morton/cluster locality is
preserved as instances move (cluster AABBs are refit exactly).
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scene import (CULL_BLOCK, FACE_PAD, GPACK_ROWS, STREAM_COLS,
                          STREAM_FACES,
                          SUPER_F, Scene, SceneData)


@dataclass
class InstancedScene:
    """Base mesh + template SceneData; `instantiate(transforms)` returns
    a fully-valid SceneData for any instance placement."""

    template: SceneData  # built with identity transforms
    base_pos: jax.Array  # (V,3) base vertices
    base_faces: jax.Array  # (Fb,3) i32 (padded to CULL_BLOCK multiple)
    base_uv3: jax.Array  # (Fb,3,2)
    base_vn3: jax.Array  # (Fb,3,3)
    base_mat: jax.Array  # (Fb,) i32
    base_valid: jax.Array  # (Fb,)
    base_tan: jax.Array  # (Fb,3) per-face tangent, OUR padding (the
    base_bit: jax.Array  # template's arrays are FACE_PAD-padded and
    #                      diverge once the soup superblock-aligns)
    n_instances: int
    fb_real: int  # real (unpadded) faces per instance

    @staticmethod
    def from_config(mesh_cfg, n_instances: int) -> "InstancedScene":
        from ..config import MeshConfig, RenderConfig, SceneConfig
        from ..io.obj import load_obj, make_cube
        from ..config import resolve_asset

        if mesh_cfg.obj_path == "builtin:cube":
            meshes = [make_cube()]
        else:
            meshes, _ = load_obj(resolve_asset(mesh_cfg.obj_path))
        # concatenate ALL OBJ groups with their material ids (matching
        # Scene.build's soup — a multi-group model must not silently
        # lose every group but the first)
        pos_l, uv_l, nrm_l, faces_l, fmat_l = [], [], [], [], []
        off = 0
        for m in meshes:
            p = (m.positions * np.float32(mesh_cfg.scale)
                 + np.asarray(mesh_cfg.translation, np.float32))
            pos_l.append(p)
            uv_l.append(m.uvs)
            nrm_l.append(m.normals)
            faces_l.append(m.faces + off)
            fmat_l.append(np.full((m.faces.shape[0],), m.material_id,
                                  np.int32))
            off += p.shape[0]
        pos = np.concatenate(pos_l).astype(np.float32)
        uvs = np.concatenate(uv_l).astype(np.float32)
        nrms = np.concatenate(nrm_l).astype(np.float32)
        faces = np.concatenate(faces_l).astype(np.int32)
        face_mat = np.concatenate(fmat_l)

        # Morton-sort ONCE on the base mesh
        from .bvh import morton_order
        order = morton_order(pos[faces[:, 0]], pos[faces[:, 1]],
                             pos[faces[:, 2]])
        faces = faces[order]
        face_mat = face_mat[order]

        # per-face tangent frames at OUR padding (normal mapping)
        from ..core.scene import _pad_rows, _precompute_faces
        (_, _, _, _, _, _, _, _, tangent,
         bitangent) = _precompute_faces(pos, uvs, nrms, faces)

        fb_real = faces.shape[0]
        fb = -(-fb_real // FACE_PAD) * FACE_PAD
        if n_instances * fb > STREAM_FACES:
            # superblock-align each instance so the streaming kernels see
            # whole 1024-face superblocks over the instanced soup
            fb = -(-fb_real // SUPER_F) * SUPER_F
        pad = fb - fb_real
        faces_p = np.concatenate(
            [faces, np.zeros((pad, 3), np.int32)], axis=0)
        valid = np.concatenate(
            [np.ones(fb_real, np.float32), np.zeros(pad, np.float32)])

        uv3 = uvs[faces_p]
        vn3 = nrms[faces_p]

        # template SceneData: build a single-instance Scene for the
        # shared material/texture arrays, then tile to N instances
        base_scene = Scene.build(SceneConfig(
            meshes=(mesh_cfg,), render=RenderConfig(width=8, height=8)))
        sd = base_scene.data

        inst = InstancedScene(
            template=sd,
            base_pos=jnp.asarray(pos),
            base_faces=jnp.asarray(faces_p),
            base_uv3=jnp.asarray(uv3.astype(np.float32)),
            base_vn3=jnp.asarray(vn3.astype(np.float32)),
            base_mat=jnp.asarray(_pad_rows(face_mat, fb)),
            base_valid=jnp.asarray(valid),
            base_tan=jnp.asarray(_pad_rows(tangent, fb)),
            base_bit=jnp.asarray(_pad_rows(bitangent, fb)),
            n_instances=n_instances,
            fb_real=fb_real,
        )
        return inst

    def instantiate(self, transforms) -> SceneData:
        """(N,3,4) affine transforms -> SceneData. Runs as ONE jitted
        program (eager per-op dispatch costs ~3 ms each on tunneled
        backends — an un-jitted refit was ~5x the whole render); this IS
        the per-frame refit."""
        t = jnp.asarray(transforms, jnp.float32)
        assert t.shape == (self.n_instances, 3, 4), t.shape
        nf = self.n_instances * self.base_faces.shape[0]
        # decided HERE (not inside the jit body) so the trace cache
        # can't pin a stale read of the module global
        build_spack = nf > STREAM_FACES and nf % SUPER_F == 0
        return _instantiate_jit(
            self.template, self.base_pos, self.base_faces, self.base_uv3,
            self.base_vn3, self.base_mat, self.base_valid,
            self.base_tan, self.base_bit, self.n_instances,
            self.fb_real, t, build_spack)


@functools.partial(jax.jit, static_argnames=("n", "fb_real",
                                             "build_spack"))
def _instantiate_jit(template, base_pos, base_faces, base_uv3, base_vn3,
                     base_mat, base_valid, base_tan, base_bit, n,
                     fb_real, t, build_spack) -> SceneData:
        fb = base_faces.shape[0]

        # transformed vertices per instance: (N, V, 3)
        v = jnp.einsum("nij,vj->nvi", t[:, :, :3], base_pos,
                       precision=jax.lax.Precision.HIGHEST) + t[:, None, :, 3]

        f = base_faces
        p0 = v[:, f[:, 0], :].reshape(-1, 3)  # (N*Fb, 3)
        p1 = v[:, f[:, 1], :].reshape(-1, 3)
        p2 = v[:, f[:, 2], :].reshape(-1, 3)

        e0 = p1 - p0
        e1 = p2 - p1
        e2 = p0 - p2
        nrm = jnp.cross(e0, p2 - p0)
        denom = jnp.sum(nrm * nrm, axis=1)
        d = -jnp.sum(nrm * p0, axis=1)
        g0 = jnp.cross(nrm, e0)
        g1 = jnp.cross(nrm, e1)
        g2 = jnp.cross(nrm, e2)
        c0 = jnp.sum(p0 * g0, axis=1)
        c1 = jnp.sum(p1 * g1, axis=1)
        c2 = jnp.sum(p2 * g2, axis=1)
        valid = jnp.tile(base_valid, n)
        inv_denom = jnp.where((denom > 0) & (valid > 0),
                              1.0 / jnp.maximum(denom, 1e-30), 0.0)
        nrm = nrm * valid[:, None]  # padding faces -> N=0 (never hit)

        # cluster-AABB refit: segment min/max over CULL_BLOCK runs
        nf = n * fb
        nb = nf // CULL_BLOCK

        def seg(x, red):
            return red(x.reshape(nb, CULL_BLOCK, 3), axis=1)

        blk_lo = jnp.minimum(jnp.minimum(
            seg(jnp.where(valid[:, None] > 0, p0, jnp.inf), jnp.min),
            seg(jnp.where(valid[:, None] > 0, p1, jnp.inf), jnp.min)),
            seg(jnp.where(valid[:, None] > 0, p2, jnp.inf), jnp.min))
        blk_hi = jnp.maximum(jnp.maximum(
            seg(jnp.where(valid[:, None] > 0, p0, -jnp.inf), jnp.max),
            seg(jnp.where(valid[:, None] > 0, p1, -jnp.inf), jnp.max)),
            seg(jnp.where(valid[:, None] > 0, p2, -jnp.inf), jnp.max))

        # rotate the per-face tangent frames (built at OUR padding in
        # from_config — the template's arrays diverge once the soup
        # superblock-aligns past STREAM_FACES)
        def rot_dirs(vecs):
            out = jnp.einsum("nij,fj->nfi", t[:, :, :3], vecs,
                             precision=jax.lax.Precision.HIGHEST)
            out = out.reshape(-1, 3)
            l = jnp.linalg.norm(out, axis=1, keepdims=True)
            return out / jnp.where(l > 1e-12, l, 1.0)

        orig = jnp.arange(nf, dtype=jnp.int32)
        # uv density for the mip path: uv areas are transform-invariant,
        # world area = |refit N|/2 — exact under ANY affine refit
        uv3_tiled = jnp.tile(base_uv3, (n, 1, 1))
        duv1 = uv3_tiled[:, 1] - uv3_tiled[:, 0]
        duv2 = uv3_tiled[:, 2] - uv3_tiled[:, 0]
        uvdet = jnp.abs(duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0])
        nlen = jnp.linalg.norm(nrm, axis=1)
        uvscale = jnp.sqrt(jnp.where(nlen > 1e-30,
                                     uvdet / jnp.maximum(nlen, 1e-30),
                                     0.0)) * valid
        sd = dataclasses.replace(
            template,
            tri_uvscale=uvscale,
            tri_tangent=rot_dirs(base_tan),
            tri_bitangent=rot_dirs(base_bit),
            tri_p0=p0,
            tri_n=nrm,
            tri_d=d * valid,
            tri_g=jnp.stack([g0, g1, g2], axis=1) * valid[:, None, None],
            tri_c=jnp.stack([c0, c1, c2], axis=1),
            tri_inv_denom=inv_denom,
            tri_uv=jnp.tile(base_uv3, (n, 1, 1)),
            tri_vn=jnp.tile(base_vn3, (n, 1, 1)),
            tri_mat=jnp.tile(base_mat, n),
            tri_valid=valid,
            tri_orig=orig,
            blk_lo=blk_lo,
            blk_hi=blk_hi,
            # the template's host-precomputed streaming records describe
            # the untransformed mesh — stale once instances move
            spack=jnp.zeros((0, STREAM_COLS), jnp.float32),
            gpack=jnp.zeros((GPACK_ROWS, 0), jnp.float32),
            # the host-built radix tree is stale once instances move
            # (accel="bvh" only needs the refit blk_lo/hi, so the
            # hierarchical cull still applies)
            bvh_nodes=0,
            # COUNT of real faces (padding is interleaved per instance,
            # so unlike Scene.build this is not a prefix length;
            # tri_valid carries per-face truth)
            num_faces=int(n * fb_real),
        )
        if build_spack:
            # streaming-scale refit: rebuild the streaming record HERE,
            # once per frame, in superblock chunks (the one-shot in-jit
            # build OOMs HBM at 2M faces on layout-padded narrow temps;
            # ops/megakernel.pack_stream_columns_chunked) — every
            # kernel of the frame then shares the refreshed record
            from .megakernel import (gpack_from_stream,
                                     pack_stream_columns_chunked)

            sp = pack_stream_columns_chunked(sd)
            # derive the winner-attribute table here too, so the
            # frame's kernels (separate jit entries) don't each
            # re-derive it from spack
            sd = dataclasses.replace(
                sd, spack=sp, gpack=gpack_from_stream(sp))
        else:
            # sub-streaming refit: every closest-hit path now resolves
            # winner attributes from gpack (expand_tf_gbuffer), so
            # refresh it once per refit — otherwise each kernel entry
            # of the frame re-derives the full (F, 128) record in-jit
            from .megakernel import gpack_from_stream, pack_stream_columns

            sd = dataclasses.replace(
                sd, gpack=gpack_from_stream(pack_stream_columns(sd)))
        return sd


def grid_transforms(n: int, spacing: float = 2.5, z: float = -10.0,
                    angle: float = 0.0):
    """A sqrt(n) x sqrt(n) grid of y-rotated instances (the analogue of
    the reference's dead 10x10 instance grid, src/lib.rs:114-134)."""
    side = int(np.ceil(np.sqrt(n)))
    ts = []
    ca, sa = np.cos(angle), np.sin(angle)
    rot = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32)
    for i in range(n):
        gx = (i % side) - (side - 1) / 2.0
        gy = (i // side) - (side - 1) / 2.0
        t = np.concatenate(
            [rot, np.array([[gx * spacing], [gy * spacing], [z]],
                           np.float32)], axis=1)
        ts.append(t)
    return np.stack(ts)  # (n, 3, 4)
