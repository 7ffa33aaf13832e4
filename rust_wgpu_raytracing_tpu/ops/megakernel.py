"""Pallas TPU intersection kernels + the fused planar frame function.

TPU-native re-design of the reference's per-pixel WGSL kernels
(src/models/*/compute.wgsl): instead of one GPU thread per pixel looping
over faces (triangle_list/compute.wgsl:190-202, dispatched as W*H
workgroups of size 1, src/lib.rs:1183), rays ride the 128-wide LANE axis
and faces ride the SUBLANE axis; every (face, ray) pair in a
(BLOCK_F, TILE_R) tile is evaluated with broadcast FMAs on the VPU.

Measured-on-hardware design rules baked in here (TPU v5e, JAX 0.9):
- XLA per-ray gathers cost ~10-25 ns/element regardless of table size,
  i.e. ~20-50 ms/frame at 1080p PER GATHER — so the kernel resolves ALL
  per-face attributes in-register via winner-masked reductions ("picks")
  and the frame does exactly ONE gather: the texture fetch;
- u8 gather payloads are ~4x cheaper than f32 — the texture gather reads
  a 12-byte packed 2x2 sRGB neighborhood per ray (SceneData.tex_packed)
  so bilinear filtering needs a single gather (~5 ms at 1080p);
- the whole frame is ONE jit: dispatches cost ~3 ms each on this
  backend, and `block_until_ready` does not truly synchronize — timing
  must be amortized over pipelined dispatches (see runtime/profiler.py);
- everything per-ray is PLANAR (separate (R,) arrays per component):
  arrays with tiny trailing dims (R,3)/(R,6) get lane-padded to 128 on
  TPU and relayouts show up as tens of ms.

The derivation of the affine per-face intersection form is in
core/scene.py; numerical semantics match ops/intersect.py (the oracle),
which these kernels are tested against (u8-exact framebuffers).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.camera import CameraUniforms
from ..core.scene import (CULL_BLOCK,
                          GP_C1, GP_C2, GP_G1, GP_G2, GP_INVD, GP_MAT,
                          GP_N, GP_TAN, GP_UN, GP_UV, GP_VN,
                          GPACK_ROWS, GPACK_SRC_COLS, SC_DC, SC_OT,
                          STREAM_COLS, STREAM_FACES, SUPER_F, SceneData)
from .composite import to_nonlinear_depth
from .intersect import HI, K_EPSILON, TriHit
from .raygen import ndc_grid
from .traverse import (perray_boxes_any, perray_super_any,
                       ray_root_exit, slab_interval_entry,
                       slab_interval_ok, tile_ray_bounds)
from .traverse_pallas import hier_cull_fits, hier_cull_words

INT_MISS = 2**31 - 1  # python scalars only: traced constants cannot be
F32_INF = float("inf")  # captured inside a pallas kernel body

# rays per tile (lanes) x faces per block (sublanes). 1D VMEM blocks
# must be multiples of 1024 (8 sublanes x 128 lanes) to match XLA's
# T(1024) tiling for f32[N] operands. BLOCK_F equals the scene's Morton
# cull-cluster size so the per-(tile, cluster) activity mask maps 1:1
# onto grid steps.
TILE_R = 1024
BLOCK_F = 32
# expand_tf_gbuffer one-hot-MXU winner fetch cutoff: the contraction's
# cost grows with F while the gather's is flat (~9 ms at 1080p), so
# small tables take the MXU (128 faces: 1.24 ms) and large ones gather
ONEHOT_EXPAND_MAX_F = 512

# fpack column layout (per face), see pack_face_columns()
_C_N = 0  # 0-2   N (unnormalized geometric normal)
_C_G0 = 3  # 3-11  g_i = N x edge_i
_C_INVD = 12  # 1/(N.N)
_C_UN = 13  # 13-15 unit normal
_C_UV = 16  # 16-21 uv corners (u0,v0,u1,v1,u2,v2)
_C_MAT = 22  # material id (exact small int in f32)
_C_ORIG = 23  # original (pre-Morton-sort) face id, exact in f32 < 2^24
_C_TAN = 24  # 24-26 tangent, 27-29 bitangent (normal mapping)
_C_VN = 30  # 30-38 per-corner vertex normals (vn0 vn1 vn2, xyz each)
FPACK_COLS = 40


class GBuffer(NamedTuple):
    """Planar per-ray intersection + shading inputs, all (R,) f32/i32."""

    t: jax.Array
    face: jax.Array  # i32, INT_MISS-free (0 on miss)
    u: jax.Array  # normalized barycentric (corner 0 weight)
    v: jax.Array
    nd: jax.Array  # N.D at winner (sign decides normal flip)
    uvx: jax.Array  # interpolated texture coords (pre-V-flip)
    uvy: jax.Array
    nx: jax.Array  # unit geometric normal, NOT yet flipped
    ny: jax.Array
    nz: jax.Array
    mat: jax.Array  # material id as f32
    # normal-mapping extras (None unless requested with with_nm=True)
    vnx: Optional[jax.Array] = None  # interpolated vertex normal
    vny: Optional[jax.Array] = None
    vnz: Optional[jax.Array] = None
    tx: Optional[jax.Array] = None  # per-face tangent
    ty: Optional[jax.Array] = None
    tz: Optional[jax.Array] = None
    bx: Optional[jax.Array] = None  # per-face bitangent
    by: Optional[jax.Array] = None
    bz: Optional[jax.Array] = None


def pack_face_columns(scene: SceneData) -> jnp.ndarray:
    """(F, FPACK_COLS) f32 per-face static pack (see column constants)."""
    f = scene.tri_p0.shape[0]
    n = scene.tri_n
    nlen = jnp.sqrt(jnp.sum(n * n, axis=1, keepdims=True))
    un = jnp.where(nlen > 0, n / jnp.where(nlen > 0, nlen, 1.0), 0.0)
    cols = [
        n,  # 0-2
        scene.tri_g.reshape(f, 9),  # 3-11
        scene.tri_inv_denom[:, None],  # 12
        un,  # 13-15
        scene.tri_uv.reshape(f, 6),  # 16-21
        scene.tri_mat.astype(jnp.float32)[:, None],  # 22
        scene.tri_orig.astype(jnp.float32)[:, None],  # 23
        scene.tri_tangent,  # 24-26
        scene.tri_bitangent,  # 27-29
        scene.tri_vn.reshape(f, 9),  # 30-38
        jnp.zeros((f, 1), jnp.float32),  # 39
    ]
    return jnp.concatenate(cols, axis=1)


def pack_origin_cols(scene: SceneData, origin) -> jnp.ndarray:
    """(F, 8) f32 per-frame origin terms for shared-origin rays:
    cols [t_num, hc0, hc1, hc2, 0...] with t_num = -(N.O + d),
    hc_i = O.g_i - c_i."""
    o = jnp.asarray(origin, jnp.float32)
    t_num = -(jnp.matmul(scene.tri_n, o, precision=HI) + scene.tri_d)
    hc = jnp.einsum("fij,j->fi", scene.tri_g, o, precision=HI) - scene.tri_c
    f = t_num.shape[0]
    return jnp.concatenate(
        [t_num[:, None], hc, jnp.zeros((f, 4), jnp.float32)], axis=1)


# Streaming pack layout: see core/scene.py (STREAM_COLS, SC_DC, SC_OT).
# The per-frame shared-origin terms land in the record's SC_OT slot via
# ONE dynamic_update_slice into the host-precomputed pack per frame
# (gbuffer_pallas): assembling the whole 128-col record in-jit forced
# every narrow operand into the result's (8,128)-tiled layout (~18
# one-GB temp copies at 2M faces — an HBM OOM). Mosaic DMA slices need
# 128-aligned minor dims, so a separate (F, 8) ride-along cannot
# stream on its own.


def _stream_pack(scene: SceneData) -> jnp.ndarray:
    """The (F, STREAM_COLS) streaming face record: the host-precomputed
    SceneData.spack when present (Scene.build, big scenes), else built
    in-jit (device-refit instanced scenes, forced-stream tests) — per
    SUPERBLOCK once past streaming scale: the one-shot build's narrow
    concat operands pad to the result's (8, 128) tiling, which OOMed
    HBM at 2M faces (core/scene.py:54-57); 1024-face chunks keep every
    temp at ~0.5 MB."""
    f = scene.tri_p0.shape[0]
    if scene.spack is not None and scene.spack.shape[0] == f:
        return scene.spack
    if f > STREAM_FACES and f % SUPER_F == 0:
        return pack_stream_columns_chunked(scene)
    return pack_stream_columns(scene)


def pack_stream_columns(scene: SceneData) -> jnp.ndarray:
    """In-jit fallback build of the streaming record (static columns
    only — origin terms ride separately). Fine for small/instanced
    scenes; large static scenes use the host-built SceneData.spack."""
    f = scene.tri_p0.shape[0]
    fpack = pack_face_columns(scene)
    dc = jnp.concatenate([scene.tri_d[:, None], scene.tri_c], axis=1)
    return jnp.concatenate([
        fpack,
        dc,
        jnp.zeros((f, STREAM_COLS - SC_DC - 4), jnp.float32),
    ], axis=1)


def pack_stream_columns_chunked(scene: SceneData) -> jnp.ndarray:
    """Device-side streaming-record build in SUPER_F-face chunks: one
    superblock's columns are assembled from narrow operands (each temp
    (1024, <=128) ~ 0.5 MB) and placed with dynamic_update_slice into
    the preallocated (F, 128) record — a lax.fori_loop over superblocks.
    This is what lets LARGE refit/instanced scenes stream: the template
    spack is stale after `instantiate`, and the one-shot in-jit rebuild
    at 2M faces materialized ~GB-scale layout-padded temps (HBM OOM)."""
    import dataclasses as _dc

    f = scene.tri_p0.shape[0]
    ns = f // SUPER_F
    out = jnp.zeros((f, STREAM_COLS), jnp.float32)

    def body(s, acc):
        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, s * SUPER_F, SUPER_F, 0)

        sub = _dc.replace(
            scene, tri_p0=sl(scene.tri_p0), tri_n=sl(scene.tri_n),
            tri_g=sl(scene.tri_g),
            tri_inv_denom=sl(scene.tri_inv_denom),
            tri_uv=sl(scene.tri_uv), tri_mat=sl(scene.tri_mat),
            tri_orig=sl(scene.tri_orig),
            tri_tangent=sl(scene.tri_tangent),
            tri_bitangent=sl(scene.tri_bitangent),
            tri_vn=sl(scene.tri_vn), tri_d=sl(scene.tri_d),
            tri_c=sl(scene.tri_c))
        chunk = pack_stream_columns(sub)
        return jax.lax.dynamic_update_slice(acc, chunk, (s * SUPER_F, 0))

    return jax.lax.fori_loop(0, ns, body, out)


def gpack_from_stream(spack: jnp.ndarray) -> jnp.ndarray:
    """In-jit chunked derivation of the (GPACK_ROWS, F) winner-attribute
    table from a full streaming record (device-refit scenes whose host
    gpack is stale)."""
    f = spack.shape[0]
    cols = jnp.asarray(GPACK_SRC_COLS, jnp.int32)
    if f <= SUPER_F:  # small (refit/instanced) scenes: one shot
        return jnp.take(spack, cols, axis=1).T
    # ceil-div so a tail partial superblock is covered: both dynamic
    # slice AND update clamp the final chunk's start to f - SUPER_F,
    # so the overlap rewrites identical values and no face is skipped
    ns = -(-f // SUPER_F)
    out = jnp.zeros((GPACK_ROWS, f), jnp.float32)

    def body(s, acc):
        chunk = jax.lax.dynamic_slice_in_dim(spack, s * SUPER_F,
                                             SUPER_F, 0)
        rows = jnp.take(chunk, cols, axis=1).T  # (GPACK_ROWS, SUPER_F)
        return jax.lax.dynamic_update_slice(acc, rows, (0, s * SUPER_F))

    return jax.lax.fori_loop(0, ns, body, out)


def _gpack_stream(scene: SceneData) -> jnp.ndarray:
    """The (GPACK_ROWS, F) winner-attribute table: host-precomputed
    SceneData.gpack when fresh, else derived in-jit (chunked) from the
    full streaming record for device-refit scenes."""
    f = scene.tri_p0.shape[0]
    if scene.gpack is not None and scene.gpack.shape[1] == f:
        return scene.gpack
    return gpack_from_stream(_stream_pack(scene))


def expand_tf_gbuffer(scene: SceneData, t, face, dx, dy, dz,
                      origin=None, oxyz=None, oterm=None,
                      with_nm: bool = False) -> "GBuffer":
    """Resolve the fat G-buffer from a (t, face)-only sweep: ONE planar
    gather of the winner faces' columns (gpack — gathers cost per
    index, payload-insensitive), then h1/h2/ndotd and the shading
    attributes are RECOMPUTED with exactly the kernels' expressions
    applied to the winner's gathered values — the same products of the
    same floats in the same order, so results are bit-identical to the
    in-kernel fat merge (tested, incl. the on-TPU gate).

    Shared-origin rays pass `origin` (+ optionally the frame's `oterm`
    so the h-plane origin terms are the EXACT floats the kernel read;
    recomputed via pack_origin_cols when omitted — XLA CSEs the dup);
    per-ray-origin rays (bounces) pass oxyz=(ox, oy, oz) and the origin
    terms are recomputed per ray exactly as _chp_block_slim does. Miss
    rays (t == inf) zero every attribute, matching the kernels'
    zero-initialized outputs."""
    gp = _gpack_stream(scene)
    idx = jnp.clip(face, 0, gp.shape[1] - 1)
    # Winner fetch, two regimes (round 5, tools/prof_pt_gathers.py):
    # small face tables ride the MXU — a {0,1} one-hot contraction at
    # HIGHEST precision selects each f32 BIT-EXACTLY (per output
    # exactly one term is x*1.0, the rest x*0.0; no rounding exists to
    # apply — verified == against the gather on-chip and on CPU) and
    # costs 1.24 ms vs 8.9 ms at 1080p: gathers price per INDEX
    # (~4 ns even for all-zero indices) while the MXU contraction is
    # bandwidth-priced. Cost scales with F, so big tables keep the
    # row-major gather ((ROWS, F).T first — each winner one contiguous
    # ~148 B fetch instead of ROWS strided 4 B reads, the af76be6 fix).
    oh = None
    if gp.shape[1] <= ONEHOT_EXPAND_MAX_F:
        oh = (idx[:, None] == jnp.arange(gp.shape[1], dtype=idx.dtype)
              [None, :]).astype(jnp.float32)
        a = jax.lax.dot_general(oh, gp.T, (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST).T
    else:
        a = jnp.take(gp.T, idx, axis=0).T  # (GPACK_ROWS, R)
    hit = jnp.isfinite(t)

    def m(x):
        return jnp.where(hit, x, 0.0)

    ts = jnp.where(hit, t, 0.0)  # inf * 0 = NaN; masked anyway, but
    # keep the recompute lanes finite so debug NaN checks stay quiet
    nd = (a[GP_N] * dx + a[GP_N + 1] * dy + a[GP_N + 2] * dz)
    g1d = a[GP_G1] * dx + a[GP_G1 + 1] * dy + a[GP_G1 + 2] * dz
    g2d = a[GP_G2] * dx + a[GP_G2 + 1] * dy + a[GP_G2 + 2] * dz
    if oxyz is not None:  # per-ray origins: _chp_block_slim's hplane
        ox, oy, oz = oxyz
        o1 = (a[GP_G1] * ox + a[GP_G1 + 1] * oy + a[GP_G1 + 2] * oz
              - a[GP_C1])
        o2 = (a[GP_G2] * ox + a[GP_G2 + 1] * oy + a[GP_G2 + 2] * oz
              - a[GP_C2])
    else:  # shared origin: gather the frame's exact origin-term floats
        if oterm is None:
            oterm = pack_origin_cols(scene, origin)
        if oh is not None:  # same one-hot, same exactness argument
            og = jax.lax.dot_general(oh, oterm[:, 2:4],
                                     (((1,), (0,)), ((), ())),
                                     precision=jax.lax.Precision.HIGHEST)
        else:
            og = jnp.take(oterm[:, 2:4], idx, axis=0)  # row-major
        o1, o2 = og[:, 0], og[:, 1]
    h1 = o1 + ts * g1d
    h2 = o2 + ts * g2d

    u_n = h1 * a[GP_INVD]
    v_n = h2 * a[GP_INVD]
    w_n = 1.0 - u_n - v_n
    uvx = u_n * a[GP_UV] + v_n * a[GP_UV + 2] + w_n * a[GP_UV + 4]
    uvy = u_n * a[GP_UV + 1] + v_n * a[GP_UV + 3] + w_n * a[GP_UV + 5]

    nm = dict()
    if with_nm:
        for ax, (vk, tk, bk) in enumerate(
                zip(("vnx", "vny", "vnz"), ("tx", "ty", "tz"),
                    ("bx", "by", "bz"))):
            nm[vk] = m(u_n * a[GP_VN + ax] + v_n * a[GP_VN + 3 + ax]
                       + w_n * a[GP_VN + 6 + ax])
            nm[tk] = m(a[GP_TAN + ax])
            nm[bk] = m(a[GP_TAN + 3 + ax])

    return GBuffer(t=t, face=face, u=m(u_n), v=m(v_n), nd=m(nd),
                   uvx=m(uvx), uvy=m(uvy),
                   nx=m(a[GP_UN]), ny=m(a[GP_UN + 1]),
                   nz=m(a[GP_UN + 2]), mat=m(a[GP_MAT]), **nm)


def _col(ref, k):
    return ref[:, k:k + 1]  # (BLOCK_F, 1)


def _row1(ref):
    return ref[:].reshape(1, -1)  # 1D (TILE_R,) block -> (1, TILE_R)


def _ordered_cluster_loop(tlb_ref, order_ref, nb, visit, bound_fn,
                          refresh: int = 4):
    """In-kernel FRONT-TO-BACK cluster loop for the all-VMEM kernels:
    order_ref (1,1,nb) SMEM holds the tile's clusters sorted ascending
    by conservative entry t (tlb_ref, +inf for culled clusters — the
    cull mask is folded into the schedule), so the while_loop stops at
    the first cluster whose entry bound exceeds bound_fn() =
    max_ray(min(best_t, root_exit)): no later cluster can improve any
    lexicographic (t, face) winner. Exact — same guarantee as the
    streaming loop's stop_fn (see _stream_sched), at single-cluster
    granularity. An all-culled tile costs ONE scalar compare (tlb inf),
    replacing the word scan entirely.

    The bound is a full cross-lane reduction over the tile — at 8-face
    cluster granularity it costs about as much as the visit itself —
    so it is recomputed only every `refresh` visits and carried stale
    in between. A stale bound is the max over an OLDER (no smaller)
    best-t state, so the admitted cluster set is a superset of the
    per-visit-exact one and merges are idempotent: results stay
    bit-identical (tested), the loop just stops up to refresh-1
    clusters later."""

    def cond(c):
        p, b = c
        ci = order_ref[0, 0, jnp.minimum(p, nb - 1)]
        return jnp.logical_and(p < nb, tlb_ref[0, 0, ci] <= b)

    def body(c):
        p, b = c
        visit(order_ref[0, 0, p])
        b = jax.lax.cond((p + 1) % refresh == 0, bound_fn, lambda: b)
        return p + 1, b

    jax.lax.while_loop(cond, body, (jnp.int32(0), bound_fn()))


def _make_closest_hit_kernel(block_f: int, n_blocks: int,
                             n_spheres: int = 0,
                             near: float = 0.01, far: float = 100.0):
    """Kernel factory (grid = ray tiles ONLY; the face-cluster loop runs
    INSIDE the kernel over the fully-VMEM-resident face pack — grid-step
    overhead is ~0.75us/step on v5e, and looping in-kernel removes the
    (tiles x clusters - tiles) extra steps), clusters visited
    front-to-back with exact early termination (_ordered_cluster_loop).
    (t, face)-only merge: shading attributes (and the nm extras)
    resolve post-sweep in expand_tf_gbuffer — dropping the 9-18
    attribute picks per block visit (each a masked cross-sublane
    reduction + merge) cuts the dense-view sweep the same way the slim
    merge cut the streamed one.

    n_spheres > 0 FUSES the frame's sphere passes into the same sweep
    (VERDICT r2 #3): sph_ref carries [ox, oy, oz] + 4 floats per
    sphere in SMEM and the kernel emits the winning sphere's
    (t, id, unit normal) — ~28 row ops per sphere per tile, replacing
    one full-screen XLA pass per sphere (~1 ms each at 1080p; the
    separate passes re-read the ray planes from HBM and materialize 5
    planes each). The winner is selected by NONLINEAR depth with
    strict <, exactly the sequential composite's rule — distinct t can
    round to equal d in f32, so selecting by t would disagree with the
    reference's pass order on such ties (composite.py
    to_nonlinear_depth; math mirrors sphere_pass_planar float-for-
    float, division/sqrt are correctly rounded on both paths)."""

    def kernel(tlb_ref, order_ref, dx_ref, dy_ref, dz_ref, texit_ref,
               fpack_ref, oterm_ref, *refs):
        if n_spheres:
            sph_ref = refs[0]
            (t_ref, face_ref, st_ref, sid_ref,
             snx_ref, sny_ref, snz_ref) = refs[1:]
        else:
            t_ref, face_ref = refs
        t_ref[:] = jnp.full_like(t_ref, F32_INF)
        face_ref[:] = jnp.zeros_like(face_ref)

        dx = _row1(dx_ref)  # (1, TILE_R)
        dy = _row1(dy_ref)
        dz = _row1(dz_ref)

        def visit(jj):
            base = pl.multiple_of(jj * block_f, block_f)
            g = fpack_ref[pl.ds(base, block_f), :]
            o = oterm_ref[pl.ds(base, block_f), :]
            _ch_block_slim(g, o, dx, dy, dz, jj * block_f,
                           t_ref, face_ref, gc0=0, oc0=0)

        def bound():
            return jnp.max(jnp.minimum(t_ref[:], texit_ref[:]))

        _ordered_cluster_loop(tlb_ref, order_ref, n_blocks, visit, bound)

        if n_spheres:
            ox, oy, oz = sph_ref[0], sph_ref[1], sph_ref[2]
            a = dx * dx + dy * dy + dz * dz
            inv_n, inv_f = 1.0 / near, 1.0 / far
            shape = a.shape
            best_d = jnp.full(shape, F32_INF)
            best_t = jnp.full(shape, F32_INF)
            best_id = jnp.zeros(shape)
            best_cx = jnp.zeros(shape)
            best_cy = jnp.zeros(shape)
            best_cz = jnp.zeros(shape)
            for i in range(n_spheres):
                cx, cy, cz, radius = (sph_ref[3 + 4 * i],
                                      sph_ref[4 + 4 * i],
                                      sph_ref[5 + 4 * i],
                                      sph_ref[6 + 4 * i])
                ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
                b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
                c = (ocx * ocx + ocy * ocy + ocz * ocz) - radius * radius
                disc = b * b - 4.0 * a * c
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t1 = (-b - sq) / (2.0 * a)
                t2 = (-b + sq) / (2.0 * a)
                t = jnp.where(t1 >= 0.0, t1,
                              jnp.where(t2 >= 0.0, t2, F32_INF))
                t = jnp.where(disc < 0.0, F32_INF, t)
                hit = jnp.isfinite(t)
                d = jnp.where(hit,
                              ((1.0 / t) - inv_n) / (inv_f - inv_n),
                              F32_INF)
                upd = d < best_d
                best_d = jnp.where(upd, d, best_d)
                best_t = jnp.where(upd, t, best_t)
                best_id = jnp.where(upd, jnp.float32(i), best_id)
                best_cx = jnp.where(upd, cx, best_cx)
                best_cy = jnp.where(upd, cy, best_cy)
                best_cz = jnp.where(upd, cz, best_cz)
            hit = jnp.isfinite(best_t)
            ts = jnp.where(hit, best_t, 0.0)
            px, py, pz = ox + dx * ts, oy + dy * ts, oz + dz * ts
            nx = px - best_cx
            ny = py - best_cy
            nz = pz - best_cz
            l = jnp.sqrt(nx * nx + ny * ny + nz * nz)
            l = jnp.where(l > 0, l, 1.0)
            st_ref[:] = best_t.reshape(-1)
            sid_ref[:] = best_id.reshape(-1)
            snx_ref[:] = (nx / l).reshape(-1)
            sny_ref[:] = (ny / l).reshape(-1)
            snz_ref[:] = (nz / l).reshape(-1)

    return kernel


def _ch_block(g, o, dx, dy, dz, face_base,
              t_ref, face_ref, u_ref, v_ref, nd_ref,
              uvx_ref, uvy_ref, nx_ref, ny_ref, nz_ref, mat_ref, nm_refs):
    """Intersect one face block (values g/o, shapes (BF, COLS)) against
    the tile's rays and merge winners into the output refs."""

    def col(m, k):
        return m[:, k:k + 1]

    ndotd = col(g, 0) * dx + col(g, 1) * dy + col(g, 2) * dz
    t = col(o, 0) / ndotd
    h0 = col(o, 1) + t * (col(g, 3) * dx + col(g, 4) * dy + col(g, 5) * dz)
    h1 = col(o, 2) + t * (col(g, 6) * dx + col(g, 7) * dy + col(g, 8) * dz)
    h2 = col(o, 3) + t * (col(g, 9) * dx + col(g, 10) * dy
                          + col(g, 11) * dz)

    valid = (
        (jnp.abs(ndotd) >= K_EPSILON)
        & (t >= 0.0)
        & (h0 >= 0.0)
        & (h1 >= 0.0)
        & (h2 >= 0.0)
    )
    tm = jnp.where(valid, t, F32_INF)

    # block-local winner (min t; first face in block order on ties).
    # The cross-block merge below is LEXICOGRAPHIC on (t, face id) —
    # visit-ORDER-independent, so t-sorted front-to-back streaming
    # (early termination) and ascending Morton sweeps produce the same
    # winner: the smallest face id among the global min-t faces, which
    # is exactly what the reference's strict-< update rule
    # (triangle_list/compute.wgsl:198) selects in Morton face order.
    tmin = jnp.min(tm, axis=0, keepdims=True)  # (1, TILE_R)
    face_ids = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
    idx_blk = jnp.min(
        jnp.where(tm == tmin, face_ids, INT_MISS), axis=0, keepdims=True)
    win = face_ids == idx_blk  # at most one True per column

    def pick(m):
        # MUST be a select, not win*m: padding faces carry NaN (0/0
        # plane math) and 0*NaN would poison the sum.
        return jnp.sum(jnp.where(win, m, 0.0), axis=0, keepdims=True)

    invd = col(g, _C_INVD)
    u_n = h1 * invd
    v_n = h2 * invd
    w_n = 1.0 - u_n - v_n
    uvx_m = (u_n * col(g, _C_UV) + v_n * col(g, _C_UV + 2)
             + w_n * col(g, _C_UV + 4))
    uvy_m = (u_n * col(g, _C_UV + 1) + v_n * col(g, _C_UV + 3)
             + w_n * col(g, _C_UV + 5))

    # lexicographic (t, face id) merge: order-independent (see above).
    # A no-hit block has tmin == inf and a miss face id >= face_base,
    # which can never displace a real hit (inf < t is false; on the
    # inf == inf tie the incumbent face id 0 <= any miss id wins).
    prev_t = _row1(t_ref)
    new_face = idx_blk + face_base
    better = ((tmin < prev_t)
              | ((tmin == prev_t)
                 & (new_face < _row1(face_ref)))).reshape(-1)

    def merge(ref, new):
        ref[:] = jnp.where(better, new.reshape(-1), ref[:])

    merge(t_ref, tmin)
    merge(face_ref, new_face)
    merge(u_ref, pick(u_n))
    merge(v_ref, pick(v_n))
    merge(nd_ref, pick(ndotd))
    merge(uvx_ref, pick(uvx_m))
    merge(uvy_ref, pick(uvy_m))
    merge(nx_ref, pick(jnp.broadcast_to(col(g, _C_UN), tm.shape)))
    merge(ny_ref, pick(jnp.broadcast_to(col(g, _C_UN + 1), tm.shape)))
    merge(nz_ref, pick(jnp.broadcast_to(col(g, _C_UN + 2), tm.shape)))
    merge(mat_ref, pick(jnp.broadcast_to(col(g, _C_MAT), tm.shape)))

    if nm_refs:
        vn = []
        for ax in range(3):
            vn_m = (u_n * col(g, _C_VN + ax)
                    + v_n * col(g, _C_VN + 3 + ax)
                    + w_n * col(g, _C_VN + 6 + ax))
            vn.append(pick(vn_m))
        tb = [pick(jnp.broadcast_to(col(g, _C_TAN + k), tm.shape))
              for k in range(6)]
        for ref, val in zip(nm_refs, vn + tb):
            merge(ref, val)


def _make_closest_hit_perray_kernel(block_f: int, n_blocks: int):
    """Closest-hit with PER-RAY origins (secondary/bounce rays for the
    path tracer). Same front-to-back in-kernel-loop structure as the
    shared-origin kernel but origin terms are computed per (face, ray)
    from planar origin rows; hits closer than the self-intersection
    epsilon 1e-3 are rejected. Terminated paths carry dirs == 0 and can
    never hit (their root-exit bound is pinned to -1)."""

    def kernel(tlb_ref, order_ref, dx_ref, dy_ref, dz_ref,
               ox_ref, oy_ref, oz_ref, texit_ref, fpack_ref, dc_ref,
               t_ref, face_ref):
        t_ref[:] = jnp.full_like(t_ref, F32_INF)
        face_ref[:] = jnp.zeros_like(face_ref)

        dx, dy, dz = _row1(dx_ref), _row1(dy_ref), _row1(dz_ref)
        ox, oy, oz = _row1(ox_ref), _row1(oy_ref), _row1(oz_ref)

        def visit(jj):
            base = pl.multiple_of(jj * block_f, block_f)
            g = fpack_ref[pl.ds(base, block_f), :]
            dc = dc_ref[pl.ds(base, block_f), :]
            _chp_block_slim(g, dx, dy, dz, ox, oy, oz, jj * block_f,
                            t_ref, face_ref, gc0=0, dcc0=0, dcref=dc)

        def bound():
            return jnp.max(jnp.minimum(t_ref[:], texit_ref[:]))

        _ordered_cluster_loop(tlb_ref, order_ref, n_blocks, visit, bound)

    return kernel


def _make_anyhit_kernel(block_f: int, n_blocks: int):
    """Shadow any-hit with PER-RAY origins (planar, in-kernel cluster
    loop). act_ref masks rays that need testing (inactive rays stay
    unoccluded). dc_ref (F, 8): cols [d, c0, c1, c2, 0...]. Blocks are
    visited in ascending ENTRY-t order with the bound capped at each
    still-unoccluded active ray's scene-root exit (see the streaming
    any-hit kernel for the exactness argument) — the all-occluded early
    exit falls out (every ray occluded/inactive -> bound -1 -> stop)."""

    def kernel(tlb_ref, order_ref, dx_ref, dy_ref, dz_ref,
               ox_ref, oy_ref, oz_ref, act_ref, texit_ref,
               fpack_ref, dc_ref, occ_ref):
        occ_ref[:] = jnp.zeros_like(occ_ref)

        dx, dy, dz = _row1(dx_ref), _row1(dy_ref), _row1(dz_ref)
        ox, oy, oz = _row1(ox_ref), _row1(oy_ref), _row1(oz_ref)

        def visit(jj):
            base = pl.multiple_of(jj * block_f, block_f)
            g = fpack_ref[pl.ds(base, block_f), :]
            dc = dc_ref[pl.ds(base, block_f), :]
            _ah_block(g, dc, dx, dy, dz, ox, oy, oz, act_ref, occ_ref)

        def bound():
            live = act_ref[:] * (1.0 - occ_ref[:])
            return jnp.max(jnp.where(live > 0.0, texit_ref[:], -1.0))

        _ordered_cluster_loop(tlb_ref, order_ref, n_blocks, visit, bound)

    return kernel


def _ah_block(g, dc, dx, dy, dz, ox, oy, oz, act_ref, occ_ref,
              gc0=0, dcc0=0, acc_ref=None):
    """Any-hit block merge: occ |= any face in the block occludes.
    gc0/dcc0: static column offsets — the banked slim stream buffers
    pass the full 128-lane row slab and read bank jb's columns in
    place (single-lane broadcasts at static lanes; a (32, 16) window
    slice would cost a lane-shift relayout per visit). acc_ref: fold
    hits into a (BF, TILE_R) accumulator instead of reducing per block
    (streamed path; reduced once per word in the caller's flush)."""

    def col(m, k, m0=0):
        return m[:, m0 + k:m0 + k + 1]

    ndotd = col(g, 0, gc0) * dx + col(g, 1, gc0) * dy + col(g, 2, gc0) * dz
    ndoto = col(g, 0, gc0) * ox + col(g, 1, gc0) * oy + col(g, 2, gc0) * oz
    t = -(ndoto + col(dc, 0, dcc0)) / ndotd

    def edge(k, c):
        og = (col(g, k, gc0) * ox + col(g, k + 1, gc0) * oy
              + col(g, k + 2, gc0) * oz - col(dc, c, dcc0))
        dg = (col(g, k, gc0) * dx + col(g, k + 1, gc0) * dy
              + col(g, k + 2, gc0) * dz)
        return og + t * dg

    h0 = edge(3, 1)
    h1 = edge(6, 2)
    h2 = edge(9, 3)

    hit = (
        (jnp.abs(ndotd) >= K_EPSILON)
        & (t >= 1e-3)
        & (h0 >= 0.0)
        & (h1 >= 0.0)
        & (h2 >= 0.0)
    )
    if acc_ref is not None:  # per-word accumulate (streamed kernels):
        # one elementwise select per visit; the cross-sublane any()
        # happens ONCE per (subtile, word) in the flush
        acc_ref[:] = jnp.where(hit, 1.0, acc_ref[:])
        return
    any_hit = jnp.max(jnp.where(hit, 1.0, 0.0), axis=0) * act_ref[:]
    occ_ref[:] = jnp.maximum(occ_ref[:], any_hit)


def _make_fused_extend_shadow_kernel(block_f: int, n_blocks: int,
                                     nwords: int):
    """Wavefront fusion for the path tracer: ONE sweep over the face
    pack serves TWO independent ray wavefronts — the NEE shadow rays of
    bounce k (any-hit) and the extension rays of bounce k+1 (per-ray
    closest-hit). Classic wavefront PT compacts surviving rays between
    bounces; on TPU v5e a compaction is gathers (~10 ns/index — more
    than it saves, measured), so instead dead lanes park outside the
    cluster cones and the two wavefronts FUSE to amortize the
    per-kernel sweep cost (grid + output init + mask walk, ~6 ms each
    at 1080p). The mask is the UNION of both wavefronts' cluster masks;
    visiting a cluster only one set needs is harmless (closest-hit
    merges are idempotent, any-hit is an OR), so both results are
    bit-identical to the separate kernels."""

    def kernel(mask_ref, maska_ref, maskb_ref,
               dx_ref, dy_ref, dz_ref, ox_ref, oy_ref, oz_ref,
               sdx_ref, sdy_ref, sdz_ref, sox_ref, soy_ref, soz_ref,
               act_ref, fpack_ref, dc_ref, t_ref, face_ref, occ_ref,
               acc_t, acc_f, acc_h):
        i = pl.program_id(0)
        t_ref[:] = jnp.full_like(t_ref, F32_INF)
        face_ref[:] = jnp.zeros_like(face_ref)
        occ_ref[:] = jnp.zeros_like(occ_ref)

        dx, dy, dz = _row1(dx_ref), _row1(dy_ref), _row1(dz_ref)
        ox, oy, oz = _row1(ox_ref), _row1(oy_ref), _row1(oz_ref)
        sdx, sdy, sdz = _row1(sdx_ref), _row1(sdy_ref), _row1(sdz_ref)
        sox, soy, soz = _row1(sox_ref), _row1(soy_ref), _row1(soz_ref)
        nb = n_blocks

        def word_begin():
            acc_t[:] = jnp.full_like(acc_t, F32_INF)
            acc_f[:] = jnp.zeros_like(acc_f)
            acc_h[:] = jnp.zeros_like(acc_h)

        def visit(jj):
            # the loop walks the UNION mask; each wavefront's work is
            # gated by ITS OWN mask bit (a cluster outside a set's
            # conservative cull mask provably cannot intersect that
            # set's rays, so the skip is bit-exact — same argument as
            # the split kernels, which use their own masks). The
            # measured reason streamed fusion lost was exactly this
            # cross-visit waste on weakly-overlapping masks.
            w, b = jj // 32, jj % 32
            base = pl.multiple_of(jj * block_f, block_f)
            g = fpack_ref[pl.ds(base, block_f), :]
            dc = dc_ref[pl.ds(base, block_f), :]

            @pl.when(((maska_ref[i * nwords + w] >> b) & 1) > 0)
            def _():
                t, valid = _chp_block_tv(g, dx, dy, dz, ox, oy, oz,
                                         gc0=0, dcc0=0, dcref=dc)
                _acc_merge(t, valid, jj * block_f, acc_t, acc_f)

            @pl.when(((maskb_ref[i * nwords + w] >> b) & 1) > 0)
            def _():
                _ah_block(g, dc, sdx, sdy, sdz, sox, soy, soz, act_ref,
                          occ_ref, acc_ref=acc_h)

        def word_flush(w):
            _acc_flush(acc_t, acc_f, t_ref, face_ref)
            any_hit = jnp.max(acc_h[:], axis=0) * act_ref[:]
            occ_ref[:] = jnp.maximum(occ_ref[:], any_hit)

        _mask_word_loop(mask_ref, nwords, nb, i, visit,
                        word_begin_fn=word_begin,
                        word_flush_fn=word_flush)

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_r", "block_f",
                                             "interpret", "accel"))
def extend_shadow_pallas(scene: SceneData, ox, oy, oz, dx, dy, dz,
                         sox, soy, soz, sdx, sdy, sdz, active, *,
                         tile_r: int = TILE_R,
                         block_f: Optional[int] = None,
                         interpret: bool = False, accel: str = "cull"):
    """Fused per-bounce sweep: closest-hit for extension rays
    (ox..,dx..) AND any-hit occlusion for shadow rays (sox..,sdx..,
    active) in one kernel pass. Returns (GBuffer, occluded (R,) bool).

    HBM-streamed scenes fall back to two kernels, with the whole
    wavefront REORDERED by (origin-Morton, direction octant) first —
    bounce directions are hemisphere samples, and a ray tile whose
    direction interval contains zero on every axis defeats interval
    culling completely (every cluster admitted; measured 18.7 s/spp on
    the 522k terrain at 540p without the sort). One permutation serves
    both ray sets: shadow origins are the same hit points, and their
    constant direction is compatible with any origin-local grouping.
    The permutation is exact — results are scattered back to ray order.
    """
    f = scene.tri_p0.shape[0]
    bf_probe = _natural_block_f(scene, f) if block_f is None \
        else min(block_f, f)
    if _should_stream(f, bf_probe):
        perm = _bounce_sort_perm(scene, ox, oy, oz, dx, dy, dz)
        pv = _permute_planes([ox, oy, oz, dx, dy, dz,
                              sox, soy, soz, sdx, sdy, sdz,
                              active.astype(jnp.float32)], perm)
        gb = gbuffer_perray_pallas(scene, pv[0], pv[1], pv[2],
                                   pv[3], pv[4], pv[5],
                                   tile_r=tile_r, block_f=block_f,
                                   interpret=interpret, accel=accel)
        occ = anyhit_pallas(scene, pv[6], pv[7], pv[8],
                            pv[9], pv[10], pv[11], pv[12] > 0.0,
                            tile_r=tile_r, block_f=block_f,
                            interpret=interpret, accel=accel)
        # inverse-permute: ONE scatter for the f32 planes. Face ids ride
        # as f32 VALUES (exact below 2^24, far above any face count) —
        # a bitcast would turn small ids into subnormal bit patterns a
        # flush-to-zero lowering could silently destroy.
        face_f = gb.face.astype(jnp.float32)
        unsorted = _unpermute_planes(
            jnp.stack([gb.t, face_f, gb.u, gb.v, gb.nd, gb.uvx,
                       gb.uvy, gb.nx, gb.ny, gb.nz, gb.mat,
                       occ.astype(jnp.float32)]), perm)
        gb = GBuffer(
            t=unsorted[0],
            face=unsorted[1].astype(jnp.int32),
            u=unsorted[2], v=unsorted[3], nd=unsorted[4],
            uvx=unsorted[5], uvy=unsorted[6], nx=unsorted[7],
            ny=unsorted[8], nz=unsorted[9], mat=unsorted[10])
        return gb, unsorted[11] > 0.0

    nrays = dx.shape[0]
    planes = [_pad1(a, tile_r) for a in (dx, dy, dz, ox, oy, oz,
                                         sdx, sdy, sdz, sox, soy, soz)]
    act = _pad1(active.astype(jnp.float32), tile_r)
    r = planes[0].shape[0]

    block_f = _natural_block_f(scene, f) if block_f is None \
        else min(block_f, f)
    assert f % block_f == 0

    fpack = pack_face_columns(scene)
    dc = jnp.concatenate(
        [scene.tri_d[:, None], scene.tri_c,
         jnp.zeros((f, 4), jnp.float32)], axis=1)

    (dxp, dyp, dzp, oxp, oyp, ozp,
     sdxp, sdyp, sdzp, soxp, soyp, sozp) = planes
    # ACT-AWARE tile bounds on both wavefronts (round 5): `active` is
    # the live set of BOTH ray sets (extension rays park at far with
    # zero dirs; shadow occlusion is act-gated in-kernel and in the
    # caller), and PT wavefronts go sparse fast — by bounce 1 of
    # BASELINE config 4 only ~5% of lanes live. Without act, one
    # parked ray (origin 1e9) in a tile blows its origin interval open
    # (admits every cluster), and the 95% miss rays' shadow origins sit
    # at the PREVIOUS hit point / camera origin with a real light dir,
    # so words_b degenerated to a full-frame sweep: the fused kernel
    # measured ~30 ms/bounce of dead-lane sweeping at 1080p
    # (tools/prof_pt4.py). Bit-exact: parked rays have zero directions
    # (can hit nothing), inactive shadow rays' occ is act-masked at
    # every consumer, and active rays' bounds are unchanged.
    actb = act > 0
    words_a, nwords = _mask_words(scene, accel, oxp, oyp, ozp,
                                  dxp, dyp, dzp, tile_r, block_f, f,
                                  interpret, act=actb)
    words_b, _ = _mask_words(scene, accel, soxp, soyp, sozp,
                             sdxp, sdyp, sdzp, tile_r, block_f, f,
                             interpret, act=actb)
    mask = words_a | words_b  # union of the two wavefronts' masks

    grid = (r // tile_r,)
    ray_spec = pl.BlockSpec((tile_r,), lambda i, m, ma, mb: (i,),
                            memory_space=pltpu.VMEM)
    out_specs = [ray_spec] * 3
    out_shape = [jax.ShapeDtypeStruct((r,), jnp.float32),
                 jax.ShapeDtypeStruct((r,), jnp.int32),
                 jax.ShapeDtypeStruct((r,), jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # union mask + per-wavefront masks
        grid=grid,
        in_specs=[ray_spec] * 13 + [
            pl.BlockSpec((f, FPACK_COLS),
                         lambda i, m, ma, mb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, 8), lambda i, m, ma, mb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_f, tile_r), jnp.float32)
            for _ in range(3)],  # per-word acc: t, face, hit
    )
    outs = pl.pallas_call(
        _make_fused_extend_shadow_kernel(block_f, f // block_f, nwords),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(mask, words_a, words_b, *planes, act, fpack, dc)

    t, face, occ = [o[:nrays] for o in outs]
    gb = expand_tf_gbuffer(scene, t, face, dx, dy, dz,
                           oxyz=(ox, oy, oz))
    return gb, occ > 0.0


def _pad1(x, tile, fill=0.0):
    pad = (-x.shape[0]) % tile
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x


def _regroup_mask(mask, f, block_f):
    """Adapt a (tiles, f/CULL_BLOCK) cull mask to the kernel's face-block
    granularity (coarser blocks OR the member clusters; finer repeat)."""
    cull = f // mask.shape[1]
    if block_f == cull:
        return mask
    if block_f > cull:
        assert block_f % cull == 0
        return mask.reshape(mask.shape[0], -1, block_f // cull).max(axis=2)
    assert cull % block_f == 0
    return jnp.repeat(mask, cull // block_f, axis=1)


def _pack_mask_bits(mask):
    """Pack a (tiles, nb) 0/1 i32 mask into (tiles, ceil(nb/32)) i32
    bitfields — SMEM holds ~1 MB and scalar-prefetched masks for large
    scenes (64-instance fields at 4K: 8100 tiles x 256 clusters) would
    need 8 MB unpacked."""
    t, nb = mask.shape
    nw = -(-nb // 32)
    pad = nw * 32 - nb
    if pad:
        mask = jnp.concatenate(
            [mask, jnp.zeros((t, pad), mask.dtype)], axis=1)
    bits = mask.reshape(t, nw, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    words = jnp.sum(bits * weights[None, None, :], axis=2)
    # FLATTENED to 1-D: SMEM pads the last dim of 2-D scalar arrays to
    # 128 lanes (4 MB for an 8100x8 mask) — 1-D stays compact.
    return words.astype(jnp.int32).reshape(-1), nw


def _mask_word_loop(mask_ref, nwords, nb, i, visit, done_fn=None,
                    order_ref=None, word_begin_fn=None,
                    word_flush_fn=None):
    """In-kernel loop over active clusters: iterate the packed mask one
    32-bit word at a time, skipping zero words entirely (a tile that
    sees no geometry costs nb/32 scalar checks instead of nb), and
    testing bits only inside non-zero words. done_fn (optional) is a
    scalar early-exit predicate re-evaluated per word — the any-hit
    kernels stop as soon as every active ray is occluded. order_ref
    (optional, SMEM (nwords,) i32 permutation) replays the words in a
    caller-chosen order — the shadow kernels sort words near-to-far
    along the light so occluders are met (and the early exit fires)
    first; any order is correct (the merges are order-independent).
    word_begin_fn/word_flush_fn bracket each non-zero word's bit loop
    (per-word accumulator reset/flush, see _acc_merge)."""

    def word_step(k, carry):
        w = order_ref[k] if order_ref is not None else k
        word = mask_ref[i * nwords + w]
        pred = word != 0
        if done_fn is not None:
            pred = jnp.logical_and(pred, jnp.logical_not(done_fn()))

        @pl.when(pred)
        def _():
            if word_begin_fn is not None:
                word_begin_fn()

            def bit_step(b, c2):
                @pl.when(((word >> b) & 1) > 0)
                def _():
                    visit(w * 32 + b)
                return c2

            nbits = jnp.minimum(nb - w * 32, 32)
            jax.lax.fori_loop(0, nbits, bit_step, 0)
            if word_flush_fn is not None:
                word_flush_fn(w)
        return carry

    jax.lax.fori_loop(0, nwords, word_step, 0)


class _SubView:
    """Static per-subtile window into a 1-D batched ref. The batched
    streaming kernels pass these to the shared block mergers
    (_ch_block & co.), which only ever do full `[:]` loads/stores —
    the window start is a Python int, so every access lowers to a
    static VMEM slice."""

    def __init__(self, ref, start, size):
        self._ref = ref
        self._sl = slice(start, start + size)

    def __getitem__(self, _):
        return self._ref[self._sl]

    def __setitem__(self, _, val):
        self._ref[self._sl] = val


def _stream_word_loop(mask_ref, n_super, sup_f, block_f, streams,
                      visit_bit, nsub=1, done_fn=None,
                      sub_done_fn=None, order_ref=None, stop_fn=None,
                      sub_begin_fn=None, sub_flush_fn=None):
    """HBM-streaming variant of _mask_word_loop (VERDICT r1: breaks the
    all-VMEM scene-size ceiling). The (F, STREAM_COLS) face pack stays
    in HBM; one packed mask word covers exactly one superblock of sup_f
    faces (32 clusters x 32 faces). For each word the loop DMAs the
    superblock into VMEM scratch and visits its set bits (32-face
    sub-blocks); skipped superblocks cost one SMEM scalar read each.

    BATCHED over nsub ray subtiles (VERDICT r2 #1): each 512 KB
    superblock fetch is shared by all nsub subtiles of the grid step
    instead of being re-issued once per 1024-ray tile — screen/Morton-
    adjacent tiles have near-identical masks, so this cuts redundant
    HBM traffic ~nsub x (the 2M-face frames were DMA-bound on exactly
    this re-fetch). mask_ref is the step's (1, nsub+1, n_super) SMEM
    block: rows 0..nsub-1 are the per-subtile packed masks, row nsub is
    their HOST-PRECOMPUTED UNION — the fetch loop scans only the union
    row (one scalar read per word, nsub x fewer than OR-ing in-kernel).
    Each subtile then visits only ITS OWN set bits, in the same
    ascending (word, bit) order as the unbatched loop — compute volume
    and closest-hit tie-breaking are bit-identical to nsub=1.

    DOUBLE-BUFFERED: bufs/sems are two VMEM slots + DMA semaphores.
    While word k's sub-blocks are being intersected out of one slot,
    word k+1's superblock fetch is already in flight into the other —
    DMA issue latency + transfer hide behind intersection work instead
    of serializing with it. Structure: a scalar while_loop whose carry
    (j, parity, pending) maintains the invariant that word j's DMA into
    slot `parity` is in flight iff `pending` — the next fetch is issued
    BEFORE waiting on the current one, and `pending` going false (words
    exhausted or done_fn tripped) exits with no un-awaited copy. Slot
    indices must be static in Mosaic, so each step body is emitted
    twice under pl.when(parity == 0/1).

    done_fn: scalar early-exit predicate over the WHOLE batch (see
    _mask_word_loop) — also skips remaining fetches. sub_done_fn(sub,
    s): optional per-(subtile, word) skip predicate — a subtile whose
    rays are already all occluded (any-hit), or for whom word s starts
    beyond every ray's current best t (closest-hit front-to-back), is
    skipped while the rest of the batch keeps going. stop_fn(s):
    optional TERMINATION predicate on the word id about to be
    prefetched — with a visit order ascending in the batch-min entry t,
    "word s cannot beat any ray's best" implies the same for every
    later word, so the whole loop (fetches included) stops. order_ref:
    optional SMEM (n_super,) i32 visit permutation (shadow kernels sort
    near-to-far along the light; closest-hit sorts by entry t).
    streams: list of (hbm_ref, (buf0, buf1), (sem0, sem1), rows) DMA
    chains advanced in lockstep — rows is the HBM rows per superblock.
    visit_bit receives (slot_bufs, s, b, sub) with slot_bufs the
    current parity's VMEM buffer of every stream.

    MEASURED DEAD END (round 3): a 16-col "slim" record (8 faces per
    128-lane row, 8x less DMA) lost to this fat-record loop at every
    scale — post-batching the streamed frames are bound by VISIT
    COMPUTE, not DMA (522k primary ~63-66 ms either way; 2M: fat 182
    vs slim 253 ms). Re-assembling face-ascending blocks cost ~8
    lane-shift copies per visited word; reading the banked record in
    place (static per-bank lane offsets) was 2.4x worse again. What
    DID survive from the experiment is the slim MERGE: track only the
    (t, face) winner during the sweep and gather + recompute the
    winner's plane values and shading attributes afterwards
    (expand_tf_gbuffer)."""
    bits = sup_f // block_f

    def word_id(j):
        jc = jnp.minimum(j, n_super - 1)  # clamp the scan's OOB probe
        return order_ref[jc] if order_ref is not None else jc

    def next_nz(j0):
        """First position >= j0 whose UNION word is nonzero, else
        n_super."""
        def cond(j):
            return jnp.logical_and(j < n_super,
                                   mask_ref[0, nsub, word_id(j)] == 0)

        return jax.lax.while_loop(cond, lambda j: j + 1, j0)

    def start(j, slot):
        s = word_id(j)
        for hbm, bufs_, sems_, rows_ in streams:
            pltpu.make_async_copy(
                hbm.at[pl.ds(s * rows_, rows_), :], bufs_[slot],
                sems_[slot]).start()

    def wait(slot):
        # descriptor only carries the transfer shape; any source slice
        # of the right extent waits the slot's semaphore
        for hbm, bufs_, sems_, rows_ in streams:
            pltpu.make_async_copy(
                hbm.at[pl.ds(0, rows_), :], bufs_[slot],
                sems_[slot]).wait()

    def visit_word(j, slot):
        s = word_id(j)
        sbufs = [st[1][slot] for st in streams]
        for sub in range(nsub):  # static unroll: per-sub static slices
            word = mask_ref[0, sub, s]
            pred = word != 0
            if sub_done_fn is not None:
                pred = jnp.logical_and(
                    pred, jnp.logical_not(sub_done_fn(sub, s)))

            @pl.when(pred)
            def _(sub=sub, word=word):
                if sub_begin_fn is not None:
                    sub_begin_fn(sub)

                def bit_step(b_, c2):
                    @pl.when(((word >> b_) & 1) > 0)
                    def _():
                        visit_bit(sbufs, s, b_, sub)
                    return c2

                jax.lax.fori_loop(0, bits, bit_step, 0)
                if sub_flush_fn is not None:
                    sub_flush_fn(sub, s)

    def body(carry):
        j, par, _ = carry
        stop = done_fn() if done_fn is not None else False
        jn = next_nz(j + 1)
        pre = jnp.logical_and(jn < n_super, jnp.logical_not(stop))
        if stop_fn is not None:
            # front-to-back termination: evaluated BEFORE visiting word
            # j, so the bound is only tighter when a skipped-later word
            # would actually be reached — fetch decisions stay sound
            pre = jnp.logical_and(
                pre, jnp.logical_not(stop_fn(word_id(jn))))

        for p in (0, 1):  # static slot duplication
            @pl.when(jnp.logical_and(par == p, pre))
            def _(p=p):
                start(jn, 1 - p)

        for p in (0, 1):
            @pl.when(par == p)
            def _(p=p):
                wait(p)

            @pl.when(jnp.logical_and(par == p, jnp.logical_not(stop)))
            def _(p=p):
                visit_word(j, p)

        return jn, 1 - par, pre

    j0 = next_nz(jnp.int32(0))
    pending0 = j0 < n_super
    if stop_fn is not None:
        pending0 = jnp.logical_and(
            pending0, jnp.logical_not(stop_fn(word_id(j0))))

    @pl.when(pending0)
    def _():
        start(j0, 0)

    jax.lax.while_loop(lambda c: c[2], body,
                       (j0, jnp.int32(0), pending0))


def _stream_scratch(acc_tile_r=None, n_acc=2, nsub=None):
    """Two double-buffer slots + DMA semaphores; with acc_tile_r,
    n_acc extra (CULL_BLOCK, tile_r) VMEM planes for the per-word
    accumulators (_acc_merge/_acc_flush; the any-hit kernel folds hit
    flags into one); with nsub, an SMEM (nsub,) plane for the cached
    per-sub termination bounds."""
    s = [
        pltpu.VMEM((SUPER_F, STREAM_COLS), jnp.float32),
        pltpu.VMEM((SUPER_F, STREAM_COLS), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    ]
    if acc_tile_r is not None:
        s += [pltpu.VMEM((CULL_BLOCK, acc_tile_r), jnp.float32)
              for _ in range(n_acc)]
    if nsub is not None:
        s.append(pltpu.SMEM((nsub,), jnp.float32))
    return s


# ray subtiles batched per streaming grid step: one superblock fetch
# serves STREAM_BATCH tiles (VMEM per batch: STREAM_BATCH x (4 ray +
# 2 output) planes ~24 KB/subtile beside the two 512 KB stream slots
# and the (32, tile_r) accumulators). Env-overridable for sweeps.
STREAM_BATCH = int(__import__("os").environ.get("RT_STREAM_BATCH", "8"))
# opt-in per-ray word-mask refinement for the streamed ANY-HIT (see
# anyhit_pallas; probe + decision rule in tools/probe_ah_gap.py)
AH_PERRAY_MASK = bool(int(__import__("os").environ.get("RT_AH_PERRAY",
                                                       "0")))
# opt-in per-ray CLUSTER-bit refinement of the K fattest admitted mask
# words per tile on the streamed bounce closest-hit (0 = off; see
# _refine_topk_words). PROBED CHIP-FREE as a likely dead end
# (tools/prof_cluster_gap.py, config-8 bounce wavefront): the exact
# per-ray ceiling is 4.9x fewer cluster visits (4.30M -> 0.88M), but
# the slack is SPREAD over ~263 admitted words/tile, so top-K captures
# only 1.03x (K=8) .. 1.24x (K=64); and it is pure per-ray DIRECTION
# slack — ray-GROUP interval tests (G=8/32, prof_cluster_gap2.py) cull
# exactly nothing, because cosine-sampled bounce directions are
# independent and any group's direction interval spans the whole
# octant. Capturing the 4.9x would need per-ray tests on ~all admitted
# words (8.5G slab tests/wavefront — same order as the sweep itself)
# or an in-kernel per-cluster box pre-test ahead of each block merge
# (~1M lane-ops/word vs ~262k/visit merge, needs 2 cross-lane
# reductions per (sub, word) to scalarize the refined bits) — the one
# remaining frontier, only worth attempting against on-chip numbers.
PT_KREFINE = int(__import__("os").environ.get("RT_PT_KREFINE", "0"))


def _stream_mask_spec(mask, n_tiles, nwords, tile_r, nsub):
    """Per-step SMEM delivery of the packed masks for streaming kernels
    (whole-array SMEM prefetch overflows the 1 MB SMEM at 500k faces x
    1080p), plus the matching one-arg batched ray BlockSpec. The step's
    block carries the nsub subtile mask rows PLUS their precomputed
    union as row nsub (the fetch loop's scan row — see
    _stream_word_loop)."""
    m = mask.reshape(n_tiles, nwords)
    nb = n_tiles // nsub
    g = m.reshape(nb, nsub, nwords)
    union = g[:, 0, :]
    for b in range(1, nsub):
        union = union | g[:, b, :]
    m3 = jnp.concatenate([g, union[:, None, :]], axis=1)
    # (NB, nsub+1, nwords) with (1, nsub+1, nwords) blocks: Mosaic
    # requires the last two BLOCK dims to equal the array dims (or be
    # (8,128)-aligned)
    mask_spec = pl.BlockSpec((1, nsub + 1, nwords), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((nsub * tile_r,), lambda i: (i,),
                            memory_space=pltpu.VMEM)
    return mask_spec, ray_spec, m3


class _Row2View:
    """1-D scalar indexing over a (1, 1, N) SMEM block (the per-batch
    word order rows ride 3-D BlockSpecs — Mosaic requires the last TWO
    block dims to equal the array dims; _stream_word_loop indexes
    [j])."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, j):
        return self._ref[0, 0, j]


def _ch_block_tv(g, o, dx, dy, dz, gc0=0, oc0=0):
    """Shared-origin block intersection: (t, valid) for one face block
    (g: n 0-2, edge planes 3-11; o: per-face origin terms from the
    per-frame banked record; gc0/oc0: static bank column offsets, see
    _ah_block)."""

    def col(m, k, m0=0):
        return m[:, m0 + k:m0 + k + 1]

    ndotd = (col(g, 0, gc0) * dx + col(g, 1, gc0) * dy
             + col(g, 2, gc0) * dz)
    t = col(o, 0, oc0) / ndotd
    h0 = col(o, 1, oc0) + t * (col(g, 3, gc0) * dx + col(g, 4, gc0) * dy
                               + col(g, 5, gc0) * dz)
    h1 = col(o, 2, oc0) + t * (col(g, 6, gc0) * dx + col(g, 7, gc0) * dy
                               + col(g, 8, gc0) * dz)
    h2 = col(o, 3, oc0) + t * (col(g, 9, gc0) * dx + col(g, 10, gc0) * dy
                               + col(g, 11, gc0) * dz)
    valid = (
        (jnp.abs(ndotd) >= K_EPSILON)
        & (t >= 0.0)
        & (h0 >= 0.0)
        & (h1 >= 0.0)
        & (h2 >= 0.0)
    )
    return t, valid


def _chp_block_tv(g, dx, dy, dz, ox, oy, oz, gc0=0, dcc0=SC_DC,
                  dcref=None):
    """Per-ray-origin block intersection: (t, valid) (g planes at cols
    gc0.., d + c at cols dcc0.. of dcref — defaults to g itself, the
    streamed record's layout; the VMEM kernel passes its separate
    (BF, 8) dc bank) — same math and epsilons as the shared-origin
    form, with the 1e-3 self-intersection epsilon."""
    dc = g if dcref is None else dcref

    def col(m, k, m0=0):
        return m[:, m0 + k:m0 + k + 1]

    ndotd = col(g, 0, gc0) * dx + col(g, 1, gc0) * dy + col(g, 2, gc0) * dz
    ndoto = col(g, 0, gc0) * ox + col(g, 1, gc0) * oy + col(g, 2, gc0) * oz
    t = -(ndoto + col(dc, 0, dcc0)) / ndotd

    def hplane(k, c):
        og = (col(g, k, gc0) * ox + col(g, k + 1, gc0) * oy
              + col(g, k + 2, gc0) * oz - col(dc, c, dcc0))
        dg = (col(g, k, gc0) * dx + col(g, k + 1, gc0) * dy
              + col(g, k + 2, gc0) * dz)
        return og + t * dg

    h0 = hplane(3, 1)
    h1 = hplane(6, 2)
    h2 = hplane(9, 3)
    valid = (
        (jnp.abs(ndotd) >= K_EPSILON)
        & (t >= 1e-3)
        & (h0 >= 0.0)
        & (h1 >= 0.0)
        & (h2 >= 0.0)
    )
    return t, valid


def _ch_block_slim(g, o, dx, dy, dz, face_base, t_ref, face_ref,
                   gc0=0, oc0=0):
    """Shared-origin closest-hit block merge, (t, face)-ONLY state.
    The sweep tracks nothing but the lexicographic (t, face) winner —
    h1/h2/ndotd and every shading attribute resolve after the sweep
    (expand_tf_gbuffer) by recomputing the kernel's own expressions on
    the winner's gathered columns, bit-identical (same floats, same op
    order; tested). Dropping the in-sweep h1/h2/nd picks removes 3
    masked cross-sublane reductions + 3 merges per block visit — the
    streamed frames are visit-compute-bound, so this is a direct
    hot-loop cut."""
    t, valid = _ch_block_tv(g, o, dx, dy, dz, gc0, oc0)
    _merge_tf(t, valid, face_base, t_ref, face_ref)


def _chp_block_slim(g, dx, dy, dz, ox, oy, oz, face_base,
                    t_ref, face_ref, gc0=0, dcc0=SC_DC, dcref=None):
    """Per-ray-origin closest-hit block merge, (t, face)-only state."""
    t, valid = _chp_block_tv(g, dx, dy, dz, ox, oy, oz, gc0, dcc0,
                             dcref)
    _merge_tf(t, valid, face_base, t_ref, face_ref)


def _acc_merge(t, valid, face_base, acc_t, acc_f):
    """Elementwise lexicographic (t, face) fold of one block's
    (BF, TILE_R) intersection into the per-word VMEM accumulator —
    row i of the accumulator holds the running winner among the
    visited blocks' i-th faces for each ray. No cross-sublane
    reduction per block: the (amortized) reduction happens ONCE per
    (subtile, word) in _acc_flush. Exact: lex-min is associative and
    commutative, so folding rows elementwise and reducing at flush
    yields the same global (min t, min face among min t) winner as the
    per-block merge (tested bit-identical)."""
    tm = jnp.where(valid, t, F32_INF)
    # face ids exact in f32 < 2^24; iota must be INTEGER for Mosaic
    # (tpu.iota rejects float results) and convert after
    nf = jnp.float32(face_base) + jax.lax.broadcasted_iota(
        jnp.int32, (tm.shape[0], 1), 0).astype(jnp.float32)
    at = acc_t[:]
    af = acc_f[:]
    upd = (tm < at) | ((tm == at) & (nf < af))
    acc_t[:] = jnp.where(upd, tm, at)
    acc_f[:] = jnp.where(upd, jnp.broadcast_to(nf, tm.shape), af)


def _acc_flush(acc_t, acc_f, t_view, face_view):
    """Reduce the per-word accumulator to the tile's (1, TILE_R)
    lexicographic winner and merge it into the output rows — the same
    merge rule as _merge_tf (inf ties keep the incumbent: untouched
    accumulator rows carry face 0, matching the kernels'
    zero-initialized outputs)."""
    at = acc_t[:]
    tmin = jnp.min(at, axis=0, keepdims=True)
    fmin = jnp.min(jnp.where(at == tmin, acc_f[:], 3.4e38), axis=0,
                   keepdims=True)
    tminr = tmin.reshape(-1)
    newf = fmin.reshape(-1).astype(jnp.int32)
    prev_t = t_view[:]
    better = ((tminr < prev_t)
              | ((tminr == prev_t) & (newf < face_view[:])))
    t_view[:] = jnp.where(better, tminr, prev_t)
    face_view[:] = jnp.where(better, newf, face_view[:])


def _merge_tf(t, valid, face_base, t_ref, face_ref):
    """Lexicographic (t, face id) merge of a block's winner into the
    (t, face) output planes — the same merge rule as _ch_block (see
    its comments for the order-independence and no-hit-block
    arguments), with no attribute picks at all."""
    tm = jnp.where(valid, t, F32_INF)
    tmin = jnp.min(tm, axis=0, keepdims=True)
    face_ids = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
    idx_blk = jnp.min(
        jnp.where(tm == tmin, face_ids, INT_MISS), axis=0, keepdims=True)

    prev_t = _row1(t_ref)
    new_face = idx_blk + face_base
    better = ((tmin < prev_t)
              | ((tmin == prev_t)
                 & (new_face < _row1(face_ref)))).reshape(-1)

    t_ref[:] = jnp.where(better, tmin.reshape(-1), t_ref[:])
    face_ref[:] = jnp.where(better, new_face.reshape(-1), face_ref[:])


def _make_streaming_ch_slim_kernel(sup_f: int, n_super: int,
                                   tile_r: int, nsub: int):
    """Shared-origin closest-hit, fat streamed record + SLIM MERGE.

    The (F, 128) record (spack with the frame's origin terms spliced
    at SC_OT) streams from HBM exactly as round 2's kernel; what
    changed is the in-sweep state: only the lexicographic (t, face)
    winner is tracked — 2 output planes instead of 11-20, which
    removes every attribute pick (~2 vector ops each) AND the h1/h2/nd
    picks (3 masked cross-sublane reductions) per block visit from the
    hot loop (the streamed frames are bound by visit compute, not DMA
    — see _stream_word_loop). Everything else resolves after the sweep
    by one planar gather + recompute (expand_tf_gbuffer),
    bit-identical to the fat merge. nsub ray
    subtiles share each fetch; words are visited FRONT-TO-BACK
    (order_ref, ascending batch-min entry t) with exact early
    termination: a word whose entry lower bound (tlb_ref) exceeds
    max_ray(min(best_t, root_exit)) cannot beat any ray's winner, so
    its visit — and under the sorted order the rest of the sweep — is
    skipped (see _stream_sched)."""

    def kernel(mask_ref, order_ref, tlb_ref, dx_ref, dy_ref, dz_ref,
               texit_ref, pack_hbm,
               t_ref, face_ref,
               buf0, buf1, sem0, sem1, acc_t, acc_f, bnd):
        t_ref[:] = jnp.full_like(t_ref, F32_INF)
        face_ref[:] = jnp.zeros_like(face_ref)

        subs = []
        for sub in range(nsub):
            s0 = sub * tile_r
            dx = dx_ref[s0:s0 + tile_r].reshape(1, tile_r)
            dy = dy_ref[s0:s0 + tile_r].reshape(1, tile_r)
            dz = dz_ref[s0:s0 + tile_r].reshape(1, tile_r)
            views = tuple(_SubView(o, s0, tile_r)
                          for o in (t_ref, face_ref))
            subs.append((dx, dy, dz, views))
            # per-sub termination bound, CACHED in SMEM: it can only
            # change when this sub's t rows change, i.e. at flush —
            # recomputing there (once per VISITED word) instead of in
            # sub_skip/stop_word (once per word x sub, visited or not)
            # drops 2 cross-lane reductions per word with the exact
            # same values (t starts at inf, so init = max root-exit)
            bnd[sub] = jnp.max(texit_ref[s0:s0 + tile_r])

        def sub_begin(sub):
            acc_t[:] = jnp.full_like(acc_t, F32_INF)
            acc_f[:] = jnp.zeros_like(acc_f)

        def visit_bit(sbufs, s, b_, sub):
            dx, dy, dz, v = subs[sub]
            r0 = pl.multiple_of(b_ * CULL_BLOCK, CULL_BLOCK)
            blk = sbufs[0][pl.ds(r0, CULL_BLOCK), :]
            t, valid = _ch_block_tv(blk, blk, dx, dy, dz,
                                    gc0=0, oc0=SC_OT)
            _acc_merge(t, valid, s * sup_f + b_ * CULL_BLOCK,
                       acc_t, acc_f)

        def sub_flush(sub, s):
            _acc_flush(acc_t, acc_f, *subs[sub][3])
            s0 = sub * tile_r
            t_v = subs[sub][3][0]
            bnd[sub] = jnp.max(jnp.minimum(t_v[:],
                                           texit_ref[s0:s0 + tile_r]))

        def sub_skip(sub, s):
            return tlb_ref[0, sub, s] > bnd[sub]

        def stop_word(s):
            bound = bnd[0]
            for sub in range(1, nsub):
                bound = jnp.maximum(bound, bnd[sub])
            return tlb_ref[0, nsub, s] > bound

        _stream_word_loop(
            mask_ref, n_super, sup_f, CULL_BLOCK,
            [(pack_hbm, (buf0, buf1), (sem0, sem1), sup_f)],
            visit_bit, nsub=nsub, sub_done_fn=sub_skip,
            order_ref=_Row2View(order_ref), stop_fn=stop_word,
            sub_begin_fn=sub_begin, sub_flush_fn=sub_flush)

    return kernel


def _make_streaming_chp_slim_kernel(sup_f: int, n_super: int,
                                    tile_r: int, nsub: int):
    """Per-ray-origin closest-hit (bounce rays): fat streamed record +
    (t, face)-only merge — origin terms computed in-kernel from d/c
    (cols SC_DC.., see _chp_block_slim); same schedule contract as the
    shared-origin kernel."""

    def kernel(mask_ref, order_ref, tlb_ref, dx_ref, dy_ref, dz_ref,
               ox_ref, oy_ref, oz_ref, texit_ref, pack_hbm,
               t_ref, face_ref,
               buf0, buf1, sem0, sem1, acc_t, acc_f, bnd):
        t_ref[:] = jnp.full_like(t_ref, F32_INF)
        face_ref[:] = jnp.zeros_like(face_ref)

        subs = []
        for sub in range(nsub):
            s0 = sub * tile_r
            rows = tuple(r_[s0:s0 + tile_r].reshape(1, tile_r)
                         for r_ in (dx_ref, dy_ref, dz_ref,
                                    ox_ref, oy_ref, oz_ref))
            views = tuple(_SubView(o, s0, tile_r)
                          for o in (t_ref, face_ref))
            subs.append((rows, views))
            bnd[sub] = jnp.max(texit_ref[s0:s0 + tile_r])

        def sub_begin(sub):
            acc_t[:] = jnp.full_like(acc_t, F32_INF)
            acc_f[:] = jnp.zeros_like(acc_f)

        def visit_bit(sbufs, s, b_, sub):
            (dx, dy, dz, ox, oy, oz), v = subs[sub]
            r0 = pl.multiple_of(b_ * CULL_BLOCK, CULL_BLOCK)
            blk = sbufs[0][pl.ds(r0, CULL_BLOCK), :]
            t, valid = _chp_block_tv(blk, dx, dy, dz, ox, oy, oz,
                                     gc0=0, dcc0=SC_DC)
            _acc_merge(t, valid, s * sup_f + b_ * CULL_BLOCK,
                       acc_t, acc_f)

        def sub_flush(sub, s):
            _acc_flush(acc_t, acc_f, *subs[sub][1])
            s0 = sub * tile_r
            t_v = subs[sub][1][0]
            bnd[sub] = jnp.max(jnp.minimum(t_v[:],
                                           texit_ref[s0:s0 + tile_r]))

        def sub_skip(sub, s):
            return tlb_ref[0, sub, s] > bnd[sub]

        def stop_word(s):
            bound = bnd[0]
            for sub in range(1, nsub):
                bound = jnp.maximum(bound, bnd[sub])
            return tlb_ref[0, nsub, s] > bound

        _stream_word_loop(
            mask_ref, n_super, sup_f, CULL_BLOCK,
            [(pack_hbm, (buf0, buf1), (sem0, sem1), sup_f)],
            visit_bit, nsub=nsub, sub_done_fn=sub_skip,
            order_ref=_Row2View(order_ref), stop_fn=stop_word,
            sub_begin_fn=sub_begin, sub_flush_fn=sub_flush)

    return kernel


def _make_streaming_anyhit_kernel(block_f: int, sup_f: int, n_super: int,
                                  tile_r: int, nsub: int):
    """Shadow any-hit with per-ray origins, fat HBM-streamed record
    (a 16-col slim record was measured and rejected — the pass is
    visit-compute bound, not DMA bound; see _stream_word_loop). nsub
    ray subtiles share each fetch.
    Words are visited in ascending batch-min ENTRY-t
    order (the generalization of round 2's near-to-far light sort) with
    two exact pruning rules on top of the occlusion early exit:
    - a subtile skips word s when tlb[sub, s] > max over its
      still-unoccluded active rays of the scene-root exit t — a LIT ray
      must prove the absence of occluders, but any real occluder is met
      BEFORE the ray leaves the root box, so clusters entered beyond
      every ray's exit cannot change occlusion (this is what caps the
      'prove absence' sweep for grazing shadow directions, where the
      conservative tile cull admits a thick slab of phantom clusters);
    - under the sorted order the same bound stops the whole batch
      (fetches included)."""
    assert sup_f == SUPER_F and block_f == CULL_BLOCK, (sup_f, block_f)

    def kernel(mask_ref, order_ref, tlb_ref, dx_ref, dy_ref, dz_ref,
               ox_ref, oy_ref, oz_ref, act_ref, texit_ref, pack_hbm,
               occ_ref, buf0, buf1, sem0, sem1, acc_h, bnd):
        occ_ref[:] = jnp.zeros_like(occ_ref)

        def need(act_v, occ_v, tex_v):
            # per-ray t ceiling: root exit while unoccluded+active,
            # -1 once the ray needs no more testing
            live = act_v[:] * (1.0 - occ_v[:])
            return jnp.where(live > 0.0, tex_v[:], -1.0)

        subs = []
        for sub in range(nsub):
            s0 = sub * tile_r
            rows = tuple(r_[s0:s0 + tile_r].reshape(1, tile_r)
                         for r_ in (dx_ref, dy_ref, dz_ref,
                                    ox_ref, oy_ref, oz_ref))
            subs.append((rows, _SubView(act_ref, s0, tile_r),
                         _SubView(occ_ref, s0, tile_r),
                         _SubView(texit_ref, s0, tile_r)))
            # cached per-sub bound (occ only changes at flush, so the
            # SMEM scalar is exactly the reduction sub_skip used to
            # recompute per word); bound < 0 also means "every ray of
            # this sub is done", which makes all_occluded a scalar scan
            _, act_v, occ_v, tex_v = subs[sub]
            bnd[sub] = jnp.max(need(act_v, occ_v, tex_v))

        def sub_begin(sub):
            acc_h[:] = jnp.zeros_like(acc_h)

        def visit_bit(sbufs, s, b_, sub):
            (dx, dy, dz, ox, oy, oz), act_v, occ_v, _ = subs[sub]
            r0 = pl.multiple_of(b_ * block_f, block_f)
            blk = sbufs[0][pl.ds(r0, block_f), :]
            _ah_block(blk, blk, dx, dy, dz, ox, oy, oz,
                      act_v, occ_v, gc0=0, dcc0=SC_DC, acc_ref=acc_h)

        def sub_flush(sub, s):
            _, act_v, occ_v, tex_v = subs[sub]
            any_hit = jnp.max(acc_h[:], axis=0) * act_v[:]
            occ_v[:] = jnp.maximum(occ_v[:], any_hit)
            bnd[sub] = jnp.max(need(act_v, occ_v, tex_v))

        def batch_bound():
            bound = bnd[0]
            for sub in range(1, nsub):
                bound = jnp.maximum(bound, bnd[sub])
            return bound

        def all_occluded():
            return batch_bound() < 0.0

        def sub_skip(sub, s):
            return tlb_ref[0, sub, s] > bnd[sub]

        def stop_word(s):
            return tlb_ref[0, nsub, s] > batch_bound()

        _stream_word_loop(mask_ref, n_super, sup_f, block_f,
                          [(pack_hbm, (buf0, buf1), (sem0, sem1), sup_f)],
                          visit_bit,
                          nsub=nsub, done_fn=all_occluded,
                          sub_done_fn=sub_skip,
                          order_ref=_Row2View(order_ref),
                          stop_fn=stop_word,
                          sub_begin_fn=sub_begin,
                          sub_flush_fn=sub_flush)

    return kernel


def _super_aabbs(scene: SceneData, n_super: int):
    """Cluster AABBs with padding neutralized, plus their per-superblock
    unions ((S, 3) each). isfinite guard: padding clusters carry
    non-finite bounds; inf - inf = NaN would poison the union."""
    finite = jnp.isfinite(scene.blk_lo) & jnp.isfinite(scene.blk_hi)
    blo = jnp.where(finite, scene.blk_lo, F32_INF)
    bhi = jnp.where(finite, scene.blk_hi, -F32_INF)
    slo = jnp.min(blo.reshape(n_super, -1, 3), axis=1)
    shi = jnp.max(bhi.reshape(n_super, -1, 3), axis=1)
    return blo, bhi, slo, shi


def _refine_topk_words(scene: SceneData, mask, n_super: int,
                       ox, oy, oz, dx, dy, dz, tile_r: int, k: int,
                       act=None):
    """EXACT per-ray refinement of the CLUSTER bits inside each tile's
    K fattest admitted mask words (flat (T*S,) i32 in, same out).

    After the word-level per-ray union (perray_super_any) the surviving
    words' 32 cluster bits still come from the tile-INTERVAL cull,
    whose direction box spans a full octant for bounce wavefronts —
    tools/prof_cluster_gap.py measures the static slack left inside
    those words. A bit survives here only if some live ray's forward
    line intersects that cluster's own AABB, which is the exact
    admission condition the sweep's block merge tests against faces —
    so clearing the others is a conservative-superset shrink and the
    frame stays bit-identical. Only the K words with the most set bits
    per tile are tested (cost R x 32K slab tests, same order as the
    word pass at K ~ 16); the rest keep their conservative bits, so
    exactness never depends on K."""
    n_tiles = dx.shape[0] // tile_r
    k = min(k, n_super)
    words = mask.reshape(n_tiles, n_super)
    pop = jax.lax.population_count(words)
    _, idx = jax.lax.top_k(pop, k)                      # (T, K)
    cl = (idx[:, :, None] * CULL_BLOCK
          + jnp.arange(CULL_BLOCK)[None, None, :]).reshape(n_tiles, -1)
    blo, bhi, _, _ = _super_aabbs(scene, n_super)
    # a word bit is a 32-FACE kernel cluster; scene.blk_* may be finer
    # (SMALL_CULL_BLOCK scenes forced onto the streamed path) or
    # coarser — regroup the AABBs to the word structure exactly like
    # _regroup_mask regroups the cull mask, or the bit->box mapping
    # tests the WRONG geometry and culls real hits
    nb32 = n_super * CULL_BLOCK
    nblk = blo.shape[0]
    if nblk != nb32:
        if nblk > nb32:   # finer cull clusters: union each group
            assert nblk % nb32 == 0, (nblk, nb32)
            blo = blo.reshape(nb32, -1, 3).min(axis=1)
            bhi = bhi.reshape(nb32, -1, 3).max(axis=1)
        else:             # coarser: every member bit shares the box
            assert nb32 % nblk == 0, (nblk, nb32)
            rep = nb32 // nblk
            blo = jnp.repeat(blo, rep, axis=0)
            bhi = jnp.repeat(bhi, rep, axis=0)
    ok = perray_boxes_any(blo[cl], bhi[cl], ox, oy, oz, dx, dy, dz,
                          tile_r, act=act)              # (T, K*32)
    shift = jnp.arange(CULL_BLOCK, dtype=jnp.uint32)[None, None, :]
    # the shifted bits are disjoint, so the sum IS the bitwise OR and
    # cannot wrap uint32
    refined = jnp.sum(
        ok.reshape(n_tiles, k, CULL_BLOCK).astype(jnp.uint32) << shift,
        axis=2, dtype=jnp.uint32)                       # (T, K)
    old = jnp.take_along_axis(words, idx, axis=1)
    new = (old.astype(jnp.uint32) & refined).astype(jnp.int32)
    tix = jnp.arange(n_tiles)[:, None]
    return words.at[tix, idx].set(new).reshape(-1)


def _stream_sched(scene: SceneData, mask, ox, oy, oz, dx, dy, dz,
                  tile_r: int, nsub: int, n_super: int, act=None):
    """Front-to-back schedule for the streaming closest-hit kernels.

    Returns (tlb3, order2, texit):
    - tlb3 (NB, nsub+1, n_super) f32: per-(subtile, superblock-word)
      conservative ENTRY-t lower bounds (inf where the sub's mask word
      is empty); row nsub = min over the batch's subtiles (the sorted
      stop row);
    - order2 (NB, n_super) i32: per-batch word visit order, ascending
      in the batch-min entry t — front-to-back;
    - texit (R,) f32: per-ray upper bound of the scene-root exit t (-1
      for rays that miss the root — they can hit nothing).

    Together these give the streamed sweep EXACT early termination: a
    word whose entry lower bound exceeds max_ray(min(best_t, texit))
    cannot improve any lexicographic (t, face) winner, so skipping it
    (and, under the sorted order, everything after it) is bit-exact.
    The TPU-shaped analogue of ordered BVH descent with ray shortening
    — the per-ray program counter becomes a per-tile sorted word list
    plus a scalar bound check per (sub, word)."""
    blo, bhi, slo, shi = _super_aabbs(scene, n_super)

    omin, omax, dmin, dmax = tile_ray_bounds(ox, oy, oz, dx, dy, dz,
                                             tile_r, act)
    a = slo[None, :, :] - omax[:, None, :]  # (T,S,3)
    b = shi[None, :, :] - omin[:, None, :]
    _, t0 = slab_interval_entry(a, b, dmin[:, None, :], dmax[:, None, :])

    n_tiles = dx.shape[0] // tile_r
    m = mask.reshape(n_tiles, n_super)
    tlb = jnp.where(m != 0, t0, F32_INF)  # (T,S)
    g = tlb.reshape(n_tiles // nsub, nsub, n_super)
    tmin = jnp.min(g, axis=1)  # (NB,S)
    tlb3 = jnp.concatenate([g, tmin[:, None, :]], axis=1)
    order2 = jnp.argsort(tmin, axis=1).astype(jnp.int32)

    lo = jnp.min(blo, axis=0)
    hi = jnp.max(bhi, axis=0)
    texit = ray_root_exit(lo, hi, ox, oy, oz, dx, dy, dz)
    # zero-direction lanes (tile padding / parked paths) can hit
    # nothing but would read exit = inf when their origin sits inside
    # the root — pin them to -1 so they never hold the bound up
    live = (dx != 0.0) | (dy != 0.0) | (dz != 0.0)
    texit = jnp.where(live, texit, -1.0)
    return tlb3, order2, texit


def _vmem_sched(scene: SceneData, mask, nwords: int, ox, oy, oz,
                dx, dy, dz, tile_r: int, f: int, block_f: int, act=None):
    """Front-to-back schedule for the all-VMEM kernels.

    Returns (tlb (T,1,nb) f32, order (T,1,nb) i32, texit (R,) f32):
    per-(tile, face-block) conservative entry-t lower bounds (+inf
    where the accel mask culls the block — the mask is FOLDED into the
    schedule, so the kernel needs no separate word scan), the per-tile
    block visit order ascending in entry t, and the per-ray root-exit
    cap. Same exactness contract as _stream_sched, at single-block
    granularity."""
    nb = f // block_f
    n_tiles = dx.shape[0] // tile_r
    omin, omax, dmin, dmax = tile_ray_bounds(ox, oy, oz, dx, dy, dz,
                                             tile_r, act)
    finite = jnp.isfinite(scene.blk_lo) & jnp.isfinite(scene.blk_hi)
    blo = jnp.where(finite, scene.blk_lo, F32_INF)
    bhi = jnp.where(finite, scene.blk_hi, -F32_INF)
    a = blo[None, :, :] - omax[:, None, :]
    b = bhi[None, :, :] - omin[:, None, :]
    _, t0 = slab_interval_entry(a, b, dmin[:, None, :], dmax[:, None, :])

    cull = f // scene.blk_lo.shape[0]
    if block_f > cull:
        t0 = t0.reshape(n_tiles, -1, block_f // cull).min(axis=2)
    elif block_f < cull:
        t0 = jnp.repeat(t0, cull // block_f, axis=1)

    words = mask.reshape(n_tiles, nwords)
    c = jnp.arange(nb)
    bits = (words[:, c >> 5] >> (c & 31)) & 1
    tlb = jnp.where(bits != 0, t0, F32_INF)
    order = jnp.argsort(tlb, axis=1).astype(jnp.int32)

    lo = jnp.min(blo, axis=0)
    hi = jnp.max(bhi, axis=0)
    texit = ray_root_exit(lo, hi, ox, oy, oz, dx, dy, dz)
    live = (dx != 0.0) | (dy != 0.0) | (dz != 0.0)
    texit = jnp.where(live, texit, -1.0)
    return tlb[:, None, :], order[:, None, :], texit


def _should_stream(f: int, block_f: int) -> bool:
    """Stream the face pack from HBM when it no longer fits VMEM
    comfortably. Requires superblock-aligned padding (core/scene.py pads
    big scenes to SUPER_F) and the default cluster-sized face block."""
    return f > STREAM_FACES and f % SUPER_F == 0 and block_f == CULL_BLOCK


def _natural_block_f(scene: SceneData, f: int) -> int:
    """The scene's own cull-cluster granularity (8 for small scenes, 32
    past SMALL_CLUSTER_FACES — core/scene.py): the kernels' face-block
    size defaults to it so the mask/schedule is consumed 1:1."""
    nbc = scene.blk_lo.shape[0]
    if nbc and f % nbc == 0:
        return max(1, f // nbc)
    return min(BLOCK_F, f)


def _tile_bounds(x, tile_r):
    """Per-tile componentwise min/max of a padded (R,) plane."""
    t = x.reshape(-1, tile_r)
    return jnp.min(t, axis=1), jnp.max(t, axis=1)


def tile_cull_mask(scene: SceneData, ox, oy, oz, dx, dy, dz, tile_r,
                   act=None):
    """(tiles, clusters) i32 conservative activity mask — the FLAT scan.

    Interval-arithmetic slab test: a tile's rays are bounded by
    componentwise origin/direction intervals; a cluster AABB can only be
    hit if every axis admits some t >= 0 (ops/bvh.py has the NumPy
    reference + derivation; ops/traverse.py the shared math). ox.. may
    be scalars (shared origin) or padded (R,) planes (per-ray shadow
    origins). O(tiles x clusters) — at large cluster counts the LBVH
    walk (accel="bvh") replaces this.
    """
    omin, omax, dmin, dmax = tile_ray_bounds(ox, oy, oz, dx, dy, dz,
                                             tile_r, act)
    a = scene.blk_lo[None, :, :] - omax[:, None, :]  # (T,B,3)
    b = scene.blk_hi[None, :, :] - omin[:, None, :]
    ok = slab_interval_ok(a, b, dmin[:, None, :], dmax[:, None, :])
    return ok.astype(jnp.int32)


def _mask_words(scene: SceneData, accel: str, ox, oy, oz, dx, dy, dz,
                tile_r: int, block_f: int, f: int,
                interpret: bool = False, act=None):
    """Packed per-(tile, cluster) activity words for the kernels.

    accel: "brute" = all bits set (reference-parity brute force);
    "cull" = flat interval scan; "bvh" = in-kernel hierarchical LBVH-cut
    traversal (ops/traverse_pallas.py — the TPU-shaped walk; the deep
    skip-pointer walk lives in ops/traverse.py). All three are
    conservative supersets of the true hit set and kernels visit
    clusters in ascending order, so the frame is bit-identical across
    strategies. "bvh" degrades gracefully: scenes whose AABB tables
    exceed the traversal kernel's SMEM budget fall back to the flat
    scan (still correct, O(T*B)).
    """
    n_tiles = dx.shape[0] // tile_r
    nb = f // block_f
    nwords = -(-nb // 32)
    if accel == "brute":
        return jnp.full((n_tiles * nwords,), -1, jnp.int32), nwords
    if accel == "bvh" and \
            scene.blk_lo.shape[0] == nb and hier_cull_fits(nb):
        bounds = tile_ray_bounds(ox, oy, oz, dx, dy, dz, tile_r, act)
        words = hier_cull_words(scene.blk_lo, scene.blk_hi, *bounds,
                                nwords=nwords, interpret=interpret)
        return words.reshape(-1), nwords
    mask = tile_cull_mask(scene, ox, oy, oz, dx, dy, dz, tile_r, act)
    return _pack_mask_bits(_regroup_mask(mask, f, block_f))


@functools.partial(jax.jit, static_argnames=("tile_r", "block_f",
                                             "interpret", "with_nm",
                                             "accel", "stream",
                                             "with_spheres", "near",
                                             "far"))
def gbuffer_pallas(scene: SceneData, origin, dx, dy, dz, *,
                   tile_r: int = TILE_R, block_f: Optional[int] = None,
                   interpret: bool = False, with_nm: bool = False,
                   accel: str = "cull",
                   stream: Optional[bool] = None,
                   with_spheres: bool = False,
                   near: float = 0.01, far: float = 100.0):
    """Closest-hit G-buffer for shared-origin planar rays dx/dy/dz (R,).
    with_nm additionally resolves interpolated vertex normals + tangent
    frames (normal-mapping path). accel picks the mask strategy
    (brute/cull/bvh, see _mask_words); stream=None auto-selects the
    HBM-streaming kernel for face packs too big for VMEM.

    with_spheres=True fuses the scene's sphere passes into the sweep
    and returns (GBuffer, sph) with sph = (t, id_f32, nx, ny, nz) —
    the winning sphere per ray, selected by nonlinear depth exactly
    like the sequential composite (see _make_closest_hit_kernel).
    Fusion only exists on the VMEM path: on the streaming path (or
    with no spheres) sph is None and the caller must run the
    per-sphere passes itself."""
    f = scene.tri_p0.shape[0]
    block_f = _natural_block_f(scene, f) if block_f is None \
        else min(block_f, f)
    assert f % block_f == 0, (f, block_f)
    if stream is None:
        stream = _should_stream(f, block_f)
    if stream and block_f != CULL_BLOCK:
        # the streaming word structure is fixed: one 32-bit mask word =
        # one 1024-face superblock of 32 32-face blocks — fine-cluster
        # scenes (8-face, small) regroup their mask up to 32 here
        assert f % CULL_BLOCK == 0, (f, block_f)
        block_f = CULL_BLOCK

    nrays = dx.shape[0]
    pad_to = tile_r * (STREAM_BATCH if stream else 1)
    dx = _pad1(dx, pad_to)
    dy = _pad1(dy, pad_to)
    dz = _pad1(dz, pad_to)
    r = dx.shape[0]

    oterm = pack_origin_cols(scene, origin)
    if stream:
        # splice the per-frame origin terms into the static record's
        # reserved columns: one aligned (F, 128) materialization
        # instead of rebuilding the whole pack from narrow operands
        spack = jax.lax.dynamic_update_slice(
            _stream_pack(scene), oterm, (0, SC_OT))
    else:
        fpack = pack_face_columns(scene)

    mask, nwords = _mask_words(scene, accel, origin[0], origin[1], origin[2],
                               dx, dy, dz, tile_r, block_f, f, interpret)

    grid = (r // tile_r,)  # face-cluster loop runs inside the kernel
    tf_shape = [jax.ShapeDtypeStruct((r,), jnp.float32),
                jax.ShapeDtypeStruct((r,), jnp.int32)]

    if stream:
        n_super = f // SUPER_F
        assert nwords == n_super, (nwords, n_super)
        nsub = STREAM_BATCH
        grid = (r // (tile_r * nsub),)
        mask_spec, ray_spec_s, mask3 = _stream_mask_spec(
            mask, r // tile_r, nwords, tile_r, nsub)
        tlb3, order2, texit = _stream_sched(
            scene, mask, origin[0], origin[1], origin[2], dx, dy, dz,
            tile_r, nsub, n_super)
        tlb_spec = pl.BlockSpec((1, nsub + 1, n_super),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.SMEM)
        order_spec = pl.BlockSpec((1, 1, n_super), lambda i: (i, 0, 0),
                                  memory_space=pltpu.SMEM)
        outs = pl.pallas_call(
            _make_streaming_ch_slim_kernel(SUPER_F, n_super,
                                           tile_r, nsub),
            grid=grid,
            in_specs=[
                mask_spec, order_spec, tlb_spec,
                ray_spec_s, ray_spec_s, ray_spec_s, ray_spec_s,
                pl.BlockSpec(memory_space=pl.ANY),  # face pack stays HBM
            ],
            out_specs=[ray_spec_s] * 2,
            out_shape=tf_shape,
            scratch_shapes=_stream_scratch(acc_tile_r=tile_r,
                                           nsub=nsub),
            interpret=interpret,
        )(mask3, order2[:, None, :], tlb3, dx, dy, dz, texit, spack)
    else:
        n_sph = scene.num_spheres if with_spheres else 0
        nb = f // block_f
        tlb, order, texit = _vmem_sched(scene, mask, nwords,
                                        origin[0], origin[1], origin[2],
                                        dx, dy, dz, tile_r, f, block_f)
        sched_spec = pl.BlockSpec((1, 1, nb), lambda i: (i, 0, 0),
                                  memory_space=pltpu.SMEM)
        ray_spec = pl.BlockSpec((tile_r,), lambda i: (i,),
                                memory_space=pltpu.VMEM)
        sph_in, sph_spec = (), ()
        out_shape = list(tf_shape)
        if n_sph:
            sph_flat = jnp.concatenate(
                [jnp.asarray(origin, jnp.float32).reshape(3),
                 jnp.concatenate(
                     [scene.sphere_center,
                      scene.sphere_radius[:, None]], axis=1).reshape(-1)])
            sph_in = (sph_flat,)
            sph_spec = (pl.BlockSpec(memory_space=pltpu.SMEM),)
            out_shape += [jax.ShapeDtypeStruct((r,), jnp.float32)
                          for _ in range(5)]
        outs = pl.pallas_call(
            _make_closest_hit_kernel(block_f, nb, n_spheres=n_sph,
                                     near=near, far=far),
            grid=grid,
            in_specs=[
                sched_spec, sched_spec,
                ray_spec, ray_spec, ray_spec, ray_spec,
                pl.BlockSpec((f, FPACK_COLS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ] + list(sph_spec),
            out_specs=[ray_spec] * len(out_shape),
            out_shape=out_shape,
            interpret=interpret,
        )(tlb, order, dx, dy, dz, texit, fpack, oterm, *sph_in)
        if n_sph:
            sph_out = tuple(o[:nrays] for o in outs[2:])
            outs = outs[:2]

    t_s, face_s = [o[:nrays] for o in outs]
    # oterm holds the exact floats the kernel read (the streamed record
    # splices these same columns at SC_OT), so expand's h-planes use
    # identical origin terms in both branches
    gb = expand_tf_gbuffer(scene, t_s, face_s,
                           dx[:nrays], dy[:nrays], dz[:nrays],
                           origin=origin, oterm=oterm,
                           with_nm=with_nm)
    if with_spheres:
        return gb, (sph_out if (not stream and scene.num_spheres)
                    else None)
    return gb


@functools.partial(jax.jit, static_argnames=("tile_r", "block_f",
                                             "interpret", "accel", "stream"))
def gbuffer_perray_pallas(scene: SceneData, ox, oy, oz, dx, dy, dz, *,
                          tile_r: int = TILE_R,
                          block_f: Optional[int] = None,
                          interpret: bool = False, accel: str = "cull",
                          stream: Optional[bool] = None) -> GBuffer:
    """Closest-hit G-buffer for PER-RAY-origin planar rays (bounce rays).
    Terminated paths should carry dirs == 0 (they cannot hit)."""
    f = scene.tri_p0.shape[0]
    block_f = _natural_block_f(scene, f) if block_f is None \
        else min(block_f, f)
    assert f % block_f == 0
    if stream is None:
        stream = _should_stream(f, block_f)
    if stream and block_f != CULL_BLOCK:
        # the streaming word structure is fixed: one 32-bit mask word =
        # one 1024-face superblock of 32 32-face blocks — fine-cluster
        # scenes (8-face, small) regroup their mask up to 32 here
        assert f % CULL_BLOCK == 0, (f, block_f)
        block_f = CULL_BLOCK

    nrays = dx.shape[0]
    pad_to = tile_r * (STREAM_BATCH if stream else 1)
    planes = [_pad1(a, pad_to) for a in (dx, dy, dz, ox, oy, oz)]
    r = planes[0].shape[0]

    dxp, dyp, dzp, oxp, oyp, ozp = planes
    # parked (terminated) rays carry all-zero directions — at streaming
    # scale keep them out of the tile bounds or one mixed tile admits
    # the whole scene (see anyhit_pallas for the small-scene trade-off)
    live = ((dxp != 0.0) | (dyp != 0.0) | (dzp != 0.0)) if stream else None
    mask, nwords = _mask_words(scene, accel, oxp, oyp, ozp,
                               dxp, dyp, dzp, tile_r, block_f, f,
                               interpret, act=live)

    grid = (r // tile_r,)
    tf_shape = [jax.ShapeDtypeStruct((r,), jnp.float32),
                jax.ShapeDtypeStruct((r,), jnp.int32)]

    if stream:
        n_super = f // SUPER_F
        assert nwords == n_super, (nwords, n_super)
        nsub = STREAM_BATCH
        grid = (r // (tile_r * nsub),)
        spack = _stream_pack(scene)
        # EXACT per-ray union refinement at word granularity: bounce
        # wavefronts spread directions over an octant, which makes the
        # interval cull admit 7.6x more clusters than any ray can
        # actually reach (tools/prof_bounce_mask.py) — zeroing the
        # words no ray's forward line touches cuts streamed fetches
        # AND whole-word visits before the schedule is built
        _, _, slo, shi = _super_aabbs(scene, n_super)
        sup_ok = perray_super_any(slo, shi, oxp, oyp, ozp,
                                  dxp, dyp, dzp, tile_r, act=live)
        mask = jnp.where(sup_ok.reshape(-1), mask, 0)
        if PT_KREFINE:
            # second-stage exact per-ray union at CLUSTER granularity,
            # limited to the K fattest surviving words per tile —
            # clears interval-cull bits no ray's line can touch before
            # the schedule is built (opt-in; tools/prof_cluster_gap.py)
            mask = _refine_topk_words(scene, mask, n_super,
                                      oxp, oyp, ozp, dxp, dyp, dzp,
                                      tile_r, PT_KREFINE, act=live)
        mask_spec, ray_spec_s, mask3 = _stream_mask_spec(
            mask, r // tile_r, nwords, tile_r, nsub)
        tlb3, order2, texit = _stream_sched(
            scene, mask, oxp, oyp, ozp, dxp, dyp, dzp,
            tile_r, nsub, n_super, act=live)
        tlb_spec = pl.BlockSpec((1, nsub + 1, n_super),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.SMEM)
        order_spec = pl.BlockSpec((1, 1, n_super), lambda i: (i, 0, 0),
                                  memory_space=pltpu.SMEM)
        outs = pl.pallas_call(
            _make_streaming_chp_slim_kernel(SUPER_F, n_super,
                                            tile_r, nsub),
            grid=grid,
            in_specs=[mask_spec, order_spec, tlb_spec]
            + [ray_spec_s] * 7 + [
                pl.BlockSpec(memory_space=pl.ANY),  # face pack stays HBM
            ],
            out_specs=[ray_spec_s] * 2,
            out_shape=tf_shape,
            scratch_shapes=_stream_scratch(acc_tile_r=tile_r,
                                           nsub=nsub),
            interpret=interpret,
        )(mask3, order2[:, None, :], tlb3, *planes, texit, spack)
    else:
        fpack = pack_face_columns(scene)
        dc = jnp.concatenate(
            [scene.tri_d[:, None], scene.tri_c,
             jnp.zeros((f, 4), jnp.float32)], axis=1)
        nb = f // block_f
        tlb, order, texit = _vmem_sched(scene, mask, nwords,
                                        oxp, oyp, ozp, dxp, dyp, dzp,
                                        tile_r, f, block_f)
        sched_spec = pl.BlockSpec((1, 1, nb), lambda i: (i, 0, 0),
                                  memory_space=pltpu.SMEM)
        ray_spec = pl.BlockSpec((tile_r,), lambda i: (i,),
                                memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            _make_closest_hit_perray_kernel(block_f, nb),
            grid=grid,
            in_specs=[sched_spec, sched_spec] + [ray_spec] * 7 + [
                pl.BlockSpec((f, FPACK_COLS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[ray_spec] * 2,
            out_shape=tf_shape,
            interpret=interpret,
        )(tlb, order, *planes, texit, fpack, dc)

    t_s, face_s = [o[:nrays] for o in outs]
    return expand_tf_gbuffer(scene, t_s, face_s, dx, dy, dz,
                             oxyz=(ox, oy, oz))


@functools.partial(jax.jit, static_argnames=("tile_r", "block_f",
                                             "interpret", "accel",
                                             "stream", "act_cull"))
def anyhit_pallas(scene: SceneData, ox, oy, oz, dx, dy, dz, active, *,
                  tile_r: int = TILE_R, block_f: Optional[int] = None,
                  interpret: bool = False, accel: str = "cull",
                  stream: Optional[bool] = None,
                  act_cull: Optional[bool] = None):
    """Planar any-hit: returns (R,) bool occlusion for per-ray origins.

    act_cull: fold the activity mask into the tile cull bounds
    (inactive rays' occlusion is act-gated in-kernel, so this is exact
    for every consumed output). None = only at streaming scale (the
    historical default — see the comment below); the path tracer's
    last-bounce NEE passes True because its wavefronts are mostly-dead
    (tools/prof_pt4.py: ~5% live at BASELINE config 4's viewpoint)."""
    f = scene.tri_p0.shape[0]
    block_f = _natural_block_f(scene, f) if block_f is None \
        else min(block_f, f)
    assert f % block_f == 0
    if stream is None:
        stream = _should_stream(f, block_f)
    if stream and block_f != CULL_BLOCK:
        # the streaming word structure is fixed: one 32-bit mask word =
        # one 1024-face superblock of 32 32-face blocks — fine-cluster
        # scenes (8-face, small) regroup their mask up to 32 here
        assert f % CULL_BLOCK == 0, (f, block_f)
        block_f = CULL_BLOCK

    nrays = dx.shape[0]
    pad_to = tile_r * (STREAM_BATCH if stream else 1)
    args = [_pad1(a, pad_to) for a in (dx, dy, dz, ox, oy, oz)]
    act = _pad1(active.astype(jnp.float32), pad_to)
    r = args[0].shape[0]

    dxp, dyp, dzp, oxp, oyp, ozp = args
    # act-aware bounds only pay at streaming scale: a real/parked mixed
    # tile admits the WHOLE scene (16k clusters on the terrain), while a
    # small scene's "whole scene" is a handful of clusters — there the
    # extra where-masked reductions cost more than they save
    if act_cull is None:
        act_cull = stream
    mask, nwords = _mask_words(scene, accel, oxp, oyp, ozp,
                               dxp, dyp, dzp, tile_r, block_f, f,
                               interpret,
                               act=(act > 0) if act_cull else None)

    grid = (r // tile_r,)
    if stream:
        n_super = f // SUPER_F
        assert nwords == n_super, (nwords, n_super)
        nsub = STREAM_BATCH
        grid = (r // (tile_r * nsub),)
        spack = _stream_pack(scene)
        if AH_PERRAY_MASK:
            # EXACT per-ray union word refinement, as the streamed CH
            # path does unconditionally. For shadow wavefronts (ONE
            # direction, Morton-compact origins) the measured admit gap
            # is only 1.32x at word granularity with a comparable-cost
            # O(R x S) mask pass (tools/probe_ah_gap.py: 423.5 -> 320.0
            # clusters/tile, fetches 1.43x) — a wash candidate, so OFF
            # by default pending the on-chip A/B (tools/tpu_round.sh).
            # Output is identical either way: the refinement only clears
            # words no live ray's forward line can touch.
            _, _, slo, shi = _super_aabbs(scene, n_super)
            sup_ok = perray_super_any(slo, shi, oxp, oyp, ozp,
                                      dxp, dyp, dzp, tile_r,
                                      act=(act > 0))
            mask = jnp.where(sup_ok.reshape(-1), mask, 0)
        mask_spec, ray_spec_s, mask3 = _stream_mask_spec(
            mask, r // tile_r, nwords, tile_r, nsub)
        tlb3, order2, texit = _stream_sched(
            scene, mask, oxp, oyp, ozp, dxp, dyp, dzp,
            tile_r, nsub, n_super, act=(act > 0))
        tlb_spec = pl.BlockSpec((1, nsub + 1, n_super),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.SMEM)
        order_spec = pl.BlockSpec((1, 1, n_super), lambda i: (i, 0, 0),
                                  memory_space=pltpu.SMEM)
        occ = pl.pallas_call(
            _make_streaming_anyhit_kernel(block_f, SUPER_F, n_super,
                                          tile_r, nsub),
            grid=grid,
            in_specs=[mask_spec, order_spec, tlb_spec]
            + [ray_spec_s] * 8 + [
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=ray_spec_s,
            out_shape=jax.ShapeDtypeStruct((r,), jnp.float32),
            scratch_shapes=_stream_scratch(acc_tile_r=tile_r, n_acc=1,
                                           nsub=nsub),
            interpret=interpret,
        )(mask3, order2[:, None, :], tlb3, *args, act, texit, spack)
    else:
        fpack = pack_face_columns(scene)
        dc = jnp.concatenate(
            [scene.tri_d[:, None], scene.tri_c,
             jnp.zeros((f, 4), jnp.float32)], axis=1)  # (F, 8)
        nb = f // block_f
        tlb, order, texit = _vmem_sched(scene, mask, nwords,
                                        oxp, oyp, ozp, dxp, dyp, dzp,
                                        tile_r, f, block_f,
                                        act=(act > 0))
        sched_spec = pl.BlockSpec((1, 1, nb), lambda i: (i, 0, 0),
                                  memory_space=pltpu.SMEM)
        ray_spec = pl.BlockSpec((tile_r,), lambda i: (i,),
                                memory_space=pltpu.VMEM)
        occ = pl.pallas_call(
            _make_anyhit_kernel(block_f, nb),
            grid=grid,
            in_specs=[sched_spec, sched_spec] + [ray_spec] * 8 + [
                pl.BlockSpec((f, FPACK_COLS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=ray_spec,
            out_shape=jax.ShapeDtypeStruct((r,), jnp.float32),
            interpret=interpret,
        )(tlb, order, *args, act, texit, fpack, dc)

    return occ[:nrays] > 0.0


def _expand_bits_jnp(v):
    """Spread the low 10 bits to every third bit (Morton, jnp)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def _origin_morton(scene: SceneData, ox, oy, oz):
    """30-bit Morton codes of per-ray origins in the scene's (finite)
    cluster-AABB extent. Out-of-scene sentinels clip to the max cell."""
    finite = jnp.isfinite(scene.blk_lo) & jnp.isfinite(scene.blk_hi)
    lo = jnp.min(jnp.where(finite, scene.blk_lo, F32_INF), axis=0)
    hi = jnp.max(jnp.where(finite, scene.blk_hi, -F32_INF), axis=0)
    ext = jnp.maximum(hi - lo, 1e-12)

    def q(p, a):
        return jnp.clip((p - lo[a]) / ext[a] * 1023.0,
                        0.0, 1023.0).astype(jnp.uint32)

    return ((_expand_bits_jnp(q(ox, 0)) << 2)
            | (_expand_bits_jnp(q(oy, 1)) << 1)
            | _expand_bits_jnp(q(oz, 2)))


def _permute_planes(planes, perm):
    """Apply one permutation to many (R,) planes with a SINGLE gather
    (stack first — gathers cost per index, not per payload row)."""
    return jnp.take(jnp.stack(planes), perm, axis=1)


def _unpermute_planes(stacked, perm):
    """Inverse of _permute_planes: one scatter back to ray order."""
    return jnp.zeros_like(stacked).at[:, perm].set(stacked)


def _bounce_sort_perm(scene: SceneData, ox, oy, oz, dx, dy, dz):
    """(R,) permutation re-tiling an INCOHERENT bounce wavefront for the
    interval cull: origin-Morton cell with the direction OCTANT spliced
    into the key's middle bits. A tile whose direction interval spans
    the whole sphere has an unbounded-t cone — the conservative slab
    test must admit EVERY cluster (measured: 18.7 s/spp path tracing
    the 522k terrain at 540p). Splitting each coarse origin cell by
    direction sign octant bounds every tile's cone to a quadrant while
    keeping origins compact: both the extension closest-hit and the
    NEE shadow rays (same origins) can share this one permutation."""
    # drop the lowest Morton bit so 29 origin bits + 3 octant bits fit
    # uint32 exactly — a 30+3-bit key silently wraps and aliases
    # origins from opposite x-halves of the scene into one sort bucket
    m = _origin_morton(scene, ox, oy, oz) >> 1
    octant = (((dx < 0.0).astype(jnp.uint32) << 2)
              | ((dy < 0.0).astype(jnp.uint32) << 1)
              | (dz < 0.0).astype(jnp.uint32))
    # sign octant only: it fixes the slab test's pos/neg branch per
    # axis, which is what bounds the t-interval; finer direction bins
    # (tried: +dominant axis) fragment origin locality for no interval
    # payoff and measured slightly slower
    key = ((m >> 14) << 17) | (octant << 14) | (m & jnp.uint32(0x3FFF))
    return jnp.argsort(key)


def anyhit_reordered_pallas(scene: SceneData, ox, oy, oz, dx, dy, dz,
                            active, *, interpret: bool = False,
                            accel: str = "cull"):
    """Shadow any-hit with ORIGIN-MORTON ray reordering for big scenes.

    Shadow rays are grouped by the SCREEN tile of the pixel that spawned
    them, but their ORIGINS live on the hit surface — at grazing views a
    32x32-pixel tile spans half the scene in depth, its origin interval
    balloons, and the conservative cull admits thousands of clusters per
    tile (measured on the 522k-face terrain: 5,223 mean active clusters
    per tile, 1.08 s for the any-hit sweep). Sorting the shadow
    wavefront by the Morton code of its ORIGINS re-tiles it into
    world-space-compact groups whose interval boxes are thin slabs.
    The whole permutation machinery (argsort + one packed gather + one
    scatter back to pixel order) costs ~10 ms at 2M rays — callers gate
    on scene size. Results are exactly the per-ray results of
    anyhit_pallas (a permutation is semantics-free)."""
    # parked rays (origin 1e9) clip to the max cell and group together
    perm = jnp.argsort(_origin_morton(scene, ox, oy, oz))
    pv = _permute_planes([ox, oy, oz, dx, dy, dz,
                          active.astype(jnp.float32)], perm)
    occ = anyhit_pallas(scene, pv[0], pv[1], pv[2], pv[3], pv[4], pv[5],
                        pv[6] > 0.0, interpret=interpret, accel=accel)
    return jnp.zeros_like(active).at[perm].set(occ)


# ---------------------------------------------------------------------------
# Planar frame building blocks (jnp; XLA fuses them around the kernels)
# ---------------------------------------------------------------------------


def raygen_planar(width, height, uni: CameraUniforms, row0=None,
                  total_height=None):
    """Planar pixelToRay (sphere/compute.wgsl:87-101): returns dx, dy, dz
    (R,) f32 flat W-major (texel row 0 first), same math/order as
    ops.raygen.ray_directions. row0/total_height select a row-slab
    viewport of a taller image (multi-chip tile sharding)."""
    proj_inv = jnp.asarray(uni.proj_inv_wgpu, jnp.float32)
    view_inv = jnp.asarray(uni.view_inv, jnp.float32)
    m = jnp.matmul(view_inv[:3, :3], proj_inv[:3, :], precision=HI)
    const = m[:, 2] + m[:, 3]

    th = total_height or height
    x_nds, _ = ndc_grid(width, th)
    y_idx = jnp.arange(height, dtype=jnp.float32)
    if row0 is not None:
        y_idx = y_idx + row0
    y_nds = (2.0 * (y_idx + 0.5) / th) - 1.0
    xr = jnp.tile(x_nds, height)  # (R,) W-major
    yr = jnp.repeat(y_nds, width)

    dx = m[0, 0] * xr + m[0, 1] * yr + const[0]
    dy = m[1, 0] * xr + m[1, 1] * yr + const[1]
    dz = m[2, 0] * xr + m[2, 1] * yr + const[2]
    inv_l = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return dx * inv_l, dy * inv_l, dz * inv_l


def raygen_planar_tiled(width, height, uni: CameraUniforms, row0=None,
                        total_height=None, tile_h: int = 8,
                        tile_w: int = 128):
    """raygen_planar but rays ordered by (tile_h x tile_w)-PIXEL SCREEN
    TILES so each kernel ray-tile (TILE_R=1024 consecutive rays) is a
    compact 2D screen block instead of a half-scanline: the tile
    direction cone tightens and interval culling skips far more
    clusters. Squarer tiles cull harder — 32x32 tiles carry a ~2.4x
    sparser cluster mask than 8x128 on the 522k-face terrain (measured)
    because the cone diameter shrinks ~2.8x. Requires height % tile_h
    == 0 and width % tile_w == 0 (render_megakernel pads rows and crops
    to make this hold; NDC y still uses the TRUE height so visible
    pixels' rays are bit-identical to the untiled order). Index math is
    pure arithmetic (no gathers). Returns (dx, dy, dz) in TILED order;
    reassemble outputs with tiled_to_image()."""
    proj_inv = jnp.asarray(uni.proj_inv_wgpu, jnp.float32)
    view_inv = jnp.asarray(uni.view_inv, jnp.float32)
    m = jnp.matmul(view_inv[:3, :3], proj_inv[:3, :], precision=HI)
    const = m[:, 2] + m[:, 3]

    th = total_height or height
    r = width * height
    tsz = tile_h * tile_w
    tiles_x = width // tile_w
    ridx = jnp.arange(r, dtype=jnp.int32)
    tile = ridx // tsz
    within = ridx % tsz
    py = (tile // tiles_x) * tile_h + within // tile_w
    px = (tile % tiles_x) * tile_w + within % tile_w
    yb = py.astype(jnp.float32)
    if row0 is not None:
        yb = yb + row0
    xr = (2.0 * (px.astype(jnp.float32) + 0.5) / width) - 1.0
    yr = (2.0 * (yb + 0.5) / th) - 1.0

    dx = m[0, 0] * xr + m[0, 1] * yr + const[0]
    dy = m[1, 0] * xr + m[1, 1] * yr + const[1]
    dz = m[2, 0] * xr + m[2, 1] * yr + const[2]
    inv_l = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return dx * inv_l, dy * inv_l, dz * inv_l


def tiled_to_image(plane, width, height, tile_h: int = 8,
                   tile_w: int = 128):
    """(R,) plane in (tile_h x tile_w)-tile order -> (H, W)."""
    tiles_x = width // tile_w
    tiles_y = height // tile_h
    return plane.reshape(tiles_y, tiles_x, tile_h, tile_w).transpose(
        0, 2, 1, 3).reshape(height, width)


def _pick_tile_shape(width: int, height: int):
    """Squarest 1024-ray screen tile the frame admits: tile_w must
    divide width; rows are padded to a tile_h multiple (then cropped),
    so tile_h is free. Prefers the squarest tile (tightest cull cones —
    the measured 1080p winner) unless its row padding exceeds height/8,
    in which case the least-padded tiling wins: small row slabs
    (multi-chip dp sharding, e.g. an 8-row pathtrace slab) would
    otherwise trace up to 4x padded rows through every bounce/spp.
    Returns (tile_h, tile_w, padded_height) or None (untiled scanline
    order — also chosen when every tiling would more than double the
    rows)."""
    cands = []
    for tile_w in (32, 64, 128):  # squarest first
        if width % tile_w == 0:
            tile_h = TILE_R // tile_w
            h_pad = -(-height // tile_h) * tile_h
            cands.append((tile_h, tile_w, h_pad))
    if not cands:
        return None
    choice = cands[0]
    if (choice[2] - height) * 8 > height:
        choice = min(cands, key=lambda c: c[2])  # stable: ties stay squarest
    if choice[2] > 2 * height:
        return None
    return choice


def _norm3(x, y, z):
    l = jnp.sqrt(x * x + y * y + z * z)
    return x / l, y / l, z / l


def sphere_pass_planar(scene, i, origin, dx, dy, dz):
    """Planar sphere intersect (sphere/compute.wgsl:63-85) + normal."""
    cx, cy, cz = (scene.sphere_center[i, 0], scene.sphere_center[i, 1],
                  scene.sphere_center[i, 2])
    radius = scene.sphere_radius[i]
    ocx, ocy, ocz = origin[0] - cx, origin[1] - cy, origin[2] - cz
    a = dx * dx + dy * dy + dz * dz
    b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
    c = (ocx * ocx + ocy * ocy + ocz * ocz) - radius * radius
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    t = jnp.where(t1 >= 0.0, t1, jnp.where(t2 >= 0.0, t2, F32_INF))
    t = jnp.where(disc < 0.0, F32_INF, t)
    hit = jnp.isfinite(t)
    ts = jnp.where(hit, t, 0.0)
    px, py, pz = origin[0] + dx * ts, origin[1] + dy * ts, origin[2] + dz * ts
    nx, ny, nz = px - cx, py - cy, pz - cz
    l = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    l = jnp.where(l > 0, l, 1.0)
    return t, hit, nx / l, ny / l, nz / l


def blinn_phong_planar(nx, ny, nz, dx, dy, dz, light, lit=None):
    """Shared planar Blinn-Phong factors: returns (lambert, spec_pow32)."""
    lx, ly, lz = _norm3(light[0], light[1], light[2])
    lam = jnp.maximum(0.0, -(nx * lx + ny * ly + nz * lz))
    hx, hy, hz = -lx - dx, -ly - dy, -lz - dz
    hl = jnp.sqrt(hx * hx + hy * hy + hz * hz)
    hl = jnp.where(hl > 0, hl, 1.0)
    hdotn = jnp.maximum(0.0, (hx * nx + hy * ny + hz * nz) / hl)
    spec = hdotn ** 32.0
    if lit is not None:
        lam = jnp.where(lit, lam, 0.0)
        spec = jnp.where(lit, spec, 0.0)
    return lam, spec


def _texfilter_kernel(taps_ref, fx_ref, fy_ref, r_ref, g_ref, b_ref):
    """Bilinear mix of gathered u16-linear taps.

    taps_ref (12, TILE_R) u16: rows = [t00,t01,t10,t11] x RGB;
    fx/fy (TILE_R,) f32 fractional weights. Lives in Pallas because XLA
    does not fuse slices of a gather output — the same ~30 elementwise
    ops cost ~15 ms at 1080p as stray XLA ops, <1 ms here.
    """
    fx = _row1(fx_ref)
    fy = _row1(fy_ref)

    def tap(k):
        # Mosaic has no u16->f32 cast; widen through i32 first
        w = taps_ref[k:k + 1, :].astype(jnp.int32)
        return w.astype(jnp.float32) * (1.0 / 65535.0)

    for ch, out in ((0, r_ref), (1, g_ref), (2, b_ref)):
        top = tap(ch) * (1.0 - fx) + tap(3 + ch) * fx
        bot = tap(6 + ch) * (1.0 - fx) + tap(9 + ch) * fx
        out[:] = (top * (1.0 - fy) + bot * fy).reshape(-1)


@functools.partial(jax.jit, static_argnames=("tile_r", "interpret"))
def _texfilter_pallas(taps, fx, fy, *, tile_r: int = TILE_R,
                      interpret: bool = False):
    nrays = fx.shape[0]
    fx = _pad1(fx, tile_r)
    fy = _pad1(fy, tile_r)
    pad = fx.shape[0] - taps.shape[1]
    if pad:
        taps = jnp.concatenate(
            [taps, jnp.zeros((12, pad), taps.dtype)], axis=1)
    r = fx.shape[0]
    ray_spec = pl.BlockSpec((tile_r,), lambda i: (i,),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _texfilter_kernel,
        grid=(r // tile_r,),
        in_specs=[
            pl.BlockSpec((12, tile_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            ray_spec, ray_spec,
        ],
        out_specs=[ray_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((r,), jnp.float32)] * 3,
        interpret=interpret,
    )(taps, fx, fy)
    return tuple(o[:nrays] for o in outs)


def _texshade_kernel(taps_ref, fx_ref, fy_ref, lam_ref, spec_ref,
                     ar_ref, ag_ref, ab_ref, sr_ref, sg_ref, sb_ref,
                     pr_ref, pg_ref, pb_ref):
    """Bilinear mix + Blinn-Phong combine in one kernel:
    p = ambient + tex * lambert + specular_color * spec^32. Keeping the
    combine here avoids materializing the three texture planes + nine
    shading planes between kernels (~1-2 ms at 1080p)."""
    fx = _row1(fx_ref)
    fy = _row1(fy_ref)
    lam = _row1(lam_ref)
    spec = _row1(spec_ref)

    def tap(k):
        w = taps_ref[k:k + 1, :].astype(jnp.int32)
        return w.astype(jnp.float32) * (1.0 / 65535.0)

    outs = ((0, ar_ref, sr_ref, pr_ref), (1, ag_ref, sg_ref, pg_ref),
            (2, ab_ref, sb_ref, pb_ref))
    for ch, amb, spc, out in outs:
        top = tap(ch) * (1.0 - fx) + tap(3 + ch) * fx
        bot = tap(6 + ch) * (1.0 - fx) + tap(9 + ch) * fx
        tex = top * (1.0 - fy) + bot * fy
        out[:] = (_row1(amb) + tex * lam + _row1(spc) * spec).reshape(-1)


@functools.partial(jax.jit, static_argnames=("tile_r", "interpret"))
def _texshade_pallas(taps, fx, fy, lam, spec, ar, ag, ab, sr, sg, sb, *,
                     tile_r: int = TILE_R, interpret: bool = False):
    nrays = fx.shape[0]
    planes = [_pad1(a, tile_r) for a in
              (fx, fy, lam, spec, ar, ag, ab, sr, sg, sb)]
    pad = planes[0].shape[0] - taps.shape[1]
    if pad:
        taps = jnp.concatenate(
            [taps, jnp.zeros((12, pad), taps.dtype)], axis=1)
    r = planes[0].shape[0]
    ray_spec = pl.BlockSpec((tile_r,), lambda i: (i,),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _texshade_kernel,
        grid=(r // tile_r,),
        in_specs=[
            pl.BlockSpec((12, tile_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [ray_spec] * 10,
        out_specs=[ray_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((r,), jnp.float32)] * 3,
        interpret=interpret,
    )(taps, *planes)
    return tuple(o[:nrays] for o in outs)


TEX_ROW_GATHER = __import__("os").environ.get("RT_TEX_ROW_GATHER",
                                              "0") == "1"


def gather_packed_taps(pool, base, hw_h, hw_w, u, v):
    """Compute clamped texel address + fractional weights and run THE one
    gather: returns (taps (12,R) u16, fx, fy). Shared by the plain filter
    and the fused filter+shade paths.

    RT_TEX_ROW_GATHER=1 gathers ROWS of the transposed pool instead of
    (12,1) columns of the (12, N) pool — each ray's 2x2 neighborhood
    becomes one contiguous 24 B fetch instead of 12 strided 2 B reads
    (the af76be6 gpack treatment applied to texels). The per-frame pool
    transpose is ~6 MB (cheap) and is pinned behind an
    optimization_barrier so XLA cannot fold it back into the gather's
    index map and reproduce the column layout. Flag-gated pending the
    on-chip A/B (tools/prof_texgather.py)."""
    x = u * hw_w - 0.5
    y = v * hw_h - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = jnp.where(x0f < 0, 0.0, x - x0f)
    fy = jnp.where(y0f < 0, 0.0, y - y0f)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, (hw_w - 1.0).astype(jnp.int32))
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, (hw_h - 1.0).astype(jnp.int32))
    flat = base.astype(jnp.int32) + y0 * hw_w.astype(jnp.int32) + x0
    if TEX_ROW_GATHER:
        pool_t = jax.lax.optimization_barrier(pool.T)  # (N, 12) u16
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        taps_r = jax.lax.gather(
            pool_t, flat[:, None], dn, slice_sizes=(1, pool.shape[0]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)  # (R, 12)
        return taps_r.T, fx, fy
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(1,), start_index_map=(1,))
    taps = jax.lax.gather(pool, flat[:, None], dn, slice_sizes=(12, 1),
                          mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return taps, fx, fy


def sample_packed_texture(pool, base, hw_h, hw_w, u, v,
                          interpret: bool = False):
    """ONE narrow gather + Pallas bilinear filter.

    pool (12, N) u16 compact texel pool; base (R,) f32 per-ray texel
    offset of the texture; hw_h/hw_w (R,) f32 true sizes; u, v (R,) f32
    (v already flipped). Clamp-to-edge semantics identical to the
    oracle's sample_texture_bilinear: the packed texel at the clamped
    floor coordinate carries its own clamped 2x2 neighborhood (values
    pre-linearized u16 — see SceneData.tex_packed), and fx/fy are zeroed
    when floor < 0 (left/top edge) so the mix degenerates to the edge
    texel exactly like clamping both taps does.
    """
    taps, fx, fy = gather_packed_taps(pool, base, hw_h, hw_w, u, v)
    return _texfilter_pallas(taps, fx, fy, interpret=interpret)


def _mat_const(scene: SceneData, mat_f32, getter):
    """Resolve a per-material constant via an M-way select (no gather).
    Preserves the constant's dtype: texel BASE OFFSETS are i32 — an f32
    plane loses integer precision past 2^24 texels and would misaddress
    every sample of a texture deep in a large packed pool."""
    m = scene.mat_ambient.shape[0]
    c0 = getter(0)
    out = jnp.broadcast_to(c0, mat_f32.shape).astype(jnp.asarray(c0).dtype)
    for k in range(1, m):
        out = jnp.where(mat_f32 == float(k), getter(k), out)
    return out


# ---------------------------------------------------------------------------
# The frame function
# ---------------------------------------------------------------------------


def _frame_shape(width, height, row0, total_height):
    """The split frame's resolved ray ordering: (tile_h, tile_w,
    render_h) screen tiling or None (scanline order). Sharded row
    slabs must not render past their slab (see render_megakernel)."""
    shape = _pick_tile_shape(width, height)
    if shape is not None and row0 is not None and shape[2] != height:
        shape = (8, 128, height) if height % 8 == 0 and \
            width % 128 == 0 else None
    return shape


def present_planar(cr, cg, cb, depth, *, width, height, shape,
                   quantize):
    """Shared tail of the split frame: quantize + de-tile the planar
    color/depth planes to ((H, W, 3), (H, W)). shape is the
    _frame_shape tiling this frame rendered with.

    Quantization routes through shade.quantize_rgba8 — the ONE
    implementation every variant shares, with an explicit-reciprocal
    dequantize so different compilation contexts cannot diverge by an
    ulp (see its docstring; the gp-sharded frame promises bitwise
    equality across program boundaries)."""
    from .shade import quantize_rgba8

    if quantize:
        cr = quantize_rgba8(cr)
        cg = quantize_rgba8(cg)
        cb = quantize_rgba8(cb)
    if shape is not None:
        tile_h, tile_w, render_h = shape
        cr = tiled_to_image(cr, width, render_h, tile_h, tile_w)[:height]
        cg = tiled_to_image(cg, width, render_h, tile_h, tile_w)[:height]
        cb = tiled_to_image(cb, width, render_h, tile_h, tile_w)[:height]
        depth = tiled_to_image(depth, width, render_h,
                               tile_h, tile_w)[:height]
        return jnp.stack([cr, cg, cb], axis=-1), depth
    color = jnp.stack(
        [cr.reshape(height, width), cg.reshape(height, width),
         cb.reshape(height, width)], axis=-1)
    return color, depth.reshape(height, width)


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "near", "far", "background", "shadows", "quantize",
    "normal_mapping", "accel", "interpret", "total_height", "fused", "mip",
    "emit_shadow_planes"))
def render_megakernel(scene: SceneData, uni_flat, *, width: int, height: int,
                      near: float = 0.01, far: float = 100.0,
                      background=(0.0, 0.0, 0.0), shadows: bool = False,
                      quantize: bool = True, normal_mapping: bool = False,
                      accel: str = "cull", interpret: bool = False,
                      row0=None, total_height: Optional[int] = None,
                      fused: Optional[bool] = None, mip: bool = False,
                      emit_shadow_planes: bool = False):
    """One frame, fully fused under one jit: planar raygen -> sphere
    passes -> Pallas G-buffer -> one-gather texture shade -> composite.
    The reference's whole render() pass DAG (src/lib.rs:1012-1230)
    collapses into this single compiled program. Returns
    (color (H,W,3) f32, depth (H,W) f32).

    accel selects the intersection acceleration strategy (bit-identical
    output across all three, tested): "brute" = no culling (reference
    parity, triangle_list/compute.wgsl:186-202), "cull" = flat
    tile-interval cluster mask, "bvh" = stackless LBVH traversal
    (ops/traverse.py; BASELINE north star).

    fused=True runs the SINGLE-KERNEL frame variant (ops/fusedframe.py
    — spheres, compositing and the shadow any-hit fused with the
    closest-hit sweep; bit-identical to this split path, tested).
    fused=None (the default) picks the fused program whenever the scene
    is eligible (VMEM-resident mesh, no normal mapping / mip / gp
    staging): measured on-chip at round-4 HEAD the fused frame is
    16.6 ms vs 57.1 ms split at the dense 1080p view — the round-3
    (t,face) sweep redesign made the SWEEP fast (6.5 ms) but its
    post-sweep XLA attribute gathers dominate the split program on
    real TPU silicon, which interpret-mode timing could not see.
    """
    f_pad = scene.tri_p0.shape[0]
    eligible = (scene.num_faces > 0 and f_pad <= STREAM_FACES
                and not (normal_mapping and shadows))
    if fused is None:
        # MEASURED default (TPU v5e, round 4 on-chip): the fused
        # single-kernel frame wins decisively at the dense 1080p view —
        # 16.6 ms vs 57.1 ms split (BENCH artifacts; the split program's
        # post-sweep XLA attribute gather costs ~17 ms and its remaining
        # XLA glue ~28 ms on real hardware, invisible to interpret-mode
        # timing). Round 5 extends the fused frame to normal mapping
        # (tangent frames merged out of the sweep, bump gather in the
        # XLA tail). Split remains the program for everything the fused
        # kernel can't express (streamed/oversize meshes, nm+shadows —
        # the shadow gate needs the perturbed normal — mip LOD, gp
        # shadow-plane staging).
        fused = eligible and not mip and not emit_shadow_planes
    if emit_shadow_planes:
        # geometry-parallel (gp) staging: stop after the shadow
        # WAVEFRONT is built — the merged winner wavefront is traced
        # against every shard and OR'd (parallel/geometry_sharding.py)
        assert shadows and not fused, \
            "emit_shadow_planes stages the split shadowed frame"
    if fused:
        assert eligible and not mip, \
            "fused frame needs a VMEM-resident mesh, no nm+shadows, no mip"
        from .fusedframe import render_frame_fused

        return render_frame_fused(
            scene, uni_flat, width=width, height=height, near=near,
            far=far, background=background, shadows=shadows,
            quantize=quantize, accel=accel, interpret=interpret,
            row0=row0, total_height=total_height,
            normal_mapping=normal_mapping)

    uni = CameraUniforms.unflat(jnp.asarray(uni_flat, jnp.float32))
    origin = uni.origin

    th_total = total_height or height
    shape = _frame_shape(width, height, row0, total_height)
    tiled = shape is not None
    if tiled:
        tile_h, tile_w, render_h = shape
        dx, dy, dz = raygen_planar_tiled(width, render_h, uni, row0=row0,
                                         total_height=th_total,
                                         tile_h=tile_h, tile_w=tile_w)
    else:
        render_h = height
        dx, dy, dz = raygen_planar(width, height, uni, row0=row0,
                                   total_height=total_height)
    r = width * render_h

    bg = jnp.asarray(background, jnp.float32)
    cr = jnp.full((r,), bg[0])
    cg = jnp.full((r,), bg[1])
    cb = jnp.full((r,), bg[2])
    depth = jnp.ones((r,), jnp.float32)
    if shadows:
        # winner planes for the single deferred shadow pass: ambient-only
        # color, hit point inputs and light dir of the VISIBLE surface.
        # (Per-pass shadowing and winner-only shadowing agree pixelwise:
        # only the last pass that wins the depth test reaches the screen.)
        w_ar = jnp.zeros((r,)); w_ag = jnp.zeros((r,)); w_ab = jnp.zeros((r,))
        w_t = jnp.zeros((r,))
        w_nx = jnp.zeros((r,)); w_ny = jnp.zeros((r,)); w_nz = jnp.zeros((r,))
        w_lx = jnp.zeros((r,)); w_ly = jnp.zeros((r,)); w_lz = jnp.full((r,), 1.0)
        # does occlusion even matter for this pixel? p = amb + tex*lam +
        # ks*spec, and the shadowed replacement is exactly amb — so when
        # the winner's lam == 0 AND spec == 0 (surface faces away from
        # the light) the lit and shadowed colors are BITWISE equal and
        # the shadow ray can be parked. Recorded from the passes' actual
        # lam/spec values, so the gate is exact, not a re-derivation.
        w_rel = jnp.zeros((r,), bool)

    def composite(state, pr, pg, pb, t, hit, extra=None):
        cr, cg, cb, depth = state[:4]
        d = to_nonlinear_depth(jnp.where(hit, t, 1.0), near, far)
        write = hit & (d < depth)
        out = [jnp.where(write, pr, cr), jnp.where(write, pg, cg),
               jnp.where(write, pb, cb), jnp.where(write, d, depth)]
        if extra is not None:
            out.extend(jnp.where(write, new, old)
                       for new, old in zip(extra, state[4:]))
        return out, write

    has_mesh = scene.num_faces > 0
    state = [cr, cg, cb, depth]
    if shadows:
        state += [w_ar, w_ag, w_ab, w_t, w_nx, w_ny, w_nz,
                  w_lx, w_ly, w_lz, w_rel]
        covered = jnp.zeros((r,), bool)

    # spheres ride the VMEM G-buffer sweep when there is one (winner-
    # only: one shading + composite instead of a full-screen pass per
    # sphere); gbuffer_pallas itself decides whether fusion applies
    # (VMEM path only) and returns sph_out=None otherwise — streamed/
    # meshless frames keep the per-sphere XLA passes below
    sph_out = None
    if has_mesh:
        gb, sph_out = gbuffer_pallas(scene, origin, dx, dy, dz,
                                     interpret=interpret,
                                     with_nm=normal_mapping,
                                     accel=accel,
                                     with_spheres=True,
                                     near=near, far=far)

    # --- sphere passes, in config order (src/lib.rs:1106-1148) ---
    if sph_out is not None:
        # fused winner: per-ray constants resolve by sphere id (M-way
        # select, like _mat_const), then ONE Blinn-Phong + composite.
        # Same strict nonlinear-depth selection RULE as the sequential
        # passes, but Pallas and XLA compile in different contexts (FMA
        # contraction differs), so a last-ulp t/d difference can flip a
        # near-tie between overlapping spheres; frame-level parity is
        # gated at u8 exactness (test_fused_sphere_winner), not bitwise.
        st, sid, nx, ny, nz = sph_out
        hit = jnp.isfinite(st)

        def sph_const(getter):
            out = jnp.full((r,), getter(0))
            for k in range(1, scene.num_spheres):
                out = jnp.where(sid == float(k), getter(k), out)
            return out

        lx = sph_const(lambda k: scene.sphere_light[k, 0])
        ly = sph_const(lambda k: scene.sphere_light[k, 1])
        lz = sph_const(lambda k: scene.sphere_light[k, 2])
        c0 = sph_const(lambda k: scene.sphere_coeff[k, 0])
        c1 = sph_const(lambda k: scene.sphere_coeff[k, 1])
        c2 = sph_const(lambda k: scene.sphere_coeff[k, 2])
        kr = sph_const(lambda k: scene.sphere_color[k, 0])
        kg = sph_const(lambda k: scene.sphere_color[k, 1])
        kb = sph_const(lambda k: scene.sphere_color[k, 2])
        lam, spec = blinn_phong_planar(nx, ny, nz, dx, dy, dz,
                                       (lx, ly, lz))
        shade = c0 + c1 * lam
        pr = kr * shade + c2 * spec
        pg = kg * shade + c2 * spec
        pb = kb * shade + c2 * spec
        extra = None
        if shadows:
            extra = [kr * c0, kg * c0, kb * c0, st, nx, ny, nz,
                     lx, ly, lz, (lam > 0.0) | (spec > 0.0)]
        state, write = composite(state, pr, pg, pb, st, hit, extra)
        if shadows:
            covered = covered | write
    else:
        for i in range(scene.num_spheres):
            t, hit, nx, ny, nz = sphere_pass_planar(scene, i, origin,
                                                    dx, dy, dz)
            lam, spec = blinn_phong_planar(nx, ny, nz, dx, dy, dz,
                                           scene.sphere_light[i])
            coeff = scene.sphere_coeff[i]
            col = scene.sphere_color[i]
            shade = coeff[0] + coeff[1] * lam
            pr = col[0] * shade + coeff[2] * spec
            pg = col[1] * shade + coeff[2] * spec
            pb = col[2] * shade + coeff[2] * spec
            extra = None
            if shadows:
                light = scene.sphere_light[i]
                extra = [col[0] * coeff[0], col[1] * coeff[0],
                         col[2] * coeff[0],
                         t, nx, ny, nz,
                         jnp.full((r,), light[0]),
                         jnp.full((r,), light[1]),
                         jnp.full((r,), light[2]),
                         (lam > 0.0) | (spec > 0.0)]
            state, write = composite(state, pr, pg, pb, t, hit, extra)
            if shadows:
                covered = covered | write

    # --- mesh pass (Pallas G-buffer + one-gather shading) ---
    if has_mesh:
        hit = jnp.isfinite(gb.t)

        flip = gb.nd > 0.0
        nx = jnp.where(flip, -gb.nx, gb.nx)
        ny = jnp.where(flip, -gb.ny, gb.ny)
        nz = jnp.where(flip, -gb.nz, gb.nz)

        tex_base = _mat_const(scene, gb.mat, lambda k: scene.mat_tex_base[k])
        hw_h = _mat_const(scene, gb.mat, lambda k: scene.mat_tex_h[k])
        hw_w = _mat_const(scene, gb.mat, lambda k: scene.mat_tex_w[k])

        tex_u = gb.uvx
        tex_v = 1.0 - gb.uvy  # V-flip (triangle_list/compute.wgsl:223)

        if normal_mapping:
            # smooth vertex normals where present, aligned with the
            # flipped geometric normal (oracle spec: ops/shade.py)
            vl2 = gb.vnx ** 2 + gb.vny ** 2 + gb.vnz ** 2
            has_vn = vl2 > 1e-12
            inv = 1.0 / jnp.sqrt(jnp.where(has_vn, vl2, 1.0))
            vnx, vny, vnz = gb.vnx * inv, gb.vny * inv, gb.vnz * inv
            sgn = jnp.where(vnx * nx + vny * ny + vnz * nz < 0.0, -1.0, 1.0)
            nx = jnp.where(has_vn, vnx * sgn, nx)
            ny = jnp.where(has_vn, vny * sgn, ny)
            nz = jnp.where(has_vn, vnz * sgn, nz)

            # tangent-space perturbation from map_Bump
            bump_base = _mat_const(scene, gb.mat,
                                   lambda k: scene.mat_bump_base[k])
            has_bump = bump_base >= 0
            b_h = _mat_const(scene, gb.mat, lambda k: scene.mat_bump_h[k])
            b_w = _mat_const(scene, gb.mat, lambda k: scene.mat_bump_w[k])
            br, bg_, bb_ = sample_packed_texture(
                scene.tex_packed_bump, jnp.maximum(bump_base, 0),
                b_h, b_w, tex_u, tex_v, interpret=interpret)
            ntx, nty, ntz = 2.0 * br - 1.0, 2.0 * bg_ - 1.0, 2.0 * bb_ - 1.0
            frame_ok = gb.tx ** 2 + gb.ty ** 2 + gb.tz ** 2 > 1e-12
            px_ = ntx * gb.tx + nty * gb.bx + ntz * nx
            py_ = ntx * gb.ty + nty * gb.by + ntz * ny
            pz_ = ntx * gb.tz + nty * gb.bz + ntz * nz
            plen = jnp.sqrt(px_ ** 2 + py_ ** 2 + pz_ ** 2)
            use = has_bump & frame_ok & (plen > 1e-12)
            plen_s = jnp.where(plen > 1e-12, plen, 1.0)
            nx = jnp.where(use, px_ / plen_s, nx)
            ny = jnp.where(use, py_ / plen_s, ny)
            nz = jnp.where(use, pz_ / plen_s, nz)

        # per-pixel light dir can vary by material (reference quirk:
        # per-kernel light dirs) — resolve via M-way select
        lightx = _mat_const(scene, gb.mat, lambda k: scene.mat_light[k, 0])
        lighty = _mat_const(scene, gb.mat, lambda k: scene.mat_light[k, 1])
        lightz = _mat_const(scene, gb.mat, lambda k: scene.mat_light[k, 2])
        lam, spec = blinn_phong_planar(nx, ny, nz, dx, dy, dz,
                                       (lightx, lighty, lightz))

        amb_r = _mat_const(scene, gb.mat, lambda k: scene.mat_ambient[k, 0])
        amb_g = _mat_const(scene, gb.mat, lambda k: scene.mat_ambient[k, 1])
        amb_b = _mat_const(scene, gb.mat, lambda k: scene.mat_ambient[k, 2])
        spc_r = _mat_const(scene, gb.mat, lambda k: scene.mat_specular[k, 0])
        spc_g = _mat_const(scene, gb.mat, lambda k: scene.mat_specular[k, 1])
        spc_b = _mat_const(scene, gb.mat, lambda k: scene.mat_specular[k, 2])

        if mip and scene.mip_levels > 0:
            # trilinear minification (EXTENSION, off by default; the
            # reference forces mip 0 — compute.wgsl:225). Plain-XLA
            # shade: the mip path trades the fused texshade kernel for
            # two pyramid taps; parity path below is untouched.
            from .miptex import ray_cone_lod, sample_mip_trilinear

            row_w = shape[1] if tiled else width
            lod = ray_cone_lod(scene, gb, dx, dy, dz, row_w)
            tr_, tg_, tb_ = sample_mip_trilinear(
                scene, gb.mat, lod, tex_u, tex_v, interpret=interpret)
            pr = amb_r + tr_ * lam + spc_r * spec
            pg = amb_g + tg_ * lam + spc_g * spec
            pb = amb_b + tb_ * lam + spc_b * spec
        else:
            taps, fxw, fyw = gather_packed_taps(scene.tex_packed, tex_base,
                                                hw_h, hw_w, tex_u, tex_v)
            pr, pg, pb = _texshade_pallas(taps, fxw, fyw, lam, spec,
                                          amb_r, amb_g, amb_b,
                                          spc_r, spc_g, spc_b,
                                          interpret=interpret)
        extra = None
        if shadows:
            extra = [amb_r, amb_g, amb_b, gb.t, nx, ny, nz,
                     lightx, lighty, lightz,
                     (lam > 0.0) | (spec > 0.0)]
        state, write = composite(state, pr, pg, pb, gb.t, hit, extra)
        if shadows:
            covered = covered | write

    cr, cg, cb, depth = state[:4]

    # --- single deferred shadow pass for the visible surface ---
    if shadows:
        (w_ar, w_ag, w_ab, w_t, w_nx, w_ny, w_nz,
         w_lx, w_ly, w_lz, w_rel) = state[4:]
        ll = jnp.sqrt(w_lx * w_lx + w_ly * w_ly + w_lz * w_lz)
        ll = jnp.where(ll > 0, ll, 1.0)
        # trace only pixels whose shading the occlusion bit can change
        # (see w_rel above — backlit surfaces render as pure ambient
        # either way, so parking them is bit-identical and drops the
        # terrain scene's self-shadowed backslopes from the wavefront)
        relevant = covered & w_rel
        # park the rest: far origin + zero direction lets the tile cull
        # mask drop whole (tile, cluster) steps. (Named PARK, not far —
        # `far` is this function's clip-plane parameter.)
        park = 1e9
        sdx = jnp.where(relevant, -w_lx / ll, 0.0)
        sdy = jnp.where(relevant, -w_ly / ll, 0.0)
        sdz = jnp.where(relevant, -w_lz / ll, 0.0)
        ts = jnp.where(relevant, w_t, 0.0)
        px = jnp.where(relevant, origin[0] + dx * ts + w_nx * 1e-3, park)
        py = jnp.where(relevant, origin[1] + dy * ts + w_ny * 1e-3, park)
        pz = jnp.where(relevant, origin[2] + dz * ts + w_nz * 1e-3, park)
        if emit_shadow_planes:
            # everything the gp merge + second-stage occlusion needs,
            # still in planar tiled order (present_planar finishes)
            return dict(cr=cr, cg=cg, cb=cb, depth=depth,
                        w_ar=w_ar, w_ag=w_ag, w_ab=w_ab,
                        covered=covered, relevant=relevant,
                        px=px, py=py, pz=pz,
                        sdx=sdx, sdy=sdy, sdz=sdz)
        occ = jnp.zeros((r,), bool)
        if has_mesh:
            # big scenes: re-tile the shadow wavefront by origin
            # locality (see anyhit_reordered_pallas)
            ah = (anyhit_reordered_pallas
                  if _should_stream(scene.padded_faces, BLOCK_F)
                  else anyhit_pallas)
            occ = ah(scene, px, py, pz, sdx, sdy, sdz, relevant,
                     interpret=interpret, accel=accel)
        occ = occ | _spheres_occlude_planar(scene, px, py, pz, sdx, sdy, sdz)
        shadowed = covered & occ
        cr = jnp.where(shadowed, w_ar, cr)
        cg = jnp.where(shadowed, w_ag, cg)
        cb = jnp.where(shadowed, w_ab, cb)

    return present_planar(cr, cg, cb, depth, width=width, height=height,
                          shape=shape, quantize=quantize)


def _spheres_occlude_planar(scene, px, py, pz, dx, dy, dz, t_min=1e-3):
    occ = jnp.zeros(px.shape, bool)
    for i in range(scene.num_spheres):
        cx, cy, cz = (scene.sphere_center[i, 0], scene.sphere_center[i, 1],
                      scene.sphere_center[i, 2])
        radius = scene.sphere_radius[i]
        ocx, ocy, ocz = px - cx, py - cy, pz - cz
        a = dx * dx + dy * dy + dz * dz
        b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
        c = (ocx * ocx + ocy * ocy + ocz * ocz) - radius * radius
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b - sq) / (2.0 * a)
        t2 = (-b + sq) / (2.0 * a)
        t = jnp.where(t1 >= 0.0, t1, jnp.where(t2 >= 0.0, t2, F32_INF))
        t = jnp.where(disc < 0.0, F32_INF, t)
        occ = occ | ((t >= t_min) & jnp.isfinite(t))
    return occ


# ---------------------------------------------------------------------------
# Compatibility wrappers (tests / oracle-parity API)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("tile_r", "block_f", "interpret"))
def intersect_tris_pallas(scene: SceneData, origin, dirs, *,
                          tile_r: int = TILE_R, block_f: int = BLOCK_F,
                          interpret: bool = False) -> TriHit:
    """Drop-in for ops.intersect.intersect_tris backed by the G-buffer
    kernel. dirs: (..., 3)."""
    shape = dirs.shape[:-1]
    d2 = dirs.reshape(-1, 3)
    gb = gbuffer_pallas(scene, origin, d2[:, 0], d2[:, 1], d2[:, 2],
                        tile_r=tile_r, block_f=block_f, interpret=interpret)
    return TriHit(t=gb.t.reshape(shape), face=gb.face.reshape(shape),
                  u=gb.u.reshape(shape), v=gb.v.reshape(shape),
                  n_dot_d=gb.nd.reshape(shape))


@functools.partial(jax.jit, static_argnames=("tile_r", "block_f", "interpret"))
def occluded_tris_pallas(scene: SceneData, origins, dirs, t_min=1e-3, *,
                         tile_r: int = TILE_R, block_f: int = BLOCK_F,
                         interpret: bool = False):
    """Drop-in for ops.intersect.occluded_tris (t_min fixed at 1e-3)."""
    del t_min  # kernel uses the shadow epsilon 1e-3
    shape = dirs.shape[:-1]
    d2 = dirs.reshape(-1, 3)
    o2 = jnp.broadcast_to(origins, dirs.shape).reshape(-1, 3)
    act = jnp.ones((d2.shape[0],), bool)
    occ = anyhit_pallas(scene, o2[:, 0], o2[:, 1], o2[:, 2],
                        d2[:, 0], d2[:, 1], d2[:, 2], act,
                        tile_r=tile_r, block_f=block_f, interpret=interpret)
    return occ.reshape(shape)
