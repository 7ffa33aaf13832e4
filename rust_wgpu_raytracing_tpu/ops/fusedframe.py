"""Single-kernel frame for small (all-VMEM) scenes.

The default frame path (ops/megakernel.render_megakernel) runs sphere
passes + compositing + shadow-ray construction as XLA glue around three
Pallas kernels (closest-hit, texture-shade, any-hit). At reference
scale (111 faces, 1080p) that glue is a measured ~7 ms of the ~19 ms
frame: every stage round-trips ~10-26 planar (R,) arrays through HBM
and the shadow wavefront pays a second host-side mask/schedule build.

This module fuses the whole geometric frame into ONE Pallas kernel per
ray tile — the true megakernel the reference's pass DAG
(src/lib.rs:1012-1230) wants to be on a TPU:

  raygen (XLA, planar)  ->  [KERNEL: primary closest-hit sweep
  (front-to-back, exact early termination) + analytic sphere passes +
  reference-order depth compositing + winner shadow-ray construction +
  in-kernel cluster-culled any-hit + sphere occlusion]  ->  one texture
  gather + texshade (XLA+Pallas, unchanged)  ->  final select/quantize.

Only 8 planar outputs leave the kernel (depth, winner kind, occlusion,
uv, material, lambert, specular) instead of the ~26 planes the split
path materializes, and the shadow any-hit needs no host-side schedule:
the kernel bounds its freshly built shadow wavefront with vector
reductions and slab-tests the scene's cluster AABBs (SMEM table) with
scalar math — cheap at small-scene cluster counts.

Semantics are the reference's exactly (same pass order, same nonlinear
depth compare, same per-material/per-sphere light quirks, same
winner-only deferred shadow rule as render_megakernel); parity is
gated against the oracle to the standing <=1-u8 bar, and all accel
modes remain bit-identical (the lexicographic closest-hit merge is
visit-order independent).

MEASURED OUTCOME, two rounds (TPU v5e, 1080p dense suzanne + shadows):
 - round 3 (pre-(t,face) sweep redesign): fused LOST, 21.9 vs 18.0 ms
   — the in-kernel shadow cluster loop's per-cluster scalar sync
   (vector->scalar bound reduction + ~40 scalar slab ops x nb x 2040
   tiles) outweighed the split path's XLA glue. Split stayed default.
 - round 4 (post-redesign, grouped bound refresh below): fused WINS
   decisively, 16.6 vs 57.1 ms uncalibrated n=20 (15.1 vs 55.2 in
   BENCH_r04.json) — the redesigned sweep made the kernel fast and the
   split program's post-sweep XLA attribute gathers (~17 ms) + glue
   (~28 ms) now dominate it on real silicon, invisible to
   interpret-mode timing. render_megakernel's fused=None default
   therefore picks THIS kernel whenever the scene is eligible:
   mesh present, face pack VMEM-resident (<= STREAM_FACES),
   no mip, no gp staging (normal mapping: fused since round 5).
 - round 5: the in-kernel shadow loop itself was the next bottleneck —
   its per-cluster scalar slab admission scales O(nb x tiles) and cost
   ~23 ms of the combined scene's (80 clusters) 32 ms frame. The
   'sched' shadow mode (shadow_sched in _make_frame_kernel) emits the
   winner wavefront and traces it with the split path's scheduled
   any-hit kernel instead: dense 1080p 17.4 -> 13.6 ms, combined
   32.0 -> 10.3 ms, bit-identical (tested). sched is now the shadow
   default. Normal mapping also joined the fused frame this round
   (512p nm 10.0 -> 2.4 ms, 1080p nm 74.0 -> 8.9 ms vs split).
The split path remains fully supported (fused=False /
RenderConfig.variant='split') — it is the only program for
streamed/oversize scenes and gp shadow staging, and doubles as the
independent whole-frame implementation that must (and does) reproduce
this kernel bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.scene import SceneData
from ..core.camera import CameraUniforms
from .intersect import K_EPSILON
from .megakernel import (FPACK_COLS, TILE_R, _ah_block, _ch_block,
                         _mask_words, _mat_const, _ordered_cluster_loop,
                         _pad1, _row1, _vmem_sched, _pick_tile_shape,
                         _spheres_occlude_planar, _texshade_pallas,
                         anyhit_pallas, blinn_phong_planar,
                         gather_packed_taps, pack_face_columns,
                         pack_origin_cols, raygen_planar,
                         raygen_planar_tiled, sample_packed_texture,
                         tiled_to_image)

F32_INF = float("inf")

# const-vector layout (one flat SMEM f32 array per frame)
_C_ORIGIN = 0  # 0-2 camera origin
_C_ROOT = 3  # 3-5 root AABB lo, 6-8 hi (in-kernel shadow exit cap)
_C_SPH = 9  # per sphere: cx cy cz r, colr colg colb, c0 c1 c2, lx ly lz
_SPH_STRIDE = 13
_MAT_STRIDE = 3  # per material: light dir x y z


def _sphere_quadratic(cx, cy, cz, rad, ox, oy, oz, dx, dy, dz, t_min):
    """Shared sphere intersect (sphere/compute.wgsl:63-85 semantics):
    returns t with +inf misses; roots below t_min rejected."""
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    a = dx * dx + dy * dy + dz * dz
    b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
    c = (ocx * ocx + ocy * ocy + ocz * ocz) - rad * rad
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_s = jnp.where(jnp.abs(a) > 1e-20, a, 1.0)
    t1 = (-b - sq) / (2.0 * a_s)
    t2 = (-b + sq) / (2.0 * a_s)
    t = jnp.where(t1 >= t_min, t1, jnp.where(t2 >= t_min, t2, F32_INF))
    return jnp.where((disc < 0.0) | (jnp.abs(a) <= 1e-20), F32_INF, t)


def _pow32(x):
    """x**32 by five squarings — the multiply chain XLA's constant-
    integer pow lowers to, so oracle parity holds to the usual bar."""
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    x16 = x8 * x8
    return x16 * x16


def _blinn(nx, ny, nz, dx, dy, dz, lx, ly, lz):
    """Planar Blinn-Phong factors with a runtime light vector (scalars
    or planes); same math as megakernel.blinn_phong_planar."""
    ll = jnp.sqrt(lx * lx + ly * ly + lz * lz)
    ll = jnp.where(ll > 0, ll, 1.0)
    ulx, uly, ulz = lx / ll, ly / ll, lz / ll
    lam = jnp.maximum(0.0, -(nx * ulx + ny * uly + nz * ulz))
    hx, hy, hz = -ulx - dx, -uly - dy, -ulz - dz
    hl = jnp.sqrt(hx * hx + hy * hy + hz * hz)
    hl = jnp.where(hl > 0, hl, 1.0)
    hdotn = jnp.maximum(0.0, (hx * nx + hy * ny + hz * nz) / hl)
    return lam, _pow32(hdotn)


class _Vec:
    """Value adapter for _ah_block's act_ref parameter."""

    def __init__(self, v):
        self._v = v

    def __getitem__(self, _):
        return self._v


def _nld(t, near, far):
    """to_nonlinear_depth, inline (static near/far)."""
    return ((1.0 / t) - (1.0 / near)) / ((1.0 / far) - (1.0 / near))


def _make_frame_kernel(ns: int, nmat: int, nb: int, block_f: int,
                       near: float, far: float, shadows: bool,
                       nm: bool = False, shadow_sched: bool = False):
    """The fused frame kernel. Grid = ray tiles; everything between
    raygen and the texture gather happens here (module docstring).

    nm=True (normal mapping, round 5) additionally merges the winner's
    interpolated vertex normal + tangent frame out of the sweep (the
    gpack rows already carry them — megakernel cols _C_VN/_C_TAN) and
    emits the flipped geometric normal, 12 extra planes total; the
    bump gather + TBN perturbation + Blinn live in the XLA tail (the
    packed bump pool is an XLA-side texture, exactly as the split
    path's, megakernel.py 'if normal_mapping' block). nm excludes
    shadows: the reference-accurate shadow relevance gate and origin
    offset need the PERTURBED normal, which needs the bump sample —
    nm+shadows stays on the split program."""
    sph0 = _C_SPH
    mat0 = _C_SPH + _SPH_STRIDE * ns
    blk0 = mat0 + _MAT_STRIDE * nmat  # cluster AABBs: nb x 6
    shord0 = blk0 + 6 * nb  # shadow-loop cluster order (nb f32 ids)

    def kernel(tlb_ref, order_ref, const_ref, dx_ref, dy_ref, dz_ref,
               texit_ref, fpack_ref, oterm_ref, dc_ref, *refs):
        if nm:
            (depth_ref, kind_ref, occ_ref, uvx_ref, uvy_ref, mat_ref,
             lam_ref, spec_ref, nxo_ref, nyo_ref, nzo_ref,
             vnx_ref, vny_ref, vnz_ref, tx_ref, ty_ref, tz_ref,
             bx_ref, by_ref, bz_ref) = refs[:20]
            scr = refs[20:]
            nm_refs = (vnx_ref, vny_ref, vnz_ref, tx_ref, ty_ref,
                       tz_ref, bx_ref, by_ref, bz_ref)
        elif shadow_sched:
            (depth_ref, kind_ref, occ_ref, uvx_ref, uvy_ref, mat_ref,
             lam_ref, spec_ref, wt_ref, wnx_ref, wny_ref, wnz_ref,
             wlx_ref, wly_ref, wlz_ref, wrel_ref) = refs[:16]
            scr = refs[16:]
            nm_refs = ()
        else:
            (depth_ref, kind_ref, occ_ref, uvx_ref, uvy_ref, mat_ref,
             lam_ref, spec_ref) = refs[:8]
            scr = refs[8:]
            nm_refs = ()
        t_s, face_s, u_s, v_s, nd_s, nx_s, ny_s, nz_s = scr
        dx = _row1(dx_ref)
        dy = _row1(dy_ref)
        dz = _row1(dz_ref)

        # ---- primary mesh closest-hit (front-to-back, early stop) ----
        t_s[:] = jnp.full_like(t_s, F32_INF)
        for r_ in (face_s,):
            r_[:] = jnp.zeros_like(r_)
        for r_ in (u_s, v_s, nd_s, nx_s, ny_s, nz_s,
                   uvx_ref, uvy_ref, mat_ref) + nm_refs:
            r_[:] = jnp.zeros_like(r_)

        def visit(jj):
            base = pl.multiple_of(jj * block_f, block_f)
            g = fpack_ref[pl.ds(base, block_f), :]
            o = oterm_ref[pl.ds(base, block_f), :]
            _ch_block(g, o, dx, dy, dz, jj * block_f,
                      t_s, face_s, u_s, v_s, nd_s,
                      uvx_ref, uvy_ref, nx_s, ny_s, nz_s, mat_ref,
                      nm_refs)

        def bound():
            return jnp.max(jnp.minimum(t_s[:], texit_ref[:]))

        _ordered_cluster_loop(tlb_ref, order_ref, nb, visit, bound)

        # uvy was written pre-V-flip by _ch_block via uvx/uvy refs —
        # NOTE: _ch_block writes uvx/uvy into (uvx_ref, uvy_ref) slots
        # passed above; the V-flip happens in the XLA texture stage.
        dxr = dx.reshape(-1)
        dyr = dy.reshape(-1)
        dzr = dz.reshape(-1)
        ox = const_ref[_C_ORIGIN]
        oy = const_ref[_C_ORIGIN + 1]
        oz = const_ref[_C_ORIGIN + 2]

        # ---- mesh shading factors ----
        tm = t_s[:]
        hit_m = tm < F32_INF
        flip = nd_s[:] > 0.0
        mnx = jnp.where(flip, -nx_s[:], nx_s[:])
        mny = jnp.where(flip, -ny_s[:], ny_s[:])
        mnz = jnp.where(flip, -nz_s[:], nz_s[:])
        matp = mat_ref[:]
        # per-material light dir (reference quirk) via M-way select
        mlx = jnp.full_like(tm, const_ref[mat0])
        mly = jnp.full_like(tm, const_ref[mat0 + 1])
        mlz = jnp.full_like(tm, const_ref[mat0 + 2])
        for k in range(1, nmat):
            sel = matp == float(k)
            mlx = jnp.where(sel, const_ref[mat0 + _MAT_STRIDE * k], mlx)
            mly = jnp.where(sel, const_ref[mat0 + _MAT_STRIDE * k + 1],
                            mly)
            mlz = jnp.where(sel, const_ref[mat0 + _MAT_STRIDE * k + 2],
                            mlz)
        if nm:
            # the tail recomputes mesh Blinn from the PERTURBED normal
            # (bump sample lives there); emit the flipped geometric
            # normal it falls back to and skip the in-kernel Blinn
            nxo_ref[:] = mnx
            nyo_ref[:] = mny
            nzo_ref[:] = mnz
            m_lam = jnp.zeros_like(tm)
            m_spec = jnp.zeros_like(tm)
        else:
            m_lam, m_spec = _blinn(mnx, mny, mnz, dxr, dyr, dzr,
                                   mlx, mly, mlz)

        # ---- composite (reference pass order: spheres, then mesh) ----
        depth_v = jnp.ones_like(tm)
        kind_v = jnp.zeros_like(tm)
        win_t = jnp.zeros_like(tm)
        win_nx = jnp.zeros_like(tm)
        win_ny = jnp.zeros_like(tm)
        win_nz = jnp.zeros_like(tm)
        win_lx = jnp.zeros_like(tm)
        win_ly = jnp.zeros_like(tm)
        win_lz = jnp.ones_like(tm)
        win_lam = jnp.zeros_like(tm)
        win_spec = jnp.zeros_like(tm)
        # f32 0/1, not bool: Mosaic cannot lower a select whose VALUE
        # operands are i1 vectors ("unsupported target bitwidth")
        win_rel = jnp.zeros_like(tm)

        for s in range(ns):
            o_ = sph0 + _SPH_STRIDE * s
            cx, cy, cz = (const_ref[o_], const_ref[o_ + 1],
                          const_ref[o_ + 2])
            rad = const_ref[o_ + 3]
            slx, sly, slz = (const_ref[o_ + 10], const_ref[o_ + 11],
                             const_ref[o_ + 12])
            t = _sphere_quadratic(cx, cy, cz, rad, ox, oy, oz,
                                  dxr, dyr, dzr, 0.0)
            hit = t < F32_INF
            ts = jnp.where(hit, t, 0.0)
            pxs = ox + dxr * ts - cx
            pys = oy + dyr * ts - cy
            pzs = oz + dzr * ts - cz
            l = jnp.sqrt(pxs * pxs + pys * pys + pzs * pzs)
            l = jnp.where(l > 0, l, 1.0)
            snx, sny, snz = pxs / l, pys / l, pzs / l
            lam, spec = _blinn(snx, sny, snz, dxr, dyr, dzr,
                               slx, sly, slz)
            d = _nld(jnp.where(hit, t, 1.0), near, far)
            w = hit & (d < depth_v)
            depth_v = jnp.where(w, d, depth_v)
            kind_v = jnp.where(w, float(s + 1), kind_v)
            win_t = jnp.where(w, t, win_t)
            win_nx = jnp.where(w, snx, win_nx)
            win_ny = jnp.where(w, sny, win_ny)
            win_nz = jnp.where(w, snz, win_nz)
            win_lx = jnp.where(w, slx, win_lx)
            win_ly = jnp.where(w, sly, win_ly)
            win_lz = jnp.where(w, slz, win_lz)
            win_lam = jnp.where(w, lam, win_lam)
            win_spec = jnp.where(w, spec, win_spec)
            win_rel = jnp.where(
                w, jnp.where((lam > 0.0) | (spec > 0.0), 1.0, 0.0),
                win_rel)

        d_m = _nld(jnp.where(hit_m, tm, 1.0), near, far)
        w = hit_m & (d_m < depth_v)
        depth_v = jnp.where(w, d_m, depth_v)
        kind_v = jnp.where(w, float(ns + 1), kind_v)
        win_t = jnp.where(w, tm, win_t)
        win_nx = jnp.where(w, mnx, win_nx)
        win_ny = jnp.where(w, mny, win_ny)
        win_nz = jnp.where(w, mnz, win_nz)
        win_lx = jnp.where(w, mlx, win_lx)
        win_ly = jnp.where(w, mly, win_ly)
        win_lz = jnp.where(w, mlz, win_lz)
        win_lam = jnp.where(w, m_lam, win_lam)
        win_spec = jnp.where(w, m_spec, win_spec)
        win_rel = jnp.where(
            w, jnp.where((m_lam > 0.0) | (m_spec > 0.0), 1.0, 0.0),
            win_rel)

        depth_ref[:] = depth_v
        kind_ref[:] = kind_v
        lam_ref[:] = win_lam
        spec_ref[:] = win_spec
        occ_ref[:] = jnp.zeros_like(depth_v)

        if not shadows:
            return

        if shadow_sched:
            # sched shadow mode (round 5): emit the winner wavefront
            # ingredients; the XLA tail builds the shadow rays with the
            # split path's exact formulas and the existing any-hit
            # kernel traces them over its VECTORIZED per-tile
            # entry-t schedule. Measured motivation: the in-kernel
            # cluster loop below is ~40 scalar slab ops x nb x tiles —
            # at 80 clusters (config 3) that is ~23 ms of the 32 ms
            # frame, while the split program's scheduled any-hit covers
            # the same rays in ~1 ms.
            wt_ref[:] = win_t
            wnx_ref[:] = win_nx
            wny_ref[:] = win_ny
            wnz_ref[:] = win_nz
            wlx_ref[:] = win_lx
            wly_ref[:] = win_ly
            wlz_ref[:] = win_lz
            wrel_ref[:] = win_rel
            return

        # ---- winner shadow wavefront, built and traced in-kernel ----
        rel = (kind_v > 0.0) & (win_rel > 0.0)
        ll = jnp.sqrt(win_lx * win_lx + win_ly * win_ly
                      + win_lz * win_lz)
        ll = jnp.where(ll > 0, ll, 1.0)
        park = 1e9
        sdx = jnp.where(rel, -win_lx / ll, 0.0)
        sdy = jnp.where(rel, -win_ly / ll, 0.0)
        sdz = jnp.where(rel, -win_lz / ll, 0.0)
        tw = jnp.where(rel, win_t, 0.0)
        px = jnp.where(rel, ox + dxr * tw + win_nx * 1e-3, park)
        py = jnp.where(rel, oy + dyr * tw + win_ny * 1e-3, park)
        pz = jnp.where(rel, oz + dzr * tw + win_nz * 1e-3, park)

        # sphere occlusion first (order-free OR; cheap) so cluster
        # visits can early-exit past already-shadowed rays
        occ = jnp.zeros_like(depth_v)
        for s in range(ns):
            o_ = sph0 + _SPH_STRIDE * s
            t = _sphere_quadratic(const_ref[o_], const_ref[o_ + 1],
                                  const_ref[o_ + 2], const_ref[o_ + 3],
                                  px, py, pz, sdx, sdy, sdz, 1e-3)
            occ = jnp.maximum(occ, jnp.where(t < F32_INF, 1.0, 0.0))
        occ_ref[:] = occ

        # conservative shadow-wavefront bounds (relevant rays only —
        # parked rays would blow the origin box to 1e9)
        def mm(x):
            return (jnp.min(jnp.where(rel, x, F32_INF)),
                    jnp.max(jnp.where(rel, x, -F32_INF)))

        oxm, oxM = mm(px)
        oym, oyM = mm(py)
        ozm, ozM = mm(pz)
        dxm, dxM = mm(sdx)
        dym, dyM = mm(sdy)
        dzm, dzM = mm(sdz)

        def slab_scalar(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z):
            """Scalar conservative interval-vs-AABB test (same math as
            traverse.slab_interval_entry, unrolled per axis). Returns
            (reachable?, entry-t lower bound)."""
            t0 = jnp.float32(0.0)
            t1 = jnp.float32(F32_INF)
            ok = jnp.bool_(True)
            for (lo, hi, om, oM, dm, dM) in (
                    (lo_x, hi_x, oxm, oxM, dxm, dxM),
                    (lo_y, hi_y, oym, oyM, dym, dyM),
                    (lo_z, hi_z, ozm, ozM, dzm, dzM)):
                a = lo - oM
                b = hi - om
                ok = jnp.logical_and(ok, b >= a)
                mixed = (dm <= 0.0) & (dM >= 0.0)
                zero = (dm == 0.0) & (dM == 0.0)
                pos = dm > 0.0
                dp_s = jnp.where(jnp.abs(dM) > 1e-30, dM, 1e-30)
                dn_s = jnp.where(jnp.abs(dm) > 1e-30, dm, 1e-30)
                lo_pos = jnp.where(a > 0.0, a / dp_s, 0.0)
                hi_pos = jnp.where(b >= 0.0, b / dn_s, -1.0)
                lo_neg = jnp.where(b < 0.0, b / dn_s, 0.0)
                hi_neg = jnp.where(a <= 0.0, a / dp_s, -1.0)
                lo_t = jnp.where(mixed, 0.0,
                                 jnp.where(pos, lo_pos, lo_neg))
                hi_t = jnp.where(mixed, F32_INF,
                                 jnp.where(pos, hi_pos, hi_neg))
                hi_t = jnp.where(zero & ~((a <= 0.0) & (b >= 0.0)),
                                 -1.0, hi_t)
                t0 = jnp.maximum(t0, lo_t)
                t1 = jnp.minimum(t1, hi_t)
            ok = ok & (t1 >= 0.0) & (t1 >= t0)
            return ok, jnp.maximum(t0, 0.0) * (1.0 - 1e-5) - 1e-6

        # per-ray scene-root exit cap along the shadow direction: any
        # real occluder is hit before the ray leaves the root box, so a
        # cluster entered after every live ray's exit cannot occlude
        # (same exactness rule as the streaming any-hit schedule)
        st0 = jnp.zeros_like(depth_v)
        st1 = jnp.full_like(depth_v, F32_INF)
        for ax, (op, dp_) in enumerate(((px, sdx), (py, sdy), (pz, sdz))):
            lo_a = const_ref[_C_ROOT + ax]
            hi_a = const_ref[_C_ROOT + 3 + ax]
            d_safe = jnp.where(dp_ == 0.0, 1.0, dp_)
            ta = (lo_a - op) / d_safe
            tb = (hi_a - op) / d_safe
            tn = jnp.minimum(ta, tb)
            tf = jnp.maximum(ta, tb)
            inside = (op >= lo_a) & (op <= hi_a)
            tn = jnp.where(dp_ == 0.0,
                           jnp.where(inside, 0.0, F32_INF), tn)
            tf = jnp.where(dp_ == 0.0,
                           jnp.where(inside, F32_INF, -F32_INF), tf)
            st0 = jnp.maximum(st0, tn)
            st1 = jnp.minimum(st1, tf)
        stexit = jnp.where(rel & (st1 >= st0),
                           st1 * (1.0 + 1e-5) + 1e-6, -1.0)

        relf = rel.astype(jnp.float32)
        act = _Vec(relf)
        r1 = lambda v: v.reshape(1, -1)

        # bound shrinks as rays occlude; -1 once a ray needs no more
        # testing -> doubles as the all-occluded early exit. The
        # cross-lane max is the expensive part (a vector->scalar sync
        # per evaluation; at 16 clusters x 2040 tiles it was the bulk
        # of the fused frame's measured 21.9-vs-18.0 ms shadow deficit)
        # so it is recomputed once per REFRESH-cluster GROUP and held
        # stale inside the group — a stale bound reflects an OLDER (no
        # more occluded) state, so it is >= the fresh bound and only
        # ADMITS extra clusters; _ah_block merges are idempotent
        # max-accumulates, so output is bit-identical (same staleness
        # argument as megakernel._ordered_cluster_loop's refresh).
        refresh = 4
        ngrp = -(-nb // refresh)

        def grp_step(gi, carry):
            need = jnp.where((relf > 0.0) & (occ_ref[:] < 1.0),
                             stexit, -1.0)
            bound = jnp.max(need)

            def cl_step(ci, carry2):
                seq = gi * refresh + ci
                # clamp the SMEM reads for the (skipped) tail clusters of
                # a ragged last group; the pl.when below gates the visit.
                # Clusters are visited in the STATIC near-to-far order
                # along the scene's light direction (host-sorted into
                # the const vector) so occluders are met — and the
                # shrinking bound prunes far clusters — as early as
                # possible; any order is bit-identical (occ is an OR,
                # and the bound argument is order-independent: a cluster
                # entered after every needy ray's root exit can never
                # occlude).
                c = const_ref[shord0 + jnp.minimum(seq, nb - 1)] \
                    .astype(jnp.int32)
                o_ = blk0 + 6 * c
                admit, t0c = slab_scalar(
                    const_ref[o_], const_ref[o_ + 1], const_ref[o_ + 2],
                    const_ref[o_ + 3], const_ref[o_ + 4],
                    const_ref[o_ + 5])

                @pl.when(jnp.logical_and(seq < nb,
                                         jnp.logical_and(admit,
                                                         t0c <= bound)))
                def _():
                    base = pl.multiple_of(c * block_f, block_f)
                    g = fpack_ref[pl.ds(base, block_f), :]
                    dcv = dc_ref[pl.ds(base, block_f), :]
                    _ah_block(g, dcv, r1(sdx), r1(sdy), r1(sdz),
                              r1(px), r1(py), r1(pz), act, occ_ref)
                return carry2

            jax.lax.fori_loop(0, refresh, cl_step, 0)
            return carry

        jax.lax.fori_loop(0, ngrp, grp_step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "near", "far", "background", "shadows", "quantize",
    "accel", "interpret", "total_height", "normal_mapping", "shadow_mode"))
def render_frame_fused(scene: SceneData, uni_flat, *, width: int,
                       height: int, near: float = 0.01, far: float = 100.0,
                       background=(0.0, 0.0, 0.0), shadows: bool = False,
                       quantize: bool = True, accel: str = "cull",
                       interpret: bool = False, row0=None,
                       total_height: Optional[int] = None,
                       normal_mapping: bool = False,
                       shadow_mode: str = "auto"):
    """One frame through the fused small-scene kernel (module
    docstring). Same signature contract as render_megakernel; callers
    dispatch on eligibility (normal_mapping excludes shadows here —
    see _make_frame_kernel).

    shadow_mode: 'inkernel' traces shadow rays inside the frame kernel
    (per-cluster scalar slab admission); 'sched' emits the winner
    wavefront and traces it with the scheduled any-hit kernel
    (megakernel.anyhit_pallas — vectorized XLA admission). Bit-identical
    (tested); 'auto' picks by measured crossover (see module
    docstring)."""
    assert not (normal_mapping and shadows), \
        "fused nm+shadows unsupported (perturbed-normal shadow gate)"
    uni = CameraUniforms.unflat(jnp.asarray(uni_flat, jnp.float32))
    origin = uni.origin
    th_total = total_height or height
    shape = _pick_tile_shape(width, height)
    if shape is not None and row0 is not None and shape[2] != height:
        shape = (8, 128, height) if height % 8 == 0 and \
            width % 128 == 0 else None
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

    f = scene.tri_p0.shape[0]
    nbc = scene.blk_lo.shape[0]
    block_f = f // nbc
    nb = nbc
    ns = scene.num_spheres
    nmat = scene.mat_ambient.shape[0]
    tile_r = TILE_R

    nrays = dx.shape[0]
    dxp = _pad1(dx, tile_r)
    dyp = _pad1(dy, tile_r)
    dzp = _pad1(dz, tile_r)
    r = dxp.shape[0]

    fpack = pack_face_columns(scene)
    oterm = pack_origin_cols(scene, origin)
    dc = jnp.concatenate(
        [scene.tri_d[:, None], scene.tri_c,
         jnp.zeros((f, 4), jnp.float32)], axis=1)

    mask, nwords = _mask_words(scene, accel, origin[0], origin[1],
                               origin[2], dxp, dyp, dzp, tile_r, block_f,
                               f, interpret)
    tlb, order, texit = _vmem_sched(scene, mask, nwords, origin[0],
                                    origin[1], origin[2], dxp, dyp, dzp,
                                    tile_r, f, block_f)

    # const vector (host-assembled; all scalars the kernel needs)
    finite = jnp.isfinite(scene.blk_lo) & jnp.isfinite(scene.blk_hi)
    blo = jnp.where(finite, scene.blk_lo, F32_INF)
    bhi = jnp.where(finite, scene.blk_hi, -F32_INF)
    root_lo = jnp.min(blo, axis=0)
    root_hi = jnp.max(bhi, axis=0)
    parts = [jnp.asarray(origin, jnp.float32).reshape(3),
             root_lo, root_hi]
    if ns:
        sph = jnp.concatenate(
            [scene.sphere_center, scene.sphere_radius[:, None],
             scene.sphere_color, scene.sphere_coeff, scene.sphere_light],
            axis=1)  # (S, 13)
        parts.append(sph.reshape(-1))
    parts.append(scene.mat_light.reshape(-1))
    parts.append(jnp.concatenate([blo, bhi], axis=1).reshape(-1))
    # static near-to-far cluster order for the in-kernel shadow loop:
    # shadow rays share one direction (toward mat-0's light), so
    # ascending AABB-center projection onto it is a per-scene visit
    # order that meets occluders early (order is perf-only; see kernel)
    ld = scene.mat_light[0]
    ln = jnp.sqrt(jnp.sum(ld * ld))
    sdir = -ld / jnp.where(ln > 0, ln, 1.0)
    proj = jnp.sum((blo + bhi) * 0.5 * sdir[None, :], axis=1)
    proj = jnp.where(jnp.isfinite(proj), proj, F32_INF)  # empty last
    parts.append(jnp.argsort(proj).astype(jnp.float32))
    const = jnp.concatenate(parts)

    grid = (r // tile_r,)
    sched_spec = pl.BlockSpec((1, 1, nb), lambda i: (i, 0, 0),
                              memory_space=pltpu.SMEM)
    const_spec = pl.BlockSpec((const.shape[0],), lambda i: (0,),
                              memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((tile_r,), lambda i: (i,),
                            memory_space=pltpu.VMEM)
    # shadow-mode default (measured on-chip, round 5, TPU v5e 1080p):
    # the scheduled any-hit beats the in-kernel scalar cluster loop at
    # EVERY cluster count — dense suzanne (16 clusters) 13.6 vs
    # 17.4 ms, combined cube+suzanne (80 clusters) 10.3 vs 32.0 ms —
    # because the per-(tile, cluster) admission is vectorized in XLA
    # instead of ~40 scalar slab ops per cluster per tile. 'inkernel'
    # remains selectable as the measured record + an independent
    # implementation (bit-identical, tested).
    use_sched = shadows and shadow_mode != "inkernel"
    n_out = 20 if normal_mapping else (16 if use_sched else 8)
    out_shape = [jax.ShapeDtypeStruct((r,), jnp.float32)
                 for _ in range(n_out)]
    scratch = [pltpu.VMEM((tile_r,), jnp.float32) for _ in range(7)]
    scratch.insert(1, pltpu.VMEM((tile_r,), jnp.int32))  # face ids

    outs = pl.pallas_call(
        _make_frame_kernel(ns, nmat, nb, block_f, near, far, shadows,
                           nm=normal_mapping, shadow_sched=use_sched),
        grid=grid,
        in_specs=[
            sched_spec, sched_spec, const_spec,
            ray_spec, ray_spec, ray_spec, ray_spec,
            pl.BlockSpec((f, FPACK_COLS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[ray_spec] * n_out,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(tlb, order, const, dxp, dyp, dzp, texit, fpack, oterm, dc)

    outs = [o[:nrays] for o in outs]
    depth, kind, occ, uvx, uvy, mat, lam, spec = outs[:8]

    # ---- XLA tail: one texture gather + final select ----
    bg = jnp.asarray(background, jnp.float32)
    tex_base = _mat_const(scene, mat, lambda k: scene.mat_tex_base[k])
    hw_h = _mat_const(scene, mat, lambda k: scene.mat_tex_h[k])
    hw_w = _mat_const(scene, mat, lambda k: scene.mat_tex_w[k])
    amb_r = _mat_const(scene, mat, lambda k: scene.mat_ambient[k, 0])
    amb_g = _mat_const(scene, mat, lambda k: scene.mat_ambient[k, 1])
    amb_b = _mat_const(scene, mat, lambda k: scene.mat_ambient[k, 2])
    spc_r = _mat_const(scene, mat, lambda k: scene.mat_specular[k, 0])
    spc_g = _mat_const(scene, mat, lambda k: scene.mat_specular[k, 1])
    spc_b = _mat_const(scene, mat, lambda k: scene.mat_specular[k, 2])

    lam_mesh, spec_mesh = lam, spec
    if normal_mapping:
        # mirror the split program's nm block float-for-float
        # (megakernel.py 'if normal_mapping': vertex-normal smoothing,
        # sign alignment, map_Bump TBN perturbation, Blinn re-derive)
        (nxg, nyg, nzg, vnxp, vnyp, vnzp,
         txp, typ, tzp, bxp, byp, bzp) = outs[8:20]
        nx, ny, nz = nxg, nyg, nzg
        vl2 = vnxp ** 2 + vnyp ** 2 + vnzp ** 2
        has_vn = vl2 > 1e-12
        inv = 1.0 / jnp.sqrt(jnp.where(has_vn, vl2, 1.0))
        vnx, vny, vnz = vnxp * inv, vnyp * inv, vnzp * inv
        sgn = jnp.where(vnx * nx + vny * ny + vnz * nz < 0.0, -1.0, 1.0)
        nx = jnp.where(has_vn, vnx * sgn, nx)
        ny = jnp.where(has_vn, vny * sgn, ny)
        nz = jnp.where(has_vn, vnz * sgn, nz)

        bump_base = _mat_const(scene, mat,
                               lambda k: scene.mat_bump_base[k])
        has_bump = bump_base >= 0
        b_h = _mat_const(scene, mat, lambda k: scene.mat_bump_h[k])
        b_w = _mat_const(scene, mat, lambda k: scene.mat_bump_w[k])
        br, bg_, bb_ = sample_packed_texture(
            scene.tex_packed_bump, jnp.maximum(bump_base, 0),
            b_h, b_w, uvx, 1.0 - uvy, interpret=interpret)
        ntx, nty, ntz = 2.0 * br - 1.0, 2.0 * bg_ - 1.0, 2.0 * bb_ - 1.0
        frame_ok = txp ** 2 + typ ** 2 + tzp ** 2 > 1e-12
        px_ = ntx * txp + nty * bxp + ntz * nx
        py_ = ntx * typ + nty * byp + ntz * ny
        pz_ = ntx * tzp + nty * bzp + ntz * nz
        plen = jnp.sqrt(px_ ** 2 + py_ ** 2 + pz_ ** 2)
        use = has_bump & frame_ok & (plen > 1e-12)
        plen_s = jnp.where(plen > 1e-12, plen, 1.0)
        nx = jnp.where(use, px_ / plen_s, nx)
        ny = jnp.where(use, py_ / plen_s, ny)
        nz = jnp.where(use, pz_ / plen_s, nz)

        lightx = _mat_const(scene, mat, lambda k: scene.mat_light[k, 0])
        lighty = _mat_const(scene, mat, lambda k: scene.mat_light[k, 1])
        lightz = _mat_const(scene, mat, lambda k: scene.mat_light[k, 2])
        lam_mesh, spec_mesh = blinn_phong_planar(
            nx, ny, nz, dx, dy, dz, (lightx, lighty, lightz))

    taps, fxw, fyw = gather_packed_taps(scene.tex_packed, tex_base,
                                        hw_h, hw_w, uvx, 1.0 - uvy)
    mr, mg, mb = _texshade_pallas(taps, fxw, fyw, lam_mesh, spec_mesh,
                                  amb_r, amb_g, amb_b,
                                  spc_r, spc_g, spc_b,
                                  interpret=interpret)

    if use_sched:
        # scheduled shadow trace: the split path's exact wavefront
        # formulas (megakernel.py shadow tail) + its any-hit kernel
        w_t, w_nx, w_ny, w_nz, w_lx, w_ly, w_lz, w_rel = outs[8:16]
        covered = kind > 0.0
        relevant = covered & (w_rel > 0.0)
        ll = jnp.sqrt(w_lx * w_lx + w_ly * w_ly + w_lz * w_lz)
        ll = jnp.where(ll > 0, ll, 1.0)
        park = 1e9
        sdx = jnp.where(relevant, -w_lx / ll, 0.0)
        sdy = jnp.where(relevant, -w_ly / ll, 0.0)
        sdz = jnp.where(relevant, -w_lz / ll, 0.0)
        ts = jnp.where(relevant, w_t, 0.0)
        px = jnp.where(relevant, origin[0] + dx * ts + w_nx * 1e-3, park)
        py = jnp.where(relevant, origin[1] + dy * ts + w_ny * 1e-3, park)
        pz = jnp.where(relevant, origin[2] + dz * ts + w_nz * 1e-3, park)
        occ_b = anyhit_pallas(scene, px, py, pz, sdx, sdy, sdz, relevant,
                              interpret=interpret, accel=accel)
        occ_b = occ_b | _spheres_occlude_planar(scene, px, py, pz,
                                                sdx, sdy, sdz)
        occ = occ_b.astype(jnp.float32)

    cr = jnp.full((nrays,), bg[0])
    cg = jnp.full((nrays,), bg[1])
    cb = jnp.full((nrays,), bg[2])
    shadowed = (kind > 0.0) & (occ > 0.0)
    for s in range(ns):
        sel = kind == float(s + 1)
        col = scene.sphere_color[s]
        co = scene.sphere_coeff[s]
        shade = co[0] + co[1] * lam
        pr = col[0] * shade + co[2] * spec
        pg = col[1] * shade + co[2] * spec
        pb = col[2] * shade + co[2] * spec
        cr = jnp.where(sel, jnp.where(shadowed, col[0] * co[0], pr), cr)
        cg = jnp.where(sel, jnp.where(shadowed, col[1] * co[0], pg), cg)
        cb = jnp.where(sel, jnp.where(shadowed, col[2] * co[0], pb), cb)
    mesh_sel = kind == float(ns + 1)
    cr = jnp.where(mesh_sel, jnp.where(shadowed, amb_r, mr), cr)
    cg = jnp.where(mesh_sel, jnp.where(shadowed, amb_g, mg), cg)
    cb = jnp.where(mesh_sel, jnp.where(shadowed, amb_b, mb), cb)

    if quantize:
        # the shared explicit-reciprocal quantize — bitwise-identical
        # across every frame program (see shade.quantize_rgba8)
        from .shade import quantize_rgba8

        cr = quantize_rgba8(cr)
        cg = quantize_rgba8(cg)
        cb = quantize_rgba8(cb)

    if tiled:
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
