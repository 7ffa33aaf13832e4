"""In-kernel LBVH traversal: hierarchical tile-cone culling in Pallas.

Round-1 VERDICT: the stackless skip-pointer walk (ops/traverse.py) is
correct but runs as an XLA `while_loop` whose per-node step is one tiny
(9, T) gather — at 522k faces the walk costs ~270 ms/frame against the
flat scan's 7.3 ms, entirely in per-iteration dispatch overhead. A deep
binary-tree walk is the wrong SHAPE for a TPU: the VPU wants a few large
dense steps, not tens of thousands of dependent small ones.

This module is the TPU-native traversal. The LBVH (Karras radix tree,
ops/bvh.py) orders its leaves in Morton/DFS order, so a fixed-depth CUT
of the tree — 32-face clusters grouped 32-per-superblock, exactly the
packed-mask granularity the render kernels already consume — forms a
2-level, 32-wide bounding volume hierarchy. That wide-and-shallow tree
is what GPUs reach for too (8-wide CWBVH); on the VPU it traverses as
dense vector ops with zero gathers.

Kernel shape (measured on a v5e at 1080p / 522k faces, where the flat
XLA scan costs 8-9 ms): 1024 tiles on (8, 128) lanes per program, AABB
tables as SMEM scalars, superblock cone test then lane-masked
32-cluster descent under pl.when — 6.3 ms. The 1 MB SMEM bounds the
tables to ~800k faces; past that _mask_words falls back to the flat
scan, which measurement (not ideology) says is the right tool there: a
tiles-on-sublanes VMEM-table variant (phase-1 superblock sweep into a
scratch + predicated per-128-cluster-chunk descent, word packing via
two HIGHEST-precision (8,128)@(128,4) matmuls) was built and
benchmarked at 11.3 ms (522k) / 27.6 ms (2M) against the flat scan's
9 / 13.5 ms — per-chunk control overhead on the VPU outweighs the
skipped slab tests at these occupancies (git history has the kernel).

Replaces the per-pixel brute-force loop of the reference
(/root/reference/src/models/triangle_list/compute.wgsl:186-202) at the
tile-cone level; the surviving clusters feed the same packed SMEM masks
as accel="cull"/"brute" (ops/megakernel.py:_mask_word_loop).

Conservativeness: the kernels multiply by precomputed reciprocals where
the XLA flat scan divides, so borderline boxes could round differently.
AABBs are therefore widened by a relative epsilon before entering the
kernel — the mask is a strict SUPERSET of the flat-scan mask, and the
rendered image stays bit-identical across accel modes (the kernels merge
clusters in ascending order under every strategy; tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32_INF = float("inf")

# SMEM kernel: tiles per Pallas program, one (8, 128) vector of lanes
SMEM_TILES_PER_PROG = 1024
# SMEM budget for its AABB tables (supers + clusters, 6 f32 each):
# ~25k clusters = ~800k faces
SMEM_AABB_BUDGET = 600_000

# relative/absolute AABB widening that guarantees superset-of-flat-scan
# under reciprocal-multiply rounding (see module docstring)
_EPS_REL = 1e-5
_EPS_ABS = 1e-6


def _smem_fits(n_clusters: int) -> bool:
    b32 = -(-n_clusters // 32) * 32
    return (b32 + b32 // 32) * 24 <= SMEM_AABB_BUDGET


def hier_cull_fits(n_clusters: int) -> bool:
    """True when the traversal kernel can hold the AABB tables in SMEM
    (~800k faces at 32-face clusters). Beyond that the flat XLA scan is
    the right tool: measured at 2M faces / 1080p on a v5e, the fused
    flat sweep costs 13.5 ms while every in-kernel descent variant we
    tried paid more in per-chunk control overhead than the skipped slab
    tests were worth (occupancy is ~0.2-0.5%% but per-(tile,chunk)
    bookkeeping is not free on the VPU)."""
    return _smem_fits(n_clusters)


def _widen(lo, hi, omag):
    """Conservatively widen AABBs. The margin must dominate the
    reciprocal-multiply rounding of the slab terms A = box - origin
    bound, whose magnitude scales with |box| + |origin| — NOT |box|
    alone (a unit mesh viewed from distance 1000 has |A| ~ 1000, and a
    |box|-relative margin would be ~100x too small to absorb ~2-ulp
    error). omag: scalar upper bound on |origin| over all tiles.
    _EPS_REL = 1e-5 leaves ~80x slack over f32 ulp. Empty padding boxes
    (+inf, -inf) pass through untouched: inf - inf = NaN, and one NaN
    cluster would poison its superblock's min/max union into never-hit.
    """
    m_lo = _EPS_REL * (jnp.abs(lo) + omag) + _EPS_ABS
    m_hi = _EPS_REL * (jnp.abs(hi) + omag) + _EPS_ABS
    wlo = jnp.where(jnp.isfinite(lo), lo - m_lo, lo)
    whi = jnp.where(jnp.isfinite(hi), hi + m_hi, hi)
    return wlo, whi


def _dir_pre(pre, dmin_cols, dmax_cols):
    """Append the slab test's direction-dependent loop invariants
    (branch predicates + reciprocals) to a pre dict holding origin
    bounds. Columns are per-axis arrays of any broadcast-compatible
    shape ((8,128) planes for the SMEM kernel, (8,1) for VMEM)."""
    pre.update({"mixed": [], "zero": [], "pos": [],
                "inv_dp": [], "inv_dn": []})
    for k in range(3):
        dn, dp = dmin_cols[k], dmax_cols[k]
        pre["mixed"].append((dn <= 0.0) & (dp >= 0.0))
        pre["zero"].append((dn == 0.0) & (dp == 0.0))
        pre["pos"].append(dn > 0.0)
        dp_s = jnp.where(jnp.abs(dp) > 1e-30, dp, 1e-30)
        dn_s = jnp.where(jnp.abs(dn) > 1e-30, dn, 1e-30)
        pre["inv_dp"].append(1.0 / dp_s)
        pre["inv_dn"].append(1.0 / dn_s)
    return pre


def _box_test(box, pre):
    """Slab-test AABBs against tile cones; broadcasting carries the
    layout. box = 6 per-axis SMEM scalar entries (lox loy loz hix hiy
    hiz); pre entries are (8, 128) tile planes. Same math as
    traverse.slab_interval_ok with divisions replaced by the
    precomputed reciprocals."""
    ok = None
    lo_t, hi_t = 0.0, F32_INF
    for k in range(3):
        A = box[k] - pre["omax"][k]
        B = box[3 + k] - pre["omin"][k]
        axis_ok = B >= A
        ok = axis_ok if ok is None else (ok & axis_ok)
        mixed, zero, pos = pre["mixed"][k], pre["zero"][k], pre["pos"][k]
        inv_dp, inv_dn = pre["inv_dp"][k], pre["inv_dn"][k]
        lo_pos = jnp.where(A > 0.0, A * inv_dp, 0.0)
        hi_pos = jnp.where(B >= 0.0, B * inv_dn, -1.0)
        lo_neg = jnp.where(B < 0.0, B * inv_dn, 0.0)
        hi_neg = jnp.where(A <= 0.0, A * inv_dp, -1.0)
        l = jnp.where(mixed, 0.0, jnp.where(pos, lo_pos, lo_neg))
        h = jnp.where(mixed, F32_INF, jnp.where(pos, hi_pos, hi_neg))
        h = jnp.where(zero & ~((A <= 0.0) & (B >= 0.0)), -1.0, h)
        lo_t = jnp.maximum(lo_t, l)
        hi_t = jnp.minimum(hi_t, h)
    return ok & (hi_t >= 0.0) & (hi_t >= lo_t)


def _pad_boxes(lo, hi, n_pad):
    """Append never-hit empty boxes."""
    return (jnp.concatenate([lo, jnp.full((n_pad, 3), F32_INF,
                                          jnp.float32)]),
            jnp.concatenate([hi, jnp.full((n_pad, 3), -F32_INF,
                                          jnp.float32)]))


# --------------------------------------------------------------------
# SMEM kernel: 1024 tiles on lanes, AABB tables as SMEM scalars
# --------------------------------------------------------------------

def _make_smem_kernel(n_super: int, nwords: int):
    def kernel(sup_ref, clus_ref, bounds_ref, out_ref):
        # bounds rows: omin(3) omax(3) dmin(3) dmax(3), (8,128) planes
        pre = {"omin": [bounds_ref[0, k] for k in range(3)],
               "omax": [bounds_ref[0, 3 + k] for k in range(3)]}
        _dir_pre(pre, [bounds_ref[0, 6 + k] for k in range(3)],
                 [bounds_ref[0, 9 + k] for k in range(3)])

        out_ref[:] = jnp.zeros_like(out_ref)

        def super_step(s, carry):
            sbox = [sup_ref[s * 6 + k] for k in range(6)]
            shit = _box_test(sbox, pre)

            # descend only where some tile's cone enters the superblock
            @pl.when(jnp.any(shit))
            def _():
                def bit_step(c, word):
                    base = (s * 32 + c) * 6
                    cbox = [clus_ref[base + k] for k in range(6)]
                    # cluster AABB ⊆ super AABB and the slab test is
                    # monotone in the box, so no extra (& shit) needed
                    chit = _box_test(cbox, pre)
                    return word | (chit.astype(jnp.int32) << c)

                out_ref[s] = jax.lax.fori_loop(
                    0, 32, bit_step, jnp.zeros((8, 128), jnp.int32))

            return carry

        jax.lax.fori_loop(0, n_super, super_step, 0)

    return kernel


def _smem_cull_words(lo, hi, omin, omax, dmin, dmax, nwords: int,
                     interpret: bool):
    t_cnt = omin.shape[0]
    b = lo.shape[0]
    b32 = nwords * 32
    n_super = nwords
    if b32 > b:
        lo, hi = _pad_boxes(lo, hi, b32 - b)
    sup_lo = jnp.min(lo.reshape(n_super, 32, 3), axis=1)
    sup_hi = jnp.max(hi.reshape(n_super, 32, 3), axis=1)
    # flattened 1-D SMEM tables (2-D scalar arrays pad the last dim to
    # 128 lanes — ops/megakernel.py:_pack_mask_bits learned this)
    clus_flat = jnp.concatenate([lo, hi], axis=1).reshape(-1)
    sup_flat = jnp.concatenate([sup_lo, sup_hi], axis=1).reshape(-1)

    # tile bounds -> (G, 16, 8, 128): 12 data rows + 4 pad rows, tiles
    # padded with cones that can never hit (origin +inf, direction 0)
    g = -(-t_cnt // SMEM_TILES_PER_PROG)
    t_pad = g * SMEM_TILES_PER_PROG
    rows = [omin[:, k] for k in range(3)] + [omax[:, k] for k in range(3)] \
        + [dmin[:, k] for k in range(3)] + [dmax[:, k] for k in range(3)]
    padded = []
    for i, r_ in enumerate(rows):
        fill = F32_INF if i < 6 else 0.0
        padded.append(jnp.concatenate(
            [r_, jnp.full((t_pad - t_cnt,), fill, jnp.float32)])
            if t_pad > t_cnt else r_)
    bounds = jnp.stack(padded + [jnp.zeros((t_pad,), jnp.float32)] * 4)
    bounds = bounds.reshape(16, g, 8, 128).transpose(1, 0, 2, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # super + cluster AABB tables ride SMEM
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 16, 8, 128),
                         lambda i, s0, s1: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nwords, 8, 128),
                               lambda i, s0, s1: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _make_smem_kernel(n_super, nwords),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g * nwords, 8, 128), jnp.int32),
        interpret=interpret,
    )(sup_flat, clus_flat, bounds)

    words = out.reshape(g, nwords, 8, 128).transpose(0, 2, 3, 1)
    return words.reshape(t_pad, nwords)[:t_cnt]


@functools.partial(jax.jit, static_argnames=("nwords", "interpret"))
def hier_cull_words(blk_lo, blk_hi, omin, omax, dmin, dmax, *,
                    nwords: int, interpret: bool = False):
    """Packed per-(tile, cluster) activity words via the 2-level LBVH
    cut traversal (module docstring). blk_lo/hi: (B, 3) cluster AABBs in
    LBVH leaf (Morton) order; omin..dmax: (T, 3) tile cone bounds
    (ops/traverse.py:tile_ray_bounds). Returns (T, nwords) i32 — a
    conservative superset of tile_cull_mask's packing, same word layout.

    Callers gate on hier_cull_fits (the SMEM table budget).
    """
    omin = omin.astype(jnp.float32)
    omax = omax.astype(jnp.float32)
    # scale-aware widening: bound |origin| over live tiles (empty-tile
    # sentinels are +/-inf; exclude them or the margin itself goes inf)
    fin_lo = jnp.where(jnp.isfinite(omin), jnp.abs(omin), 0.0)
    fin_hi = jnp.where(jnp.isfinite(omax), jnp.abs(omax), 0.0)
    omag = jnp.maximum(jnp.max(fin_lo), jnp.max(fin_hi))
    lo, hi = _widen(blk_lo.astype(jnp.float32), blk_hi.astype(jnp.float32),
                    omag)
    args = (lo, hi, omin, omax,
            dmin.astype(jnp.float32), dmax.astype(jnp.float32))
    return _smem_cull_words(*args, nwords, interpret)
