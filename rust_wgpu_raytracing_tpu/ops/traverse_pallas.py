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
dense (8, 128) lane ops with zero gathers:

  for each superblock:            # fori_loop, AABB scalars from SMEM
      hit = slab(super AABB)      # one (8,128) vector test, all tiles
      if any lane hit:            # pl.when on a scalar reduction
          for 32 member clusters: # unrolled; skipped ENTIRELY when the
              word |= slab(...)   # super cone-test misses — this is the
                                  # lane-masked tree descent

Replaces the per-pixel brute-force loop of the reference
(/root/reference/src/models/triangle_list/compute.wgsl:186-202) at the
tile-cone level; the surviving clusters feed the same packed SMEM masks
as accel="cull"/"brute" (ops/megakernel.py:_mask_word_loop).

Conservativeness: the kernel multiplies by precomputed reciprocals where
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

# tiles per Pallas program: one (8, 128) vector register of lanes
TILES_PER_PROG = 1024
_TB_S, _TB_L = 8, 128

# SMEM budget for the AABB tables (supers + clusters, 6 f32 each).
# Mosaic SMEM is ~1 MB; leave headroom for the grid machinery.
SMEM_AABB_BUDGET = 600_000

# relative/absolute AABB widening that guarantees superset-of-flat-scan
# under reciprocal-multiply rounding (see module docstring)
_EPS_REL = 1e-5
_EPS_ABS = 1e-6


def hier_cull_fits(n_clusters: int) -> bool:
    """True when the cluster + superblock AABB tables fit the SMEM
    budget (~25k clusters = ~800k faces at 32-face clusters)."""
    b32 = -(-n_clusters // 32) * 32
    ns = b32 // 32
    return (b32 + ns) * 24 <= SMEM_AABB_BUDGET


def _widen(lo, hi):
    """Conservatively widen AABBs. Empty padding boxes (+inf, -inf)
    must pass through untouched: inf - inf = NaN, and one NaN cluster
    would poison its superblock's min/max union into never-hit."""
    wlo = jnp.where(jnp.isfinite(lo), lo - (_EPS_REL * jnp.abs(lo) + _EPS_ABS),
                    lo)
    whi = jnp.where(jnp.isfinite(hi), hi + (_EPS_REL * jnp.abs(hi) + _EPS_ABS),
                    hi)
    return wlo, whi


def _axis_interval(A, B, pre, k):
    """One slab axis: entry/exit t-interval of box gap [A, B] against
    the tile's direction bounds. Same math as traverse.slab_interval_ok
    with divisions replaced by precomputed reciprocal multiplies."""
    mixed, zero, pos, inv_dp, inv_dn = (pre["mixed"][k], pre["zero"][k],
                                        pre["pos"][k], pre["inv_dp"][k],
                                        pre["inv_dn"][k])
    lo_pos = jnp.where(A > 0.0, A * inv_dp, 0.0)
    hi_pos = jnp.where(B >= 0.0, B * inv_dn, -1.0)
    lo_neg = jnp.where(B < 0.0, B * inv_dn, 0.0)
    hi_neg = jnp.where(A <= 0.0, A * inv_dp, -1.0)
    lo_t = jnp.where(mixed, 0.0, jnp.where(pos, lo_pos, lo_neg))
    hi_t = jnp.where(mixed, F32_INF, jnp.where(pos, hi_pos, hi_neg))
    hi_t = jnp.where(zero & ~((A <= 0.0) & (B >= 0.0)), -1.0, hi_t)
    return lo_t, hi_t


def _box_test(box6, pre):
    """Slab test of one scalar AABB against all (8,128) tile cones.
    box6 = (lox, loy, loz, hix, hiy, hiz) scalars."""
    ok = None
    lo_t = jnp.zeros((_TB_S, _TB_L), jnp.float32)
    hi_t = jnp.full((_TB_S, _TB_L), F32_INF, jnp.float32)
    for k in range(3):
        A = box6[k] - pre["omax"][k]
        B = box6[3 + k] - pre["omin"][k]
        axis_ok = B >= A
        ok = axis_ok if ok is None else (ok & axis_ok)
        l, h = _axis_interval(A, B, pre, k)
        lo_t = jnp.maximum(lo_t, l)
        hi_t = jnp.minimum(hi_t, h)
    return ok & (hi_t >= 0.0) & (hi_t >= lo_t)


def _make_hier_kernel(n_super: int, nwords: int):
    def kernel(sup_ref, clus_ref, bounds_ref, out_ref):
        # per-tile loop invariants: bounds rows are omin(3) omax(3)
        # dmin(3) dmax(3); reciprocals + branch predicates hoisted out
        # of the 16k-cluster loop nest.
        omin = [bounds_ref[0, k] for k in range(3)]
        omax = [bounds_ref[0, 3 + k] for k in range(3)]
        dmin = [bounds_ref[0, 6 + k] for k in range(3)]
        dmax = [bounds_ref[0, 9 + k] for k in range(3)]
        pre = {"omin": omin, "omax": omax,
               "mixed": [], "zero": [], "pos": [],
               "inv_dp": [], "inv_dn": []}
        for k in range(3):
            dn, dp = dmin[k], dmax[k]
            pre["mixed"].append((dn <= 0.0) & (dp >= 0.0))
            pre["zero"].append((dn == 0.0) & (dp == 0.0))
            pre["pos"].append(dn > 0.0)
            dp_s = jnp.where(jnp.abs(dp) > 1e-30, dp, 1e-30)
            dn_s = jnp.where(jnp.abs(dn) > 1e-30, dn, 1e-30)
            pre["inv_dp"].append(1.0 / dp_s)
            pre["inv_dn"].append(1.0 / dn_s)

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
                    0, 32, bit_step,
                    jnp.zeros((_TB_S, _TB_L), jnp.int32))

            return carry

        jax.lax.fori_loop(0, n_super, super_step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("nwords", "interpret"))
def hier_cull_words(blk_lo, blk_hi, omin, omax, dmin, dmax, *,
                    nwords: int, interpret: bool = False):
    """Packed per-(tile, cluster) activity words via the 2-level LBVH
    cut traversal (module docstring). blk_lo/hi: (B, 3) cluster AABBs in
    LBVH leaf (Morton) order; omin..dmax: (T, 3) tile cone bounds
    (ops/traverse.py:tile_ray_bounds). Returns (T, nwords) i32 — a
    conservative superset of tile_cull_mask's packing, same word layout.
    """
    t_cnt = omin.shape[0]
    b = blk_lo.shape[0]
    b32 = nwords * 32
    n_super = nwords

    lo, hi = _widen(blk_lo.astype(jnp.float32), blk_hi.astype(jnp.float32))
    if b32 > b:  # pad with empty boxes: never hit, bits stay 0
        pad_lo = jnp.full((b32 - b, 3), F32_INF, jnp.float32)
        pad_hi = jnp.full((b32 - b, 3), -F32_INF, jnp.float32)
        lo = jnp.concatenate([lo, pad_lo])
        hi = jnp.concatenate([hi, pad_hi])
    sup_lo = jnp.min(lo.reshape(n_super, 32, 3), axis=1)
    sup_hi = jnp.max(hi.reshape(n_super, 32, 3), axis=1)
    # flattened 1-D SMEM tables (2-D scalar arrays pad the last dim to
    # 128 lanes — ops/megakernel.py:_pack_mask_bits learned this)
    clus_flat = jnp.concatenate([lo, hi], axis=1).reshape(-1)
    sup_flat = jnp.concatenate([sup_lo, sup_hi], axis=1).reshape(-1)

    # tile bounds -> (G, 16, 8, 128): 12 data rows + 4 pad rows, tiles
    # padded with cones that can never hit (origin +inf, direction 0)
    g = -(-t_cnt // TILES_PER_PROG)
    t_pad = g * TILES_PER_PROG
    rows = [omin[:, 0], omin[:, 1], omin[:, 2],
            omax[:, 0], omax[:, 1], omax[:, 2],
            dmin[:, 0], dmin[:, 1], dmin[:, 2],
            dmax[:, 0], dmax[:, 1], dmax[:, 2]]
    padded = []
    for i, r_ in enumerate(rows):
        fill = F32_INF if i < 6 else 0.0
        padded.append(jnp.concatenate(
            [r_, jnp.full((t_pad - t_cnt,), fill, jnp.float32)])
            if t_pad > t_cnt else r_)
    bounds = jnp.stack(padded + [jnp.zeros((t_pad,), jnp.float32)] * 4)
    bounds = bounds.reshape(16, g, _TB_S, _TB_L).transpose(1, 0, 2, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # super + cluster AABB tables ride SMEM
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 16, _TB_S, _TB_L),
                         lambda i, s0, s1: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nwords, _TB_S, _TB_L),
                               lambda i, s0, s1: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _make_hier_kernel(n_super, nwords),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g * nwords, _TB_S, _TB_L),
                                       jnp.int32),
        interpret=interpret,
    )(sup_flat, clus_flat, bounds)

    words = out.reshape(g, nwords, _TB_S, _TB_L).transpose(0, 2, 3, 1)
    return words.reshape(t_pad, nwords)[:t_cnt]
