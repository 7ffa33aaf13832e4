"""Tile-cone acceleration-mask construction: brute / flat cull / LBVH walk.

The reference brute-forces every face per pixel
(/root/reference/src/models/triangle_list/compute.wgsl:186-202). Here the
per-frame culling decision — which 32-face Morton clusters each 1024-ray
tile must intersect — is produced by one of three interchangeable
strategies, all emitting the SAME packed bitmask the Pallas kernels
consume (one i32 word = 32 clusters = one 1024-face superblock):

- ``brute``: all bits set — honest reference-parity brute force.
- ``cull``:  flat interval slab test of every (tile, cluster) pair
  (O(T*B), fused XLA elementwise + reduce). Wins for small B.
- ``bvh``:   STACKLESS, LANE-PARALLEL LBVH TRAVERSAL (BASELINE north
  star). The Karras radix tree over cluster leaves (ops/bvh.py) is
  DFS-linearized with skip pointers; every ray tile walks it in lockstep
  as planar (T,) vectors inside one lax.while_loop — `hit -> first
  child`, `miss -> skip pointer`. The pointer advances strictly
  monotonically, so each tile visits each node at most once and the
  loop exits as soon as EVERY tile is done: coherent tiles touch
  O(active log B) nodes instead of B, which is where the win over the
  flat scan comes from at large B. Divergence costs masked lanes, not
  serialization — the VPU analogue of warp-synchronous traversal.

All three masks are conservative supersets of the true hit set and the
kernels visit clusters in ascending order under every strategy, so the
rendered image is bit-identical across brute/cull/bvh (tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F32_INF = float("inf")


def slab_interval_ok(a, b, dn, dp):
    """Conservative ray-interval vs AABB slab test.

    a = box_lo - origin_max, b = box_hi - origin_min, dn/dp = per-axis
    direction min/max; all (..., 3). Returns (...,) bool: True if some
    t >= 0 can reach the box for SOME ray in the interval bounds.
    Exact same math as ops/bvh.py:tile_cull_mask_np (NumPy reference).
    """
    ok, _ = slab_interval_entry(a, b, dn, dp)
    return ok


def slab_interval_entry(a, b, dn, dp):
    """slab_interval_ok plus the conservative ENTRY-t lower bound.

    Returns (ok (...,) bool, t0 (...,) f32): t0 <= the true entry
    parameter of EVERY ray in the interval family that reaches the box
    (clamped to >= 0); +inf where the box is unreachable. The streaming
    kernels' front-to-back early termination keys on this — a word
    whose t0 exceeds every ray's current best (or root exit) cannot
    change any result (see _stream_word_loop)."""
    mixed = (dn <= 0.0) & (dp >= 0.0)
    zero = (dn == 0.0) & (dp == 0.0)  # parked rays (direction == 0)
    pos = dn > 0.0
    dp_s = jnp.where(jnp.abs(dp) > 1e-30, dp, 1e-30)
    dn_s = jnp.where(jnp.abs(dn) > 1e-30, dn, 1e-30)

    lo_pos = jnp.where(a > 0.0, a / dp_s, 0.0)
    hi_pos = jnp.where(b >= 0.0, b / dn_s, -1.0)
    lo_neg = jnp.where(b < 0.0, b / dn_s, 0.0)
    hi_neg = jnp.where(a <= 0.0, a / dp_s, -1.0)

    lo_t = jnp.where(mixed, 0.0, jnp.where(pos, lo_pos, lo_neg))
    hi_t = jnp.where(mixed, F32_INF, jnp.where(pos, hi_pos, hi_neg))
    hi_t = jnp.where(zero & ~((a <= 0.0) & (b >= 0.0)), -1.0, hi_t)

    box_ok = jnp.all(b >= a, axis=-1)
    t0 = jnp.max(lo_t, axis=-1)
    t1 = jnp.min(hi_t, axis=-1)
    ok = box_ok & (t1 >= 0.0) & (t1 >= t0)
    # deflate by ~100 f32 division ulps so rounding can never lift the
    # bound above a true entry (exactness of the early-exit skip)
    t0_lb = jnp.maximum(t0, 0.0) * (1.0 - 1e-5) - 1e-6
    return ok, jnp.where(ok, t0_lb, F32_INF)


def ray_root_exit(lo, hi, ox, oy, oz, dx, dy, dz):
    """Per-ray conservative UPPER bound of the exit parameter from the
    scene root AABB [lo, hi] ((3,) each); -1.0 for rays that miss the
    root entirely (they can hit nothing — every face lies inside the
    root, so any true hit satisfies t <= exit). Inflated by ~100 ulps
    against division rounding. ox.. may be scalars (shared origin)."""
    t0 = jnp.zeros_like(dx)
    t1 = jnp.full_like(dx, F32_INF)
    for a, (o, d) in enumerate(((ox, dx), (oy, dy), (oz, dz))):
        d_safe = jnp.where(d == 0.0, 1.0, d)
        ta = (lo[a] - o) / d_safe
        tb = (hi[a] - o) / d_safe
        tn = jnp.minimum(ta, tb)
        tf = jnp.maximum(ta, tb)
        inside = (o >= lo[a]) & (o <= hi[a])
        tn = jnp.where(d == 0.0,
                       jnp.where(inside, 0.0, F32_INF), tn)
        tf = jnp.where(d == 0.0,
                       jnp.where(inside, F32_INF, -F32_INF), tf)
        t0 = jnp.maximum(t0, tn)
        t1 = jnp.minimum(t1, tf)
    hit = t1 >= t0
    return jnp.where(hit, t1 * (1.0 + 1e-5) + 1e-6, -1.0)


def _tile_minmax(x, tile_r, act=None):
    t = x.reshape(-1, tile_r)
    if act is None:
        return jnp.min(t, axis=1), jnp.max(t, axis=1)
    a = act.reshape(-1, tile_r)
    return (jnp.min(jnp.where(a, t, F32_INF), axis=1),
            jnp.max(jnp.where(a, t, -F32_INF), axis=1))


def tile_ray_bounds(ox, oy, oz, dx, dy, dz, tile_r, act=None):
    """Componentwise per-tile origin/direction interval bounds.

    ox/oy/oz may be scalars (shared-origin primary rays) or padded (R,)
    planes (per-ray shadow/bounce origins). Returns (omin, omax, dmin,
    dmax), each (T, 3) f32.

    act (optional, (R,) bool): rays to include in the bounds. Parked
    rays (sentinel origins, zero directions) otherwise POISON their
    tile: one tile mixing real and parked rays gets a direction
    interval containing zero, which the conservative slab test must
    treat as unbounded-t — the tile admits the ENTIRE scene (measured:
    the one real/parked boundary tile of a sorted shadow wavefront
    carried 16,321 of a mean 55 clusters). With act, mixed tiles bound
    only their live rays, and fully-parked tiles produce an empty
    (+inf, -inf) interval that culls everything. Conservative for
    every ray the kernel may report on: inactive lanes never write.
    """
    def bounds(v):
        if jnp.ndim(v) == 0:
            n = dx.shape[0] // tile_r
            b = jnp.broadcast_to(v, (n,))
            return b, b
        return _tile_minmax(v, tile_r, act)

    oxm, oxM = bounds(ox)
    oym, oyM = bounds(oy)
    ozm, ozM = bounds(oz)
    dxm, dxM = _tile_minmax(dx, tile_r, act)
    dym, dyM = _tile_minmax(dy, tile_r, act)
    dzm, dzM = _tile_minmax(dz, tile_r, act)
    omin = jnp.stack([oxm, oym, ozm], axis=1)
    omax = jnp.stack([oxM, oyM, ozM], axis=1)
    dmin = jnp.stack([dxm, dym, dzm], axis=1)
    dmax = jnp.stack([dxM, dyM, dzM], axis=1)
    return omin, omax, dmin, dmax


def perray_super_any(slo, shi, ox, oy, oz, dx, dy, dz, tile_r: int,
                     act=None, chunk: int = 64):
    """(T, S) bool EXACT per-ray union superblock admission: tile t
    admits superblock s iff SOME live ray of the tile has a forward
    line (t >= 0) intersecting s's AABB.

    The interval cull (tile_ray_bounds + slab_interval_ok) bounds a
    tile by its origin box x direction box; for BOUNCE wavefronts the
    (origin-Morton, octant)-sorted direction spread still spans a
    90-degree cone, and the measured gap is 7.6x — the interval mask
    admits 2,136 clusters/tile where the per-ray union admits 283
    (tools/prof_bounce_mask.py, config 8 bounce-1 wavefront). This
    test is per-RAY, so direction spread costs nothing. O(R x S)
    compute, chunked over superblocks to bound temporaries; at word
    granularity (S = F/1024) that is ~0.27 G tests for the 522k-face
    PT config — a few ms of VPU time that gates hundreds of ms of
    streamed fetches + visits.

    Conservative margins: the comparison inflates the exit/deflates the
    entry by ~100 ulps relative so f32 division rounding can never
    cull a truly-hit box (same discipline as slab_interval_entry /
    ray_root_exit). Parked rays (zero direction, far origin)
    self-cull — axis d == 0 with origin outside the slab yields an
    empty interval — but PADDING lanes (origin 0 inside a box) do
    not, so act must mark live rays whenever padding exists."""
    r = dx.shape[0]
    n_tiles = r // tile_r
    s = slo.shape[0]
    cols = []
    for c0 in range(0, s, chunk):
        c1 = min(s, c0 + chunk)
        lo = slo[c0:c1]  # (C, 3)
        hi = shi[c0:c1]
        tn = jnp.zeros((r, c1 - c0), jnp.float32)
        tf = jnp.full((r, c1 - c0), F32_INF, jnp.float32)
        for a, (o, d) in enumerate(((ox, dx), (oy, dy), (oz, dz))):
            o_ = o[:, None]
            d_ = d[:, None]
            d_safe = jnp.where(d_ == 0.0, 1.0, d_)
            ta = (lo[None, :, a] - o_) / d_safe
            tb = (hi[None, :, a] - o_) / d_safe
            na = jnp.minimum(ta, tb)
            fa = jnp.maximum(ta, tb)
            inside = (o_ >= lo[None, :, a]) & (o_ <= hi[None, :, a])
            na = jnp.where(d_ == 0.0,
                           jnp.where(inside, 0.0, F32_INF), na)
            fa = jnp.where(d_ == 0.0,
                           jnp.where(inside, F32_INF, -F32_INF), fa)
            tn = jnp.maximum(tn, na)
            tf = jnp.minimum(tf, fa)
        # Sign-aware anti-cull inflation (~100 ulp + additive floor):
        # tf * (1+1e-5) would shrink a NEGATIVE far-exit instead of
        # inflating it, turning the safety margin pro-cull there.
        ok = (tf + jnp.abs(tf) * 1e-5 + 1e-6) >= (tn * (1.0 - 1e-5) - 1e-6)
        if act is not None:
            ok = ok & act[:, None]
        cols.append(jnp.any(ok.reshape(n_tiles, tile_r, c1 - c0),
                            axis=1))
    return jnp.concatenate(cols, axis=1)


def perray_boxes_any(lo, hi, ox, oy, oz, dx, dy, dz, tile_r: int,
                     act=None, chunk: int = 128):
    """(T, C) bool EXACT per-ray union admission against PER-TILE box
    sets: tile t admits box c iff SOME live ray of tile t has a
    forward line (t >= 0) intersecting AABB (lo[t, c], hi[t, c]).

    The per-tile-boxes sibling of perray_super_any: there every tile
    tests the SAME global superblock table; here each tile tests its
    own gathered set (the 32 cluster AABBs of its top-K admitted mask
    words — see megakernel._refine_topk_words). lo/hi are (T, C, 3).
    Same conservative sign-aware margins; same parked/padding
    semantics (zero-direction rays self-cull, but PADDING lanes need
    act). Empty/neutralized boxes (lo=+inf, hi=-inf, the _super_aabbs
    padding convention) always fail the slab test."""
    r = dx.shape[0]
    n_tiles = r // tile_r
    c = lo.shape[1]
    o3 = [a.reshape(n_tiles, tile_r, 1) for a in (ox, oy, oz)]
    d3 = [a.reshape(n_tiles, tile_r, 1) for a in (dx, dy, dz)]
    act3 = None if act is None else act.reshape(n_tiles, tile_r, 1)
    cols = []
    for c0 in range(0, c, chunk):
        c1 = min(c, c0 + chunk)
        tn = jnp.zeros((n_tiles, tile_r, c1 - c0), jnp.float32)
        tf = jnp.full((n_tiles, tile_r, c1 - c0), F32_INF, jnp.float32)
        for a in range(3):
            lo_a = lo[:, None, c0:c1, a].reshape(n_tiles, 1, c1 - c0)
            hi_a = hi[:, None, c0:c1, a].reshape(n_tiles, 1, c1 - c0)
            o_, d_ = o3[a], d3[a]
            d_safe = jnp.where(d_ == 0.0, 1.0, d_)
            ta = (lo_a - o_) / d_safe
            tb = (hi_a - o_) / d_safe
            na = jnp.minimum(ta, tb)
            fa = jnp.maximum(ta, tb)
            inside = (o_ >= lo_a) & (o_ <= hi_a)
            na = jnp.where(d_ == 0.0,
                           jnp.where(inside, 0.0, F32_INF), na)
            fa = jnp.where(d_ == 0.0,
                           jnp.where(inside, F32_INF, -F32_INF), fa)
            tn = jnp.maximum(tn, na)
            tf = jnp.minimum(tf, fa)
        ok = (tf + jnp.abs(tf) * 1e-5 + 1e-6) >= (tn * (1.0 - 1e-5) - 1e-6)
        if act3 is not None:
            ok = ok & act3
        cols.append(jnp.any(ok, axis=1))
    return jnp.concatenate(cols, axis=1)


def bvh_walk_mask_words(bvh_pack, n_nodes: int, omin, omax, dmin, dmax,
                        nwords: int):
    """Stackless skip-pointer LBVH walk -> packed cluster mask words.

    bvh_pack: (9, M) f32 DFS node pack (ops/bvh.py:linearize_bvh).
    Tile bounds (T,3) from tile_ray_bounds. Returns (T, nwords) i32,
    bit c%32 of word c//32 set iff cluster c's leaf AABB passed the
    tile's cone test. Runs entirely inside the frame jit as ONE
    while_loop over lockstep (T,)-planar steps; terminates in at most M
    iterations (pointers strictly increase) and early-exits when all
    tiles finish.
    """
    t_cnt = omin.shape[0]
    rows = jnp.arange(t_cnt)

    def cond(carry):
        ptr, _ = carry
        return jnp.any(ptr < n_nodes)

    def body(carry):
        ptr, words = carry
        active = ptr < n_nodes
        safe = jnp.minimum(ptr, n_nodes - 1)
        rec = bvh_pack[:, safe]  # ONE gather: (9, T)
        lo = rec[0:3].T  # (T,3)
        hi = rec[3:6].T
        a = lo - omax
        b = hi - omin
        hit = slab_interval_ok(a, b, dmin, dmax) & active

        leaf = rec[8] >= 0.0
        set_bit = hit & leaf
        cl = rec[8].astype(jnp.int32)
        word_idx = jnp.where(set_bit, cl >> 5, nwords)  # nwords -> dropped
        bit = jnp.where(set_bit, jnp.int32(1) << (cl & 31), 0)
        # each leaf is visited at most once per tile, so bits never
        # collide and add == bitwise-or
        words = words.at[rows, word_idx].add(bit, mode="drop")

        nxt = jnp.where(hit, rec[6], rec[7]).astype(jnp.int32)
        ptr = jnp.where(active, nxt, ptr)
        return ptr, words

    words0 = jnp.zeros((t_cnt, nwords), jnp.int32)
    ptr0 = jnp.zeros((t_cnt,), jnp.int32)
    _, words = jax.lax.while_loop(cond, body, (ptr0, words0))
    return words
