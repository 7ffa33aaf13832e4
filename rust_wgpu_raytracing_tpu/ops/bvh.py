"""Acceleration structures: Morton ordering, face clusters, LBVH.

The reference brute-forces every face per pixel
(triangle_list/compute.wgsl:190-202). The TPU-native acceleration design
is two-level and lane-friendly (BASELINE "LBVH + stackless, lane-masked
traversal" north star, re-thought for VPU lockstep execution):

1. **Morton-ordered face clusters** (leaves): faces are sorted by the
   Morton code of their centroid and grouped into fixed-size clusters
   (= the intersection kernel's face block). Clusters are spatially
   compact, so their AABBs are tight.
2. **Tile-coherent culling**: primary rays are evaluated in tiles of
   TILE_R contiguous pixels whose direction (and, for shadow rays,
   origin) component-wise intervals form a conservative bounding cone.
   An interval-arithmetic slab test against every cluster AABB yields a
   (tiles x clusters) activity mask; the Pallas kernel skips masked-off
   (tile, cluster) grid steps entirely. This is the lockstep analogue of
   per-ray BVH traversal: divergence is resolved per TILE (one
   predicate), not per lane — exactly what the VPU wants. The test is
   CONSERVATIVE, so culled rendering is bit-identical to brute force.
3. **LBVH (binary radix tree, Karras 2012)** over the cluster leaves,
   for large scenes where testing all cluster AABBs per tile would
   dominate: the tile cone walks the tree instead of scanning leaves.
   Built host-side at scene build (and refittable per frame for
   animation, BASELINE config 5).

All build steps are NumPy (host) — they run once per scene (or per
refit) on tiny arrays; the hot per-frame work stays in Pallas/XLA.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np


def expand_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 10 bits of each value to every third bit."""
    v = v.astype(np.uint32)
    v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
    v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
    v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
    v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
    return v


def morton3d(points: np.ndarray) -> np.ndarray:
    """30-bit Morton codes for points normalized into the unit cube."""
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    ext = np.maximum(hi - lo, 1e-12)
    q = np.clip(((points - lo) / ext) * 1023.0, 0, 1023).astype(np.uint32)
    return (expand_bits(q[:, 0]) << 2) | (expand_bits(q[:, 1]) << 1) | \
        expand_bits(q[:, 2])


def morton_order(p0: np.ndarray, p1: np.ndarray, p2: np.ndarray) -> np.ndarray:
    """Face permutation sorting by centroid Morton code (stable, so ties
    keep original buffer order)."""
    centroids = (p0 + p1 + p2) / 3.0
    codes = morton3d(centroids)
    return np.argsort(codes, kind="stable")


def cluster_aabbs(p0, p1, p2, cluster: int,
                  num_real: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-cluster AABBs over Morton-ordered (padded) faces.

    p0/p1/p2: (F,3) PADDED face corners (padding rows arbitrary).
    Padding-only clusters get an inverted AABB (+inf lo, -inf hi) so
    every cull test fails and the kernel never visits them. Fully
    vectorized — runs in milliseconds at 500k+ faces.
    """
    f = p0.shape[0]
    assert f % cluster == 0
    nb = f // cluster
    valid = (np.arange(f) < num_real)[:, None]
    flo = np.where(valid, np.minimum(np.minimum(p0, p1), p2), np.inf)
    fhi = np.where(valid, np.maximum(np.maximum(p0, p1), p2), -np.inf)
    lo = flo.reshape(nb, cluster, 3).min(axis=1).astype(np.float32)
    hi = fhi.reshape(nb, cluster, 3).max(axis=1).astype(np.float32)
    return lo, hi


# ---------------------------------------------------------------------------
# LBVH: binary radix tree over cluster leaves (Karras 2012)
# ---------------------------------------------------------------------------


@dataclass
class LBVH:
    """Binary radix tree. n leaves, n-1 internal nodes.

    Node ids: internal 0..n-2, leaves n-1..2n-2 (leaf i = node n-1+i).
    """

    left: np.ndarray  # (n-1,) i32 child node id
    right: np.ndarray  # (n-1,) i32
    parent: np.ndarray  # (2n-1,) i32, -1 for root
    node_lo: np.ndarray  # (2n-1, 3) f32
    node_hi: np.ndarray  # (2n-1, 3) f32
    n_leaves: int

    def refit(self, leaf_lo: np.ndarray, leaf_hi: np.ndarray) -> None:
        """Bottom-up AABB refit with unchanged topology (BASELINE
        config 5: per-frame refit for animated scenes)."""
        n = self.n_leaves
        self.node_lo[n - 1:] = leaf_lo
        self.node_hi[n - 1:] = leaf_hi
        # process internal nodes in an order guaranteeing children first:
        # compute depth once and sort by descending depth
        order = np.argsort(-self._depths()[: n - 1], kind="stable")
        for i in order:
            l, r = self.left[i], self.right[i]
            self.node_lo[i] = np.minimum(self.node_lo[l], self.node_lo[r])
            self.node_hi[i] = np.maximum(self.node_hi[l], self.node_hi[r])

    def _depths(self) -> np.ndarray:
        # node indices are NOT topologically ordered in a radix tree;
        # walk up to the root per node
        depths = np.zeros(2 * self.n_leaves - 1, np.int32)
        for i in range(2 * self.n_leaves - 1):
            d = 0
            p = self.parent[i]
            while p >= 0:
                d += 1
                p = self.parent[p]
            depths[i] = d
        return depths


def _delta(codes: np.ndarray, i: int, j: int) -> int:
    """Length of the common prefix of codes i and j (Karras delta);
    ties broken by index as per the paper (augment with index bits)."""
    n = len(codes)
    if j < 0 or j >= n:
        return -1
    if codes[i] == codes[j]:
        return 32 + (64 - int(i ^ j).bit_length())
    return 32 - int(int(codes[i]) ^ int(codes[j])).bit_length()


def build_lbvh(codes_sorted: np.ndarray, leaf_lo: np.ndarray,
               leaf_hi: np.ndarray, use_native: bool = True) -> LBVH:
    """Karras binary radix tree from SORTED Morton codes + leaf AABBs.
    Uses the C++ builder (native/rtnative.cpp) when available."""
    n = len(codes_sorted)
    if use_native and n > 1:
        from .. import native as nat

        built = nat.lbvh_build_native(codes_sorted, leaf_lo, leaf_hi)
        if built is not None:
            left, right, parent, node_lo, node_hi = built
            return LBVH(left=left, right=right, parent=parent,
                        node_lo=node_lo, node_hi=node_hi, n_leaves=n)
    assert n >= 1
    if n == 1:
        return LBVH(left=np.zeros(0, np.int32), right=np.zeros(0, np.int32),
                    parent=np.array([-1], np.int32),
                    node_lo=leaf_lo.copy(), node_hi=leaf_hi.copy(),
                    n_leaves=1)

    codes = codes_sorted.astype(np.uint32)
    left = np.zeros(n - 1, np.int32)
    right = np.zeros(n - 1, np.int32)
    parent = np.full(2 * n - 1, -1, np.int32)

    for i in range(n - 1):
        d = 1 if _delta(codes, i, i + 1) > _delta(codes, i, i - 1) else -1
        delta_min = _delta(codes, i, i - d)
        lmax = 2
        while _delta(codes, i, i + lmax * d) > delta_min:
            lmax *= 2
        l = 0
        t = lmax // 2
        while t >= 1:
            if _delta(codes, i, i + (l + t) * d) > delta_min:
                l += t
            t //= 2
        j = i + l * d
        delta_node = _delta(codes, i, j)
        s = 0
        t = (l + 1) // 2
        while True:
            if _delta(codes, i, i + (s + t) * d) > delta_node:
                s += t
            if t == 1:
                break
            t = (t + 1) // 2
        gamma = i + s * d + min(d, 0)

        lo_i, hi_i = min(i, j), max(i, j)
        lchild = (n - 1 + gamma) if lo_i == gamma else gamma
        rchild = (n - 1 + gamma + 1) if hi_i == gamma + 1 else gamma + 1
        left[i] = lchild
        right[i] = rchild
        parent[lchild] = i
        parent[rchild] = i

    node_lo = np.zeros((2 * n - 1, 3), np.float32)
    node_hi = np.zeros((2 * n - 1, 3), np.float32)
    bvh = LBVH(left=left, right=right, parent=parent, node_lo=node_lo,
               node_hi=node_hi, n_leaves=n)
    bvh.refit(leaf_lo, leaf_hi)
    return bvh


def linearize_bvh(bvh: LBVH) -> np.ndarray:
    """DFS (preorder) skip-pointer linearization for STACKLESS traversal.

    Returns a (9, M) f32 node pack, M = 2n-1, rows:
      0-2  node AABB lo        3-5  node AABB hi
      6    hit_next  — next DFS position when the AABB test passes
                       (internal: first child = pos+1; leaf: = miss_next)
      7    miss_next — skip pointer: DFS position of the next node that
                       is NOT in this node's subtree (root: M = done)
      8    leaf id   — cluster index for leaves, -1 for internal nodes

    Traversal holds ONE pointer per ray tile and needs no stack; the
    pointer advances strictly monotonically (both hit_next and miss_next
    are > pos), so a walk terminates in at most M steps and visits each
    node at most once. All ids are exact in f32 (M < 2^24), letting the
    traversal fetch a whole node with ONE 9-row gather.

    Vectorized level-by-level (no per-node Python loop): subtree sizes
    accumulate bottom-up over BFS levels, then preorder positions and
    skip pointers propagate top-down (pos[left] = pos+1,
    pos[right] = pos+1+size[left]; skip[left] = pos[right],
    skip[right] = skip[parent]).
    """
    n = bvh.n_leaves
    m = 2 * n - 1
    pack = np.zeros((9, m), np.float32)
    if n == 1:
        pack[0:3, 0] = bvh.node_lo[0]
        pack[3:6, 0] = bvh.node_hi[0]
        pack[6, 0] = 1.0
        pack[7, 0] = 1.0
        pack[8, 0] = 0.0
        return pack

    left, right = bvh.left, bvh.right  # indexed by internal node id
    ids = np.arange(m)
    is_leaf = ids >= n - 1

    # BFS levels from the root (internal node 0); a child is always one
    # level below its parent, so level order is topological both ways.
    levels = [np.array([0], np.int64)]
    while True:
        internal = levels[-1][levels[-1] < n - 1]
        if internal.size == 0:
            break
        levels.append(np.concatenate([left[internal], right[internal]]))

    size = np.ones(m, np.int64)
    for lev in reversed(levels):
        internal = lev[lev < n - 1]
        if internal.size:
            size[internal] = 1 + size[left[internal]] + size[right[internal]]

    pos = np.zeros(m, np.int64)
    skip = np.zeros(m, np.int64)
    skip[0] = m
    for lev in levels:
        internal = lev[lev < n - 1]
        if internal.size == 0:
            continue
        l, r = left[internal], right[internal]
        pos[l] = pos[internal] + 1
        pos[r] = pos[internal] + 1 + size[l]
        skip[l] = pos[r]
        skip[r] = skip[internal]

    pack[0:3, pos] = bvh.node_lo.T
    pack[3:6, pos] = bvh.node_hi.T
    pack[6, pos] = np.where(is_leaf, skip, pos + 1).astype(np.float32)
    pack[7, pos] = skip.astype(np.float32)
    pack[8, pos] = np.where(is_leaf, ids - (n - 1), -1).astype(np.float32)
    return pack


def tile_cull_mask_np(dmin, dmax, omin, omax, blk_lo, blk_hi):
    """NumPy reference of the interval slab test (see megakernel for the
    jnp version used per frame). Shapes: (T,3) tile dir/origin bounds,
    (B,3) cluster AABBs -> (T,B) bool."""
    import itertools
    t_cnt, b_cnt = dmin.shape[0], blk_lo.shape[0]
    out = np.zeros((t_cnt, b_cnt), bool)
    for ti in range(t_cnt):
        for bi in range(b_cnt):
            t0, t1 = 0.0, np.inf
            ok = True
            for a in range(3):
                A = blk_lo[bi, a] - omax[ti, a]
                B = blk_hi[bi, a] - omin[ti, a]
                dn, dx = dmin[ti, a], dmax[ti, a]
                if B < A:
                    ok = False
                    break
                if dn <= 0.0 <= dx:
                    continue  # t-range unconstrained (conservative)
                if dn > 0.0:
                    lo_t = A / dx if A > 0.0 else 0.0
                    hi_t = B / dn if B >= 0.0 else -1.0
                else:  # dx < 0
                    lo_t = B / dn if B < 0.0 else 0.0
                    hi_t = A / dx if A <= 0.0 else -1.0
                if hi_t < 0.0:
                    ok = False
                    break
                t0 = max(t0, lo_t)
                t1 = min(t1, hi_t)
                if t0 > t1:
                    ok = False
                    break
            out[ti, bi] = ok
    return out
