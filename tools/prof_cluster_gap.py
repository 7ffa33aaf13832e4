"""Chip-free go/no-go probe: after the round-3 per-ray WORD union
(gbuffer_perray_pallas zeroes whole 1024-face superblock words no
ray's forward line touches — config 8's 3.27 s -> 0.99 s), how much
slack is LEFT in the cluster bits inside admitted words?

Those bits still come from the tile-interval cull (origin box x
direction box); a bounce tile's direction cone spans a full octant, so
every admitted word's 32 cluster bits are near-saturated even when any
given ray can only pass through a handful. The candidate refinement is
EXACT per-ray cluster-AABB union tests, but only on the top-K admitted
words per tile (K static; the rest keep their conservative bits, so
the mask stays a superset and the frame stays bit-identical). Cost
model: R x 32K slab tests/bounce vs the word-level R x S tests already
measured at a few ms.

This probe is pure XLA (no Pallas) so it runs without the chip. It
reconstructs a config-8-like bounce wavefront (origins on the terrain
surface, cosine-sampled directions, the frame's (origin-Morton,
octant) sort) and reports cluster-visit counts under:
  (a) tile-interval cull alone            (pre-round-3)
  (b) (a) restricted to per-ray-union words  (TODAY's kernels)
  (c) exact per-ray cluster union            (the ceiling)
  (d) (b) with only the top-K fattest words refined, K in {8,16,32,64}
(b)/(d) and (b)/(c) bound the visit savings; static admits ignore the
schedule's early termination, so treat ratios as upper bounds (the
word-level refinement's static 7.6x became a measured 3.3x).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig)
from rust_wgpu_raytracing_tpu.core.scene import CULL_BLOCK, SUPER_F, Scene
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.ops.megakernel import TILE_R, tile_cull_mask
from rust_wgpu_raytracing_tpu.ops.pathtrace import _cosine_sample
from rust_wgpu_raytracing_tpu.ops.traverse import perray_super_any

N = int(os.environ.get("PROBE_TERRAIN_N", "512"))
cfg = SceneConfig(
    meshes=(MeshConfig(obj_path=f"builtin:terrain:{N}",
                       translation=(0.0, 0.0, -3.0),
                       light_direction=(6.0, -1.0, 1.0)),),
    camera=CameraConfig(eye=(0.0, -0.4, -1.2), target=(0.0, 0.0, -3.0)),
    render=RenderConfig(width=64, height=64))
sd = Scene.build(cfg).data
f = sd.tri_p0.shape[0]
n_super = f // SUPER_F
nb = f // CULL_BLOCK
print(f"faces={f} superblocks={n_super} clusters={nb}", flush=True)

# bounce wavefront proxy: origins on the surface (every real face's
# p0, nudged off the plane), directions cosine-sampled about the
# normal — the same population bounce 1 of the path tracer produces,
# without needing a Pallas gbuffer (chip-free).
real = np.asarray(sd.tri_valid) > 0
p0 = np.asarray(sd.tri_p0)[real]
nrm = np.asarray(sd.tri_n)[real]
nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
org = p0 + 1e-3 * nrm
ox, oy, oz = [jnp.asarray(org[:, a]) for a in range(3)]
nx, ny, nz = [jnp.asarray(nrm[:, a]) for a in range(3)]
dx, dy, dz = _cosine_sample(nx, ny, nz, jax.random.PRNGKey(0))

perm = mk._bounce_sort_perm(sd, ox, oy, oz, dx, dy, dz)
ox, oy, oz, dx, dy, dz = mk._permute_planes([ox, oy, oz, dx, dy, dz],
                                            perm)
planes = [mk._pad1(a, TILE_R) for a in (ox, oy, oz, dx, dy, dz)]
ox, oy, oz, dx, dy, dz = planes
live = (dx != 0.0) | (dy != 0.0) | (dz != 0.0)
r = ox.shape[0]
n_tiles = r // TILE_R
print(f"rays={r} tiles={n_tiles}", flush=True)

t0 = time.time()
mask_int = np.asarray(
    tile_cull_mask(sd, ox, oy, oz, dx, dy, dz, TILE_R, act=live)) > 0
blo, bhi, slo, shi = mk._super_aabbs(sd, n_super)
sup_ok = np.asarray(perray_super_any(slo, shi, ox, oy, oz, dx, dy, dz,
                                     TILE_R, act=live))
print(f"word-level masks in {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
clu_ok = np.asarray(perray_super_any(blo, bhi, ox, oy, oz, dx, dy, dz,
                                     TILE_R, act=live, chunk=128))
print(f"exact cluster union in {time.time()-t0:.1f}s", flush=True)

interval_only = mask_int                      # (a)
today = mask_int & np.repeat(sup_ok, CULL_BLOCK, axis=1)  # (b)
exact = today & clu_ok                        # (c)

# (d): per tile, refine only the K admitted words with the most set
# cluster bits; the rest keep today's bits.
bits_w = today.reshape(n_tiles, n_super, CULL_BLOCK)
exact_w = exact.reshape(n_tiles, n_super, CULL_BLOCK)
pop = bits_w.sum(axis=2)                      # (T, S) cluster bits/word
res = {
    "tiles": int(n_tiles), "rays": int(r),
    "interval_only": int(interval_only.sum()),
    "today": int(today.sum()),
    "exact": int(exact.sum()),
    "admitted_words_per_tile_mean": float((pop > 0).sum(1).mean()),
    "admitted_words_per_tile_p95": float(
        np.percentile((pop > 0).sum(1), 95)),
}
for K in (8, 16, 32, 64):
    order = np.argsort(-pop, axis=1)[:, :K]   # fattest K words
    sel = np.zeros_like(pop, dtype=bool)
    np.put_along_axis(sel, order, True, axis=1)
    visits = np.where(sel[:, :, None], exact_w, bits_w).sum()
    res[f"topk{K}"] = int(visits)
res["ratio_today_over_exact"] = res["today"] / max(res["exact"], 1)
for K in (8, 16, 32, 64):
    res[f"ratio_today_over_topk{K}"] = res["today"] / max(res[f"topk{K}"], 1)
print(json.dumps(res), flush=True)
