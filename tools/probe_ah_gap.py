"""Chip-free go/no-go probe: would EXACT per-ray word masks (the
round-3 trick that took streamed-PT bounce closest-hits 3.27 s -> 0.99 s)
also pay for the streamed shadow ANY-HIT (configs 6/7: shadows cost
+143/+428 ms over primary at 1080p)?

Shadow rays differ from bounce rays: ONE direction (toward the sun), so
a Morton-sorted tile's direction cone is a point and the interval cull's
only slack is the tile's ORIGIN box. The admit-count gap between the
tile-interval mask and the per-ray union is pure geometry — measurable
on CPU without the chip. Decision rule: implement the refinement only if
the cluster-visit reduction is big enough to beat its own VPU cost
(~R x S slab tests per frame, the known price from the CH path).

Origin proxy: tri_p0 of every real face (surface points), Morton-sorted
exactly as anyhit_reordered_pallas sorts its wavefront. This is the
all-faces superset of any visible-subset wavefront; per-tile compactness
(what the interval cull sees) is driven by the sort, not by visibility.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig)
from rust_wgpu_raytracing_tpu.core.scene import CULL_BLOCK, SUPER_F, Scene
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.ops.megakernel import tile_cull_mask
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

# shadow wavefront: origins on the surface, one direction toward the sun
real = np.asarray(sd.tri_valid) > 0
p0 = np.asarray(sd.tri_p0)[real]
nrm = np.asarray(sd.tri_n)[real]
nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
org = p0 + 1e-3 * nrm
light = np.asarray(sd.mat_light[0])
sdir = -light / np.linalg.norm(light)

ox, oy, oz = [jnp.asarray(org[:, a]) for a in range(3)]
perm = jnp.argsort(mk._origin_morton(sd, ox, oy, oz))
ox, oy, oz = ox[perm], oy[perm], oz[perm]
r = ox.shape[0]
tile_r = mk.TILE_R
pad = (-r) % tile_r
if pad:
    # parked-ray convention: far origin + zero direction
    ox = jnp.concatenate([ox, jnp.full((pad,), 1e9)])
    oy = jnp.concatenate([oy, jnp.full((pad,), 1e9)])
    oz = jnp.concatenate([oz, jnp.full((pad,), 1e9)])
live = jnp.concatenate([jnp.ones((r,), bool), jnp.zeros((pad,), bool)])
rp = ox.shape[0]
dx = jnp.where(live, sdir[0], 0.0)
dy = jnp.where(live, sdir[1], 0.0)
dz = jnp.where(live, sdir[2], 0.0)
n_tiles = rp // tile_r
print(f"rays={r} (+{pad} pad) tiles={n_tiles}", flush=True)

# 1. what the kernel uses today: tile-interval cluster mask
mask01 = np.asarray(jax.jit(
    lambda: tile_cull_mask(sd, ox, oy, oz, dx, dy, dz, tile_r,
                           live))())  # (T, nb) 0/1
admits = mask01.sum(axis=1)
print(f"interval cull: mean admitted clusters/tile {admits.mean():.1f} "
      f"(total visits {int(admits.sum())})", flush=True)

# 2. word-granular per-ray union refinement (what the CH path does)
_, _, slo, shi = mk._super_aabbs(sd, n_super)
sup_ok = np.asarray(jax.jit(
    lambda: perray_super_any(slo, shi, ox, oy, oz, dx, dy, dz, tile_r,
                             act=live))())  # (T, S)
ref_w = mask01 * np.repeat(sup_ok, SUPER_F // CULL_BLOCK, axis=1)
aw = ref_w.sum(axis=1)
print(f"word-union refined: mean clusters/tile {aw.mean():.1f} "
      f"(total {int(aw.sum())}, ratio {admits.sum() / max(aw.sum(), 1):.2f}x)",
      flush=True)

# streamed fetch count: words fetched per STREAM_BATCH-subtile batch
nsub = mk.STREAM_BATCH
tb = n_tiles // nsub * nsub
w_before = (mask01.reshape(-1, nb // (SUPER_F // CULL_BLOCK),
                           SUPER_F // CULL_BLOCK).max(axis=2))[:tb]
w_after = (ref_w.reshape(-1, n_super, SUPER_F // CULL_BLOCK).max(axis=2))[:tb]
fb = w_before.reshape(-1, nsub, n_super).max(axis=1).sum()
fa = w_after.reshape(-1, nsub, n_super).max(axis=1).sum()
print(f"superblock fetches/frame: {int(fb)} -> {int(fa)} "
      f"({fb / max(fa, 1):.2f}x)", flush=True)

# 3. cluster-granular per-ray union — the ceiling any refinement can
# reach (32x costlier to compute than word level; probe on a tile
# subsample to bound CPU time)
step = int(os.environ.get("PROBE_TILE_STEP", "8"))
sel = np.arange(0, n_tiles, step)
idx = (sel[:, None] * tile_r + np.arange(tile_r)[None, :]).reshape(-1)
sub = [jnp.asarray(np.asarray(v)[idx]) for v in (ox, oy, oz, dx, dy, dz)]
sub_live = jnp.asarray(np.asarray(live)[idx])
cl_ok = np.asarray(jax.jit(
    lambda: perray_super_any(sd.blk_lo, sd.blk_hi, *sub, tile_r,
                             act=sub_live, chunk=256))())
ref_c = mask01[sel] * cl_ok
print(f"cluster-union ceiling (1/{step} tiles): "
      f"{mask01[sel].sum(axis=1).mean():.1f} -> "
      f"{ref_c.sum(axis=1).mean():.1f} clusters/tile "
      f"({mask01[sel].sum() / max(ref_c.sum(), 1):.2f}x)", flush=True)
