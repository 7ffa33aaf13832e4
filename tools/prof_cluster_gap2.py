"""Follow-up to prof_cluster_gap.py: the 4.9x cluster-level slack is
SPREAD over ~263 admitted words/tile, so top-K word refinement
captures almost nothing (topk64 = 1.24x). Candidate B: refine with
RAY-GROUP interval tests — after the (origin-Morton, octant) sort,
groups of G consecutive rays are world-compact and share an octant, so
their interval box is nearly as tight as a single ray's, at 1/G the
test cost (R/G x C slab tests, all-XLA, no gather/scatter).

Measures, for G in {8, 32}: cluster visits under (today AND group-G
interval admission), vs today and vs the exact per-ray ceiling, plus
the group-G test count (cost proxy). Conservative by construction:
interval admission over a group is a superset of each member ray's
exact admission, so the frame stays bit-identical.
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
from rust_wgpu_raytracing_tpu.ops.traverse import (perray_super_any,
                                                   slab_interval_ok,
                                                   tile_ray_bounds)

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
print(f"faces={f} rays={r} tiles={n_tiles}", flush=True)

t0 = time.time()
mask_int = np.asarray(
    tile_cull_mask(sd, ox, oy, oz, dx, dy, dz, TILE_R, act=live)) > 0
blo, bhi, slo, shi = mk._super_aabbs(sd, n_super)
sup_ok = np.asarray(perray_super_any(slo, shi, ox, oy, oz, dx, dy, dz,
                                     TILE_R, act=live))
today = mask_int & np.repeat(sup_ok, CULL_BLOCK, axis=1)
print(f"today mask in {time.time()-t0:.1f}s "
      f"visits={int(today.sum())}", flush=True)


def group_mask(g, chunk=512):
    """(T, nb) bool: cluster admitted by ANY of the tile's ray groups
    of size g under the interval slab test (chunked over clusters)."""
    omin, omax, dmin, dmax = tile_ray_bounds(ox, oy, oz, dx, dy, dz,
                                             g, live)
    cols = []
    for c0 in range(0, nb, chunk):
        c1 = min(nb, c0 + chunk)
        a = blo[None, c0:c1, :] - omax[:, None, :]
        b = bhi[None, c0:c1, :] - omin[:, None, :]
        ok = slab_interval_ok(a, b, dmin[:, None, :], dmax[:, None, :])
        # fold ray groups back to render tiles
        cols.append(np.asarray(
            jnp.any(ok.reshape(n_tiles, TILE_R // g, c1 - c0), axis=1)))
    return np.concatenate(cols, axis=1)


res = {"today": int(today.sum()), "tiles": int(n_tiles)}
for g in (32, 8):
    t0 = time.time()
    gm = group_mask(g)
    visits = int((today & gm).sum())
    res[f"group{g}"] = visits
    res[f"group{g}_ratio"] = res["today"] / max(visits, 1)
    res[f"group{g}_tests_G"] = round(r // g * nb / 1e9, 2)
    print(f"G={g}: {time.time()-t0:.1f}s visits={visits}", flush=True)
print(json.dumps(res), flush=True)
