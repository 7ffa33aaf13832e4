"""How loose is the octant-cone interval mask for bounce wavefronts?

Reconstructs config 8's bounce-1 extension wavefront (primary hits +
cosine-sampled directions), applies the frame's (origin-Morton, octant)
sort, then compares per-tile admitted clusters under:
  (a) the current interval cull (tile origin box x direction box), and
  (b) the EXACT per-ray union (cluster admitted iff >=1 ray's forward
      line intersects its AABB) — computed on-device in cluster chunks.
(b) is the number a per-ray union cull kernel would deliver; the ratio
(a)/(b) bounds its visit savings.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import functools
import jax, jax.numpy as jnp, numpy as np
from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig)
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.core.camera import Camera, CameraUniforms
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.ops.pathtrace import _cosine_sample, _jittered_dirs

W, H = 960, 540
cfg = SceneConfig(
    meshes=(MeshConfig(obj_path="builtin:terrain:512",
                       translation=(0.0, 0.0, -3.0),
                       light_direction=(6.0, -1.0, 1.0)),),
    camera=CameraConfig(eye=(0.0, -0.4, -1.2), target=(0.0, 0.0, -3.0)),
    render=RenderConfig(width=W, height=H))
sd = Scene.build(cfg).data
cam = Camera.from_config(cfg.camera, aspect=W / H)
uni = CameraUniforms.unflat(jnp.asarray(cam.uniforms().flat()))
key = jax.random.PRNGKey(0)

tile = mk._pick_tile_shape(W, H)
dx, dy, dz = _jittered_dirs(W, H, uni, key, tile)
r = dx.shape[0]
gb = mk.gbuffer_pallas(sd, uni.origin, dx, dy, dz)
hit = jnp.isfinite(gb.t)
nx = jnp.where(gb.nd > 0, -gb.nx, gb.nx)
ny = jnp.where(gb.nd > 0, -gb.ny, gb.ny)
nz = jnp.where(gb.nd > 0, -gb.nz, gb.nz)
ts = jnp.where(hit, gb.t, 0.0)
px = uni.origin[0] + dx * ts + nx * 1e-3
py = uni.origin[1] + dy * ts + ny * 1e-3
pz = uni.origin[2] + dz * ts + nz * 1e-3
bdx, bdy, bdz = _cosine_sample(nx, ny, nz, key)
far = 1e9
nox = jnp.where(hit, px, far)
noy = jnp.where(hit, py, far)
noz = jnp.where(hit, pz, far)
ndx = jnp.where(hit, bdx, 0.0)
ndy = jnp.where(hit, bdy, 0.0)
ndz = jnp.where(hit, bdz, 0.0)

perm = mk._bounce_sort_perm(sd, nox, noy, noz, ndx, ndy, ndz)
pv = mk._permute_planes([nox, noy, noz, ndx, ndy, ndz,
                         hit.astype(jnp.float32)], perm)
ox2, oy2, oz2, dx2, dy2, dz2, act2 = pv
print("live rays", int(jnp.sum(act2)), "of", r, flush=True)

pad_to = 1024 * mk.STREAM_BATCH
args = [mk._pad1(a, pad_to) for a in (ox2, oy2, oz2, dx2, dy2, dz2)]
actp = mk._pad1(act2, pad_to) > 0
oxp, oyp, ozp, dxp, dyp, dzp = args
f = sd.padded_faces
mask, nwords = mk._mask_words(sd, "cull", oxp, oyp, ozp, dxp, dyp, dzp,
                              1024, 32, f, act=actp)
m = np.asarray(mask).reshape(-1, nwords)
bits = np.unpackbits(m.astype(">i4").view(np.uint8), axis=1)
per_tile = bits.sum(1)
print(f"tiles {m.shape[0]}  interval-cull visits {per_tile.sum()}  "
      f"mean/tile {per_tile.mean():.1f}", flush=True)

# ---- exact per-ray union, chunked over clusters ----
nb = sd.blk_lo.shape[0]
T = oxp.shape[0] // 1024
CH = 512  # clusters per chunk


@functools.partial(jax.jit, static_argnames=("t",))
def chunk_counts(lo, hi, o3, d3, act, t):
    # o3/d3: (3, T, 1024); lo/hi: (CH, 3) -> (T, CH) any-ray-hits
    inv = 1.0 / d3  # +/-inf at d=0
    t0 = (lo.T[:, None, None, :] - o3[:, :, :, None]) * inv[:, :, :, None]
    t1 = (hi.T[:, None, None, :] - o3[:, :, :, None]) * inv[:, :, :, None]
    zero = d3[:, :, :, None] == 0.0
    inside = ((o3[:, :, :, None] >= lo.T[:, None, None, :])
              & (o3[:, :, :, None] <= hi.T[:, None, None, :]))
    near = jnp.where(zero, jnp.where(inside, -jnp.inf, 1.0),
                     jnp.minimum(t0, t1))
    fara = jnp.where(zero, jnp.where(inside, jnp.inf, -1.0),
                     jnp.maximum(t0, t1))
    tn = jnp.maximum(jnp.maximum(near[0], near[1]), near[2])
    tf = jnp.minimum(jnp.minimum(fara[0], fara[1]), fara[2])
    ok = (tf >= jnp.maximum(tn, 0.0)) & act[:, :, None]
    return jnp.any(ok, axis=1)  # (T, CH)


o3 = jnp.stack([a.reshape(T, 1024) for a in (oxp, oyp, ozp)])
d3 = jnp.stack([a.reshape(T, 1024) for a in (dxp, dyp, dzp)])
actt = actp.reshape(T, 1024)
total = 0
for c0 in range(0, nb, CH):
    lo = jnp.asarray(sd.blk_lo[c0:c0 + CH])
    hi = jnp.asarray(sd.blk_hi[c0:c0 + CH])
    if lo.shape[0] < CH:
        pad = CH - lo.shape[0]
        lo = jnp.concatenate([lo, jnp.full((pad, 3), jnp.inf)])
        hi = jnp.concatenate([hi, jnp.full((pad, 3), -jnp.inf)])
    total += int(jnp.sum(chunk_counts(lo, hi, o3, d3, actt, T)))
print(f"exact per-ray union visits {total}  mean/tile {total / T:.1f}")
print(f"ratio interval/exact = {per_tile.sum() / max(total, 1):.1f}x")
