import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import jax, jax.numpy as jnp, numpy as np
from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig)
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.core.camera import Camera, CameraUniforms
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 1920, 1080
cfg = SceneConfig(
    meshes=(MeshConfig(obj_path="builtin:terrain:512",
                       translation=(0.0, 0.0, -3.0),
                       light_direction=(6.0, -1.0, 1.0)),),
    camera=CameraConfig(eye=(0.0, -0.4, -1.2), target=(0.0, 0.0, -3.0)),
    render=RenderConfig(width=W, height=H))
sd = Scene.build(cfg).data
cam = Camera.from_config(cfg.camera, aspect=W/H)
uni = jnp.asarray(cam.uniforms().flat())
uo = CameraUniforms.unflat(uni)
th, tw, hpad = mk._pick_tile_shape(W, H)
dx, dy, dz = mk.raygen_planar_tiled(W, hpad, uo, tile_h=th, tile_w=tw)
origin = uo.origin

gb = mk.gbuffer_pallas(sd, origin, dx, dy, dz)
gb_t = jax.block_until_ready(gb.t)
hit = jnp.isfinite(gb.t)
print("hit_frac", float(hit.mean()), flush=True)
flip = gb.nd > 0.0
nx = jnp.where(flip, -gb.nx, gb.nx); ny = jnp.where(flip, -gb.ny, gb.ny); nz = jnp.where(flip, -gb.nz, gb.nz)
light = jnp.asarray(cfg.meshes[0].light_direction, jnp.float32)
ll = jnp.sqrt(jnp.sum(light**2))
ts = jnp.where(hit, gb.t, 0.0)
park = 1e9
px = jnp.where(hit, origin[0]+dx*ts+nx*1e-3, park)
py = jnp.where(hit, origin[1]+dy*ts+ny*1e-3, park)
pz = jnp.where(hit, origin[2]+dz*ts+nz*1e-3, park)
sdx = jnp.where(hit, -light[0]/ll, 0.0); sdy = jnp.where(hit, -light[1]/ll, 0.0); sdz = jnp.where(hit, -light[2]/ll, 0.0)

# Morton reorder as the frame does
perm = jnp.argsort(mk._origin_morton(sd, px, py, pz))
pv = mk._permute_planes([px, py, pz, sdx, sdy, sdz, hit.astype(jnp.float32)], perm)
px2, py2, pz2, sdx2, sdy2, sdz2, act2 = [jax.device_put(a) for a in pv]
act2b = act2 > 0

ah = lambda: mk.anyhit_pallas(sd, px2, py2, pz2, sdx2, sdy2, sdz2, act2b)
occ = jax.block_until_ready(ah())
print("anyhit_ms", round(time_frames(ah, n=5), 3), "occ_frac", float(jnp.asarray(occ).mean()), flush=True)

# mask stats
f = sd.padded_faces
pad_to = 1024 * mk.STREAM_BATCH
args = [mk._pad1(a, pad_to) for a in (sdx2, sdy2, sdz2, px2, py2, pz2)]
actp = mk._pad1(act2.astype(jnp.float32), pad_to)
dxp, dyp, dzp, oxp, oyp, ozp = args
mask, nwords = mk._mask_words(sd, "cull", oxp, oyp, ozp, dxp, dyp, dzp,
                              1024, 32, f, act=(actp > 0))
m = np.asarray(mask).reshape(-1, nwords)
bits = np.unpackbits(m.astype(">i4").view(np.uint8), axis=1)
per_tile = bits.sum(1)
nb = m.shape[0] // 8
un = m.reshape(nb, 8, nwords)
union = un[:, 0]
for b in range(1, 8):
    union = union | un[:, b]
ub = np.unpackbits(union.astype(">i4").view(np.uint8), axis=1)
uw = (union != 0).sum(1)
print(f"tiles {m.shape[0]} superblocks {nwords}")
print(f"mean admitted clusters/tile {per_tile.mean():.1f}  (visits = {per_tile.sum()})")
print(f"mean union nonzero words/batch {uw.mean():.1f} total fetches {uw.sum()} -> {uw.sum()*0.5:.0f} MB")
print(f"est VPU visit ms {per_tile.sum()*0.46e-3:.1f}  est DMA ms @1.3us/word {uw.sum()*1.3e-3:.1f}")
