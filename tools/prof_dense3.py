"""Dense 1080p suzanne+shadows: tile_r sensitivity of the full frame
(gbuffer + anyhit are the two Pallas passes that take tile_r)."""
import sys; sys.path.insert(0, "/root/repo")
import dataclasses as dc
import jax, jax.numpy as jnp, numpy as np
from rust_wgpu_raytracing_tpu.config import reference_scene, CameraConfig
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.core.camera import Camera, CameraUniforms
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 1920, 1080
cfg = reference_scene(W, H, shadows=True)
cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
sd = Scene.build(cfg).data
cam = Camera.from_config(cfg.camera, aspect=W/H)
uni = jnp.asarray(cam.uniforms().flat())
uo = CameraUniforms.unflat(uni)

full = lambda: mk.render_megakernel(sd, uni, width=W, height=H,
                                    shadows=True)
print("full_1024", round(time_frames(full, n=10), 3), flush=True)

th, tw, hpad = mk._pick_tile_shape(W, H)
dx, dy, dz = mk.raygen_planar_tiled(W, hpad, uo, tile_h=th, tile_w=tw)
origin = uo.origin
for tr in (1024, 512, 256):
    fn = jax.jit(lambda tr=tr: mk.gbuffer_pallas(sd, origin, dx, dy, dz,
                                                 tile_r=tr).t)
    print(f"gbuffer tile_r={tr}", round(time_frames(fn, n=10), 3),
          flush=True)

gb = mk.gbuffer_pallas(sd, origin, dx, dy, dz)
hit = jnp.isfinite(gb.t)
flip = gb.nd > 0.0
nx = jnp.where(flip, -gb.nx, gb.nx)
ny = jnp.where(flip, -gb.ny, gb.ny)
nz = jnp.where(flip, -gb.nz, gb.nz)
light = sd.mat_light[0]
ll = float(jnp.sqrt(jnp.sum(light**2)))
ts = jnp.where(hit, gb.t, 0.0)
park = 1e9
px = jnp.where(hit, origin[0]+dx*ts+nx*1e-3, park)
py = jnp.where(hit, origin[1]+dy*ts+ny*1e-3, park)
pz = jnp.where(hit, origin[2]+dz*ts+nz*1e-3, park)
sdx = jnp.where(hit, -light[0]/ll, 0.0)
sdy = jnp.where(hit, -light[1]/ll, 0.0)
sdz = jnp.where(hit, -light[2]/ll, 0.0)
args = [jax.device_put(a) for a in (px, py, pz, sdx, sdy, sdz, hit)]
for tr in (1024, 512, 256):
    fn = jax.jit(lambda tr=tr: mk.anyhit_pallas(sd, *args, tile_r=tr))
    print(f"anyhit tile_r={tr}", round(time_frames(fn, n=10), 3),
          flush=True)
