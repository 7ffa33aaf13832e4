import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc, time, json
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

# full frame
full = lambda: mk.render_megakernel(sd, uni, width=W, height=H, shadows=True)
print("full_shadows", round(time_frames(full, n=10), 3), flush=True)
noshadow = lambda: mk.render_megakernel(sd, uni, width=W, height=H, shadows=False)
print("full_noshadow", round(time_frames(noshadow, n=10), 3), flush=True)

th, tw, hpad = mk._pick_tile_shape(W, H)
dx, dy, dz = mk.raygen_planar_tiled(W, hpad, uo, tile_h=th, tile_w=tw)
origin = uo.origin
gb_fn = jax.jit(lambda: mk.gbuffer_pallas(sd, origin, dx, dy, dz).t)
print("gbuffer", round(time_frames(gb_fn, n=10), 3), flush=True)

# realistic shadow inputs from one frame's gbuffer
gb = mk.gbuffer_pallas(sd, origin, dx, dy, dz)
hit = jnp.isfinite(gb.t)
flip = gb.nd > 0.0
nx = jnp.where(flip, -gb.nx, gb.nx); ny = jnp.where(flip, -gb.ny, gb.ny); nz = jnp.where(flip, -gb.nz, gb.nz)
light = sd.mat_light[0]
ll = jnp.sqrt(jnp.sum(light**2))
ts = jnp.where(hit, gb.t, 0.0)
park = 1e9
px = jnp.where(hit, origin[0]+dx*ts+nx*1e-3, park)
py = jnp.where(hit, origin[1]+dy*ts+ny*1e-3, park)
pz = jnp.where(hit, origin[2]+dz*ts+nz*1e-3, park)
sdx = jnp.where(hit, -light[0]/ll, 0.0); sdy = jnp.where(hit, -light[1]/ll, 0.0); sdz = jnp.where(hit, -light[2]/ll, 0.0)
px, py, pz, sdx, sdy, sdz, hitd = [jax.device_put(a) for a in (px,py,pz,sdx,sdy,sdz,hit)]
ah_fn = jax.jit(lambda: mk.anyhit_pallas(sd, px, py, pz, sdx, sdy, sdz, hitd))
print("hit_frac", float(hit.mean()), flush=True)
print("anyhit", round(time_frames(ah_fn, n=10), 3), flush=True)

# texshade incl. gather
mat = gb.mat
def shade():
    tex_base = mk._mat_const(sd, mat, lambda k: sd.mat_tex_base[k])
    hw_h = mk._mat_const(sd, mat, lambda k: sd.mat_tex_h[k])
    hw_w = mk._mat_const(sd, mat, lambda k: sd.mat_tex_w[k])
    taps, fx, fy = mk.gather_packed_taps(sd.tex_packed, tex_base, hw_h, hw_w, gb.uvx, 1.0-gb.uvy)
    z = jnp.zeros_like(fx); o = jnp.ones_like(fx)
    return mk._texshade_pallas(taps, fx, fy, o, z, z, z, z, z, z, z)[0]
shade_fn = jax.jit(shade)
print("gather+texshade", round(time_frames(shade_fn, n=10), 3), flush=True)

# sphere passes only
def spheres():
    outs = []
    for i in range(sd.num_spheres):
        t, h, a, b, c = mk.sphere_pass_planar(sd, i, origin, dx, dy, dz)
        outs.append(t)
    return outs[0]
print("spheres", round(time_frames(jax.jit(spheres), n=10), 3), flush=True)
