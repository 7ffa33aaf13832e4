import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import jax, jax.numpy as jnp, numpy as np
from rust_wgpu_raytracing_tpu.config import reference_scene, CameraConfig, SceneConfig
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.core.camera import Camera, CameraUniforms
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 1920, 1080
base = reference_scene(W, H, shadows=True)
base = dc.replace(base, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
cam = Camera.from_config(base.camera, aspect=W/H)
uni = jnp.asarray(cam.uniforms().flat())

def timed(name, cfg, shadows):
    sd = Scene.build(cfg).data
    fn = lambda: mk.render_megakernel(sd, uni, width=W, height=H,
                                      shadows=shadows)
    print(name, round(time_frames(fn, n=10), 3), flush=True)

timed("full_shadows", base, True)
timed("full_noshadow", base, False)
timed("nospheres_shadows", dc.replace(base, spheres=()), True)
timed("nospheres_noshadow", dc.replace(base, spheres=()), False)

uo = CameraUniforms.unflat(uni)
th, tw, hpad = mk._pick_tile_shape(W, H)
dx, dy, dz = mk.raygen_planar_tiled(W, hpad, uo, tile_h=th, tile_w=tw)
sd = Scene.build(base).data
gb_fn = lambda: mk.gbuffer_pallas(sd, uo.origin, dx, dy, dz).t
print("gbuffer8", round(time_frames(gb_fn, n=10), 3), flush=True)
