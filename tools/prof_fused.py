import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import jax.numpy as jnp
from rust_wgpu_raytracing_tpu.config import reference_scene, CameraConfig
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.core.camera import Camera
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames
import numpy as np

W, H = 1920, 1080
base = reference_scene(W, H, shadows=True)
base = dc.replace(base, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
cam = Camera.from_config(base.camera, aspect=W/H)
uni = jnp.asarray(cam.uniforms().flat())
sd = Scene.build(base).data

for name, kw in (("fused_shadows", dict(shadows=True, fused=True)),
                 ("default_shadows", dict(shadows=True)),
                 ("fused_noshadow", dict(shadows=False, fused=True)),
                 ("split_shadows", dict(shadows=True, fused=False))):
    fn = lambda kw=kw: mk.render_megakernel(sd, uni, width=W, height=H, **kw)
    print(name, round(time_frames(fn, n=10), 3), flush=True)

# sanity: fused vs split equivalence at 1080p dense on the CHIP
cf, _ = mk.render_megakernel(sd, uni, width=W, height=H, shadows=True)
cs, _ = mk.render_megakernel(sd, uni, width=W, height=H, shadows=True, fused=False)
a, b = np.asarray(cf), np.asarray(cs)
diff = np.abs(a - b).max()
frac = (a != b).mean()
print("max_diff_u8", round(diff * 255, 2), "frac_diff", round(float(frac), 6))
