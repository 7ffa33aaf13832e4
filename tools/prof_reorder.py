"""Config-6s shadow frame: reordered vs plain any-hit, plus isolated
permute cost — is the Morton shadow re-sort now a net loss?"""
import sys; sys.path.insert(0, "/root/repo")
import dataclasses as dc
import jax, jax.numpy as jnp, numpy as np
from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig)
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.core.camera import Camera
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

fr = lambda: mk.render_megakernel(sd, uni, width=W, height=H, shadows=True)
print("frame_reordered", round(time_frames(fr, n=5), 3), flush=True)

orig = mk.anyhit_reordered_pallas
mk.anyhit_reordered_pallas = mk.anyhit_pallas
fp = lambda: mk.render_megakernel(sd, uni, width=W, height=H, shadows=True)
print("frame_plain", round(time_frames(fp, n=5), 3), flush=True)
a = fr(); b = fp()
print("identical", bool(jnp.all(a[0] == b[0])), flush=True)
mk.anyhit_reordered_pallas = orig
