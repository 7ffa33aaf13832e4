"""Round-5 config-4: bounce ladder — marginal in-frame cost per bounce.

Full-frame timings at bounces 0..4 (sparse eye 2.5, the config-4
artifact view). The b-th marginal = one fused extend+shadow sweep +
NEE/albedo glue at that bounce's activity level. Tells whether the
remaining 61.6 ms is a fixed per-bounce kernel floor (attack the
kernel) or activity-scaled (attack dead-lane work).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import json

import jax
import jax.numpy as jnp

from rust_wgpu_raytracing_tpu.config import CameraConfig, reference_scene
from rust_wgpu_raytracing_tpu.core.camera import Camera
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.ops import pathtrace as pt
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 1920, 1080
key = jax.random.PRNGKey(7)
cfg = reference_scene(W, H)
cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 2.5)))
sd = Scene.build(cfg).data
uni = jnp.asarray(Camera.from_config(cfg.camera, W / H).uniforms().flat())

out = {}
for b in range(5):
    jf = jax.jit(lambda u, k, b=b: pt.render_pathtrace(
        sd, u, k, width=W, height=H, bounces=b, spp=1))
    out[f"bounces{b}_ms"] = time_frames(lambda: jf(uni, key), n=6)
    print(json.dumps({k: round(v, 2) for k, v in out.items()}), flush=True)

# spp amortization: does one jit with spp=4 beat 4 progressive frames?
jf4 = jax.jit(lambda u, k: pt.render_pathtrace(
    sd, u, k, width=W, height=H, bounces=4, spp=4))
out["spp4_ms"] = time_frames(lambda: jf4(uni, key), n=3)
print(json.dumps({k: round(v, 2) for k, v in out.items()}), flush=True)
