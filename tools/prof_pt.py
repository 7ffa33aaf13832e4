"""Decompose config 8 (streamed-scene PT) cost by bounce count.

Times render_pathtrace at bounces=0..3; successive differences isolate
the per-bounce cost (fused extend closest-hit + NEE any-hit at 0.5M
rays). Also prints mask stats for the bounce-1 extension wavefront:
admitted clusters/tile under the current octant-cone interval cull —
the number the exact per-ray union mask must beat.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import jax, jax.numpy as jnp, numpy as np
from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig)
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.core.camera import Camera
from rust_wgpu_raytracing_tpu.ops.pathtrace import render_pathtrace
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 960, 540
cfg = SceneConfig(
    meshes=(MeshConfig(obj_path="builtin:terrain:512",
                       translation=(0.0, 0.0, -3.0),
                       light_direction=(6.0, -1.0, 1.0)),),
    camera=CameraConfig(eye=(0.0, -0.4, -1.2), target=(0.0, 0.0, -3.0)),
    render=RenderConfig(width=W, height=H))
sd = Scene.build(cfg).data
cam = Camera.from_config(cfg.camera, aspect=W / H)
uni = jnp.asarray(cam.uniforms().flat())
key = jax.random.PRNGKey(0)

prev = 0.0
for b in range(4):
    fn = lambda: render_pathtrace(sd, uni, key, width=W, height=H,
                                  bounces=b, spp=1)
    ms = time_frames(fn, n=2, warmup=1)
    print(f"bounces={b}: {ms:.1f} ms  (delta {ms - prev:.1f})", flush=True)
    prev = ms
