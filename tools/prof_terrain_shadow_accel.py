"""Config-6 probe: does accel='bvh' help the 522k-terrain SHADOW frame?

The round-5 sweep measured bvh 69.5 ms vs cull 74.3 ms on the primary
pass, but the shadow bench (186.8 ms at f319e4b) ran with the default
cull for BOTH passes. The shadow wavefront is origin-Morton reordered
into world-space slabs, so the hierarchical cone test may admit fewer
clusters than the flat interval mask there too. Run on-chip; all
modes are bit-identical by the accel-equivalence tests, so this is
perf-only.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc

import jax.numpy as jnp

from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig)
from rust_wgpu_raytracing_tpu.core.camera import Camera
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.ops.megakernel import render_megakernel
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames
from rust_wgpu_raytracing_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

W, H = 1920, 1080
cfg = SceneConfig(
    meshes=(MeshConfig(obj_path="builtin:terrain:512",
                       translation=(0.0, 0.0, -3.0),
                       light_direction=(6.0, -1.0, 1.0)),),
    camera=CameraConfig(eye=(0.0, -0.4, -1.2), target=(0.0, 0.0, -3.0)),
    render=RenderConfig(width=W, height=H))
sd = Scene.build(cfg).data
cam = Camera.from_config(cfg.camera, aspect=W / H)
uni = jnp.asarray(cam.uniforms().flat())

for accel in ("cull", "bvh"):
    try:
        ms = time_frames(lambda: render_megakernel(
            sd, uni, width=W, height=H, shadows=True, accel=accel), n=3)
        print(f"shadow_frame accel={accel}: {ms:.1f} ms", flush=True)
    except Exception as e:
        print(f"shadow_frame accel={accel}: FAILED {e!r}"[:300], flush=True)
