"""Round-5 config-4: how much of the 62 ms frame is the per-bounce
2M-lane bilinear albedo gather?

sample_packed_texture costs ~6 ms per call at 1080p (per-INDEX gather
cost, measured round 3) and render_pathtrace calls it bounces+1 = 5
times per spp — dead lanes included, since a gather has no activity
mask. Ablations (timing-only, output garbage where patched):
  control        : unmodified frame
  flat_albedo    : every bounce's texture fetch -> constant 0.7
  flat_after_b0  : bounce 0 real, bounces >= 1 constant (the
                   indirect-bounce-only saving actually available)
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

orig = pt.sample_packed_texture
calls = [0]

def flat_tex(pool, base, hw_h, hw_w, u, v, interpret=False):
    c = jnp.full_like(u, 0.7)
    return c, c, c

def flat_after_b0(pool, base, hw_h, hw_w, u, v, interpret=False):
    calls[0] += 1
    if calls[0] == 1:
        return orig(pool, base, hw_h, hw_w, u, v, interpret=interpret)
    c = jnp.full_like(u, 0.7)
    return c, c, c

out = {}
for name, fn in (("control", orig), ("flat_albedo", flat_tex),
                 ("flat_after_b0", flat_after_b0)):
    calls[0] = 0
    pt.sample_packed_texture = fn
    jf = jax.jit(lambda u_, k_: pt.render_pathtrace(
        sd, u_, k_, width=W, height=H, bounces=4, spp=1))
    out[name + "_ms"] = time_frames(lambda: jf(uni, key), n=6)
    pt.sample_packed_texture = orig
    print(json.dumps({k: round(v, 2) for k, v in out.items()}), flush=True)
