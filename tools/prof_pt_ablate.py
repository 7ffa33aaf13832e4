"""Round-5 config-4 ground truth: IN-CONTEXT marginal cost of each
per-bounce stage of render_pathtrace at 1080p, 4 bounces, by ablation.

Standalone gather probes disagree with in-context totals (a 29 ms
standalone tap gather lives inside a 13.5 ms fused frame; ladder
'fast' cases turned out to be constant-folded gathers over ones
pools). Ablation inside the REAL frame is the only trustworthy
decomposition: time the full frame, then the frame with (a) the
albedo sample replaced by constants, (b) the ES expand's attribute
fetch replaced by constants — same control flow, same kernels
otherwise. monkeypatched, nothing committed to the frame.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import json

import jax
import jax.numpy as jnp
import numpy as np

from rust_wgpu_raytracing_tpu.config import CameraConfig, reference_scene
from rust_wgpu_raytracing_tpu.core.camera import Camera
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.ops import pathtrace as pt
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 1920, 1080
cfg = reference_scene(W, H)
cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
sd = Scene.build(cfg).data
cam = Camera.from_config(cfg.camera, W / H)
uni = jnp.asarray(cam.uniforms().flat())
key = jax.random.PRNGKey(7)

def frame(u, k):
    return pt.render_pathtrace(sd, u, k, width=W, height=H,
                               bounces=4, spp=1)

out = {}
jf = jax.jit(frame)
out["pt_full_ms"] = time_frames(lambda: jf(uni, key), n=6)
print(json.dumps({k: round(v, 3) for k, v in out.items()}), flush=True)

# (a) ablate the albedo texture sample
real_sample = mk.sample_packed_texture
pt_sample = pt.sample_packed_texture
def fake_sample(pool, base, hh, hw, u, v, interpret=False):
    z = u * 0.0 + 0.5
    return z, z, z
pt.sample_packed_texture = fake_sample
ja = jax.jit(frame)
out["pt_no_albedo_ms"] = time_frames(lambda: ja(uni, key), n=6)
pt.sample_packed_texture = pt_sample
print(json.dumps({k: round(v, 3) for k, v in out.items()}), flush=True)

# (b) ablate the ES winner-attribute expand (keep sweeps, drop fetch)
real_expand = mk.expand_tf_gbuffer
def fake_expand(scene, t, f, dx, dy, dz, **kw):
    g = real_expand(scene, t, f, dx, dy, dz, **kw)
    # same pytree, constant planes (keeps downstream shapes/dtypes)
    return type(g)(**{k: (v if k in ("t", "face") else
                          jnp.zeros_like(v) + 0.25)
                      for k, v in g._asdict().items()})
for mod in (mk, pt):
    if hasattr(mod, "expand_tf_gbuffer"):
        mod.expand_tf_gbuffer = fake_expand
jb2 = jax.jit(frame)
out["pt_no_expand_ms"] = time_frames(lambda: jb2(uni, key), n=6)
for mod in (mk, pt):
    if hasattr(mod, "expand_tf_gbuffer"):
        mod.expand_tf_gbuffer = real_expand
print(json.dumps({k: round(v, 3) for k, v in out.items()}), flush=True)

# (c) both ablated
pt.sample_packed_texture = fake_sample
for mod in (mk, pt):
    if hasattr(mod, "expand_tf_gbuffer"):
        mod.expand_tf_gbuffer = fake_expand
jc = jax.jit(frame)
out["pt_no_albedo_no_expand_ms"] = time_frames(lambda: jc(uni, key), n=6)
pt.sample_packed_texture = pt_sample
for mod in (mk, pt):
    if hasattr(mod, "expand_tf_gbuffer"):
        mod.expand_tf_gbuffer = real_expand
print(json.dumps({k: round(v, 3) for k, v in out.items()}), flush=True)
