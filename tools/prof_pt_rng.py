"""Round-5 config-4: is the hidden per-bounce cost the threefry RNG?

Ablation bookkeeping: faking ES dropped 42 ms but ALSO DCE'd the
upstream per-bounce work (cosine-sample RNG, wavefront advance).
Mask compute, expand, albedo each ablate to ~0. So the ~10.5 ms
per bounce is (ES kernel itself) + (RNG + advance elementwise).
Separate them: patch _cosine_sample's uniforms to a cheap counter
(key still consumed, kernels unchanged, distribution garbage — fine
for timing), and separately double the RNG, in the real frame.
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
from rust_wgpu_raytracing_tpu.ops import pathtrace as pt
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 1920, 1080
key = jax.random.PRNGKey(7)
cfg = reference_scene(W, H)
cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 2.5)))
sd = Scene.build(cfg).data
uni = jnp.asarray(Camera.from_config(cfg.camera, W / H).uniforms().flat())

orig_cos = pt._cosine_sample
orig_uniform = jax.random.uniform

def cheap_cosine(nx, ny, nz, key):
    # same math, uniforms replaced by a phase ramp (no threefry)
    i = jnp.arange(nx.shape[0], dtype=jnp.float32)
    u1 = (i * 0.6180339887) % 1.0 + key[0] * 0.0
    u2 = (i * 0.7548776662) % 1.0
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    lx = r * jnp.cos(phi)
    ly = r * jnp.sin(phi)
    lz = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    dx = lx * (1.0 + sign * nx * nx * a) + ly * b + lz * nx
    dy = lx * (sign * b) + ly * (sign + ny * ny * a) + lz * ny
    dz = lx * (-sign * nx) + ly * (-ny) + lz * nz
    return dx, dy, dz

def doubled_cosine(nx, ny, nz, key):
    d1 = orig_cos(nx, ny, nz, key)
    nb = jax.lax.optimization_barrier(nx)
    d2 = orig_cos(nb, ny, nz, jax.random.fold_in(key, 99))
    # keep both alive, return d1 (changes output only via the add of 0)
    return (d1[0] + d2[0] * 0.0, d1[1] + d2[1] * 0.0,
            d1[2] + d2[2] * 0.0)

out = {}
for name, fn in (("control", orig_cos), ("rng_cheap", cheap_cosine),
                 ("rng_doubled", doubled_cosine)):
    pt._cosine_sample = fn
    jf = jax.jit(lambda u, k: pt.render_pathtrace(
        sd, u, k, width=W, height=H, bounces=4, spp=1))
    out[name + "_ms"] = time_frames(lambda: jf(uni, key), n=6)
    pt._cosine_sample = orig_cos
    print(json.dumps({k: round(v, 2) for k, v in out.items()}), flush=True)

# and the sub-pixel jitter RNG (once per spp, 2 draws at 2M)
orig_jit = pt._jittered_dirs
def unjittered(width, height, uni, key, tile, row0=None,
               total_height=None):
    return orig_jit(width, height, uni, jax.random.PRNGKey(0) * 0,
                    tile, row0=row0, total_height=total_height)
out_done = dict(out)
pt._jittered_dirs = unjittered
jf = jax.jit(lambda u, k: pt.render_pathtrace(
    sd, u, k, width=W, height=H, bounces=4, spp=1))
out["jitter_keyzero_ms"] = time_frames(lambda: jf(uni, key), n=6)
pt._jittered_dirs = orig_jit
print(json.dumps({k: round(v, 2) for k, v in out.items()}), flush=True)
