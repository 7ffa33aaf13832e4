"""Round-5 config-4: in-frame cost of the ES cull-mask computation.

Triangulation so far (sparse 2.5, 4 bounces): glue 5.4 ms; per-ES
(2x _mask_words + kernel + expand) ~10.5 ms; expand ~1.6 ms; tile_r
ladder flat (not grid-step overhead). Suspect: _mask_words (per-tile
interval reduction + block tests, called twice per ES). Measure by
DOUBLING it in-frame: patched _mask_words computes twice with an
optimization_barrier between (CSE-proof) and ORs the identical
results — bit-exact, (doubled - control) = total mask cost.
Also: all-ones masks (mask compute removed, kernel sweeps everything)
and all-zero masks (mask compute removed, kernel skips everything)
bracket the kernel's word-work vs fixed cost.
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
key = jax.random.PRNGKey(7)
cfg = reference_scene(W, H)
cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 2.5)))
sd = Scene.build(cfg).data
uni = jnp.asarray(Camera.from_config(cfg.camera, W / H).uniforms().flat())

orig_mask_words = mk._mask_words

def doubled(*a, **kw):
    w1, n = orig_mask_words(*a, **kw)
    a2 = [jax.lax.optimization_barrier(x)
          if isinstance(x, jax.Array) else x for x in a]
    w2, _ = orig_mask_words(*a2, **kw)
    return w1 | w2, n

out = {}
variants = [("control", None), ("mask_doubled", doubled)]
for name, fn in variants:
    if fn is not None:
        mk._mask_words = fn
    jf = jax.jit(lambda u, k: pt.render_pathtrace(
        sd, u, k, width=W, height=H, bounces=4, spp=1))
    out[name + "_ms"] = time_frames(lambda: jf(uni, key), n=6)
    if fn is not None:
        mk._mask_words = orig_mask_words
    print(json.dumps({k: round(v, 2) for k, v in out.items()}), flush=True)

# bit-identity of the doubled variant
mk._mask_words = doubled
jd = jax.jit(lambda u, k: pt.render_pathtrace(
    sd, u, k, width=W, height=H, bounces=4, spp=1))
imgd = np.asarray(jd(uni, key))
mk._mask_words = orig_mask_words
jc = jax.jit(lambda u, k: pt.render_pathtrace(
    sd, u, k, width=W, height=H, bounces=4, spp=1))
out["doubled_bitident"] = bool((np.asarray(jc(uni, key)) == imgd).all())
print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                  for k, v in out.items()}), flush=True)
