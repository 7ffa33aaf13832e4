"""Round-5 config-4: compacted vs full frame on the real chip.

Device trace showed 43/62 ms of per-bounce full-shape XLA glue
(texture gathers + winner expansion) at <=5% activity; compact_cap
routes the bounce loop through an r//8 hit-wavefront. Both config-4
viewpoints + bit-identity check.
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
from rust_wgpu_raytracing_tpu.ops.pathtrace import render_pathtrace
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 1920, 1080
key = jax.random.PRNGKey(7)
out = {}
for label, eye in (("sparse25", (0.0, 0.0, 2.5)),
                   ("dense09", (0.0, 0.0, 0.9))):
    cfg = reference_scene(W, H)
    cfg = dc.replace(cfg, camera=CameraConfig(eye=eye))
    sd = Scene.build(cfg).data
    uni = jnp.asarray(Camera.from_config(cfg.camera, W / H)
                      .uniforms().flat())
    imgs = {}
    for cname, cap in (("full", None), ("auto", "auto")):
        jf = jax.jit(lambda u, k, cap=cap, sd=sd: render_pathtrace(
            sd, u, k, width=W, height=H, bounces=4, spp=1,
            compact_cap=cap))
        out[f"{label}_{cname}_ms"] = time_frames(lambda: jf(uni, key), n=6)
        imgs[cname] = np.asarray(jf(uni, key))
        print(json.dumps({k: round(v, 2) for k, v in out.items()}),
              flush=True)
    out[f"{label}_bitident"] = bool((imgs["full"] == imgs["auto"]).all())
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in out.items()}), flush=True)
