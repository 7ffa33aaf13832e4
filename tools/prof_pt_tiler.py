"""Round-5 config-4: TILE_R ladder on the fused extend+shadow sweep.

prof_pt_glue: each ES sweep costs ~10.5 ms even at ~5% activity; with
grid=(R/tile_r,)=2040 steps that is ~5 us of fixed grid/DMA cost per
step. Fatter ray tiles cut grid steps linearly; the act-aware word
masks still skip dead face work, so the bet is the fixed floor drops
~proportionally while active tiles lose little cull granularity
(activity is spatially clustered). Full 4-bounce frame, es_fn
wrapping tile_r; both config-4 viewpoints; bit-identity checked.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import functools
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

out = {}
for label, eye in (("sparse25", (0.0, 0.0, 2.5)),
                   ("dense09", (0.0, 0.0, 0.9))):
    cfg = reference_scene(W, H)
    cfg = dc.replace(cfg, camera=CameraConfig(eye=eye))
    sd = Scene.build(cfg).data
    uni = jnp.asarray(Camera.from_config(cfg.camera, W / H)
                      .uniforms().flat())
    ref = None
    for tr in (1024, 2048, 4096, 8192):
        es = functools.partial(mk.extend_shadow_pallas, tile_r=tr)
        jf = jax.jit(lambda u, k, es=es, sd=sd: pt.render_pathtrace(
            sd, u, k, width=W, height=H, bounces=4, spp=1, es_fn=es))
        out[f"{label}_tile{tr}_ms"] = time_frames(lambda: jf(uni, key), n=6)
        img = np.asarray(jf(uni, key))
        if ref is None:
            ref = img
        else:
            out[f"{label}_tile{tr}_bitident"] = bool((img == ref).all())
        print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                          for k, v in out.items()}), flush=True)
