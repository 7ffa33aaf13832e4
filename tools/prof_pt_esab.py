"""Round-5 config-4: FULL-FRAME A/B of the per-bounce mesh pass.

prof_pt_ablate proved the gathers are free in context (85 ms full vs
85 ms with albedo+expand ablated); the cost is the sweeps. The fused
extend+shadow kernel kept the round-2 word-loop design while the
separate per-ray kernels (gbuffer_perray_pallas, anyhit_pallas
act_cull) got the round-3/4 scheduled/VMEM redesign. A/B the REAL
4-bounce 1080p frame with es_fn swapped, at both viewpoints (dense
eye 0.9, sparse eye 2.5 = the config-4 artifact view).
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


def es_unfused(scene, ox, oy, oz, dx, dy, dz,
               sox, soy, soz, sdx, sdy, sdz, active,
               interpret=False):
    gb = mk.gbuffer_perray_pallas(scene, ox, oy, oz, dx, dy, dz,
                                  interpret=interpret)
    occ = mk.anyhit_pallas(scene, sox, soy, soz, sdx, sdy, sdz, active,
                           act_cull=True, interpret=interpret)
    return gb, occ


out = {}
for label, eye in (("dense09", (0.0, 0.0, 0.9)),
                   ("sparse25", (0.0, 0.0, 2.5))):
    cfg = reference_scene(W, H)
    cfg = dc.replace(cfg, camera=CameraConfig(eye=eye))
    sd = Scene.build(cfg).data
    uni = jnp.asarray(Camera.from_config(cfg.camera, W / H)
                      .uniforms().flat())

    jf = jax.jit(lambda u, k, sd=sd: pt.render_pathtrace(
        sd, u, k, width=W, height=H, bounces=4, spp=1))
    out[f"pt_fusedES_{label}_ms"] = time_frames(lambda: jf(uni, key), n=6)
    print(json.dumps({k: round(v, 3) for k, v in out.items()}), flush=True)

    ju = jax.jit(lambda u, k, sd=sd: pt.render_pathtrace(
        sd, u, k, width=W, height=H, bounces=4, spp=1,
        es_fn=es_unfused))
    out[f"pt_unfusedES_{label}_ms"] = time_frames(lambda: ju(uni, key), n=6)
    print(json.dumps({k: round(v, 3) for k, v in out.items()}), flush=True)

    # identical radiance? (the unfused pair must be bit-identical: the
    # fused kernel's contract says same formulas, one pass)
    a = np.asarray(jf(uni, key))
    b = np.asarray(ju(uni, key))
    out[f"bitident_{label}"] = bool((a == b).all())
    out[f"maxdiff_{label}"] = float(np.abs(a - b).max())
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}), flush=True)
