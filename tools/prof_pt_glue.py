"""Round-5 config-4: split the flat ~11.8 ms/bounce floor between the
fused ES kernel and the XLA inter-bounce glue, by in-frame ablation.

prof_pt_ladder: marginal bounce cost is ~11.8 ms at eye 2.5 where
activity after bounce 1 is ~5% — a fixed floor. Replace the three
mesh passes with constant-returning fakes (same shapes, no kernels):
  glue_only      = all three faked -> pure XLA inter-bounce glue
  glue_plus_es   = only CH/AH faked -> glue + 4 fused ES sweeps
  full           = control
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import json

import jax
import jax.numpy as jnp

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


def fake_gb(r):
    z = jnp.zeros((r,), jnp.float32)
    fin = z + 1.5
    return mk.GBuffer(t=fin, face=jnp.zeros((r,), jnp.int32),
                      u=z, v=z, nd=z - 1.0, uvx=z + 0.3, uvy=z + 0.3,
                      nx=z, ny=z, nz=z + 1.0, mat=z)


def fake_chp(scene, origin, dx, dy, dz, interpret=False):
    return fake_gb(dx.shape[0])


def fake_es(scene, ox, oy, oz, dx, dy, dz,
            sox, soy, soz, sdx, sdy, sdz, active, interpret=False):
    return fake_gb(ox.shape[0]), jnp.zeros((ox.shape[0],), bool)


def fake_ah(scene, ox, oy, oz, dx, dy, dz, active, interpret=False):
    return jnp.zeros((ox.shape[0],), bool)


out = {}
variants = {
    "full": dict(),
    "glue_plus_es": dict(chp_fn=fake_chp, ah_fn=fake_ah),
    "glue_only": dict(chp_fn=fake_chp, es_fn=fake_es, ah_fn=fake_ah),
}
for name, kw in variants.items():
    jf = jax.jit(lambda u, k, kw=kw: pt.render_pathtrace(
        sd, u, k, width=W, height=H, bounces=4, spp=1, **kw))
    out[name + "_ms"] = time_frames(lambda: jf(uni, key), n=6)
    print(json.dumps({k: round(v, 2) for k, v in out.items()}), flush=True)
