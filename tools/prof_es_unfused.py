"""Fused extend+shadow vs separate CH+AH kernels (round 5, config 4).

prof_pt4 at HEAD: the fused ES kernel costs ~41 ms/bounce on a
128-face scene whose masks admit ~1 block/tile — fixed per-tile cost,
not admission work. The separate per-ray kernels (gbuffer_perray via
_vmem_sched ordered loops, anyhit via the scheduled kernel) got the
round-3/4 redesign; the fused kernel kept the round-2 word-loop. Time
both on the same realistic bounce-1 wavefront.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from rust_wgpu_raytracing_tpu.config import CameraConfig, reference_scene
from rust_wgpu_raytracing_tpu.core.camera import Camera, CameraUniforms
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.ops import pathtrace as pt
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 1920, 1080
cfg = reference_scene(W, H)
cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 2.5)))
sd = Scene.build(cfg).data
cam = Camera.from_config(cfg.camera, W / H)
uni = jnp.asarray(cam.uniforms().flat())
uo = CameraUniforms.unflat(uni)
key = jax.random.PRNGKey(0)
tile = mk._pick_tile_shape(W, H)
r = W * (tile[2] if tile else H)
dx, dy, dz = pt._jittered_dirs(W, H, uo, key, tile)
gb = mk.gbuffer_pallas(sd, uo.origin, dx, dy, dz)
hit = jnp.isfinite(gb.t)
flip = gb.nd > 0.0
nx = jnp.where(flip, -gb.nx, gb.nx)
ny = jnp.where(flip, -gb.ny, gb.ny)
nz = jnp.where(flip, -gb.nz, gb.nz)
ts = jnp.where(hit, gb.t, 0.0)
ox = jnp.full((r,), uo.origin[0]) + dx * ts + nx * 1e-3
oy = jnp.full((r,), uo.origin[1]) + dy * ts + ny * 1e-3
oz = jnp.full((r,), uo.origin[2]) + dz * ts + nz * 1e-3
bdx, bdy, bdz = pt._cosine_sample(nx, ny, nz, key)
far = 1e9
ndx = jnp.where(hit, bdx, 0.0)
ndy = jnp.where(hit, bdy, 0.0)
ndz = jnp.where(hit, bdz, 0.0)
nox = jnp.where(hit, ox, far)
noy = jnp.where(hit, oy, far)
noz = jnp.where(hit, oz, far)
sdx = jnp.zeros((r,))
sdy = jnp.zeros((r,))
sdz = jnp.ones((r,))
args = (nox, noy, noz, ndx, ndy, ndz, ox, oy, oz, sdx, sdy, sdz, hit)

out = {}
jf = jax.jit(lambda *a: mk.extend_shadow_pallas(sd, *a)[0].t)
out["fused_ES_t_only"] = time_frames(lambda: jf(*args), n=8)
print(json.dumps({k: round(v, 2) for k, v in out.items()}), flush=True)

jch = jax.jit(lambda o1, o2, o3, d1, d2, d3: mk.gbuffer_perray_pallas(
    sd, o1, o2, o3, d1, d2, d3).t)
out["ch_perray_t_only"] = time_frames(
    lambda: jch(nox, noy, noz, ndx, ndy, ndz), n=8)
print(json.dumps({k: round(v, 2) for k, v in out.items()}), flush=True)

jah = jax.jit(functools.partial(mk.anyhit_pallas, act_cull=True),
              static_argnames=("act_cull",))
out["ah_act_cull"] = time_frames(
    lambda: jah(sd, ox, oy, oz, sdx, sdy, sdz, hit), n=8)

jboth = jax.jit(lambda *a: (
    mk.gbuffer_perray_pallas(sd, a[0], a[1], a[2], a[3], a[4], a[5]).t,
    mk.anyhit_pallas(sd, a[6], a[7], a[8], a[9], a[10], a[11], a[12],
                     act_cull=True)))
out["unfused_pair_one_jit"] = time_frames(lambda: jboth(*args), n=8)
print(json.dumps({k: round(v, 2) for k, v in out.items()}), flush=True)
