"""Decompose config 4 (VMEM-scene PT, 1080p suzanne, 4 bounces) —
round 5: the sweep measured 232 ms/1-spp frame vs the 46 ms round-2
claim; find where a bounce's ~45 ms actually goes before optimizing.

Times render_pathtrace at bounces=0..4 (successive deltas = per-bounce
cost), then the candidate stages in isolation on a realistic bounce-1
wavefront: the fused extend+shadow kernel, the post-sweep attribute
expansion (expand_tf_gbuffer), the albedo gather, the interval-cull
mask build, and the cosine-sample RNG.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import json

import jax
import jax.numpy as jnp
import numpy as np

from rust_wgpu_raytracing_tpu.config import CameraConfig, reference_scene
from rust_wgpu_raytracing_tpu.core.camera import Camera, CameraUniforms
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.ops import pathtrace as pt
from rust_wgpu_raytracing_tpu.ops.pathtrace import render_pathtrace
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 1920, 1080
cfg = reference_scene(W, H)
cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 2.5)))
sd = Scene.build(cfg).data
cam = Camera.from_config(cfg.camera, aspect=W / H)
uni = jnp.asarray(cam.uniforms().flat())
key = jax.random.PRNGKey(0)

prev = 0.0
for b in range(5):
    fn = lambda: render_pathtrace(sd, uni, key, width=W, height=H,
                                  bounces=b, spp=1)
    ms = time_frames(fn, n=4, warmup=1)
    print(json.dumps({"bounces": b, "ms": round(ms, 2),
                      "delta": round(ms - prev, 2)}), flush=True)
    prev = ms

# ---- realistic bounce-1 wavefront ----
uo = CameraUniforms.unflat(uni)
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
sdx = jnp.full((r,), 0.0)
sdy = jnp.full((r,), 0.0)
sdz = jnp.full((r,), 1.0)
print(json.dumps({"hit_frac": round(float(np.asarray(hit).mean()), 4)}))

stages = {}

jfn = jax.jit(lambda *a: pt._cosine_sample(a[0], a[1], a[2], key))
stages["cosine_rng"] = time_frames(lambda: jfn(nx, ny, nz), n=8)

jes = jax.jit(lambda *a: mk.extend_shadow_pallas(sd, *a))
stages["extend_shadow_kernel+expand"] = time_frames(
    lambda: jes(nox, noy, noz, ndx, ndy, ndz,
                ox, oy, oz, sdx, sdy, sdz, hit)[0].t, n=8)

t_f = jnp.where(hit, gb.t, jnp.float32(np.inf))
face = gb.face
jx = jax.jit(lambda t, f: mk.expand_tf_gbuffer(
    sd, t, f, ndx, ndy, ndz, oxyz=(nox, noy, noz)).uvx)
stages["expand_only"] = time_frames(lambda: jx(t_f, face), n=8)

tex_base = mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_base[k])
hw_h = mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_h[k])
hw_w = mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_w[k])
jt = jax.jit(lambda u, v: mk.sample_packed_texture(
    sd.tex_packed, tex_base, hw_h, hw_w, u, v))
stages["albedo_gather"] = time_frames(lambda: jt(gb.uvx, 1.0 - gb.uvy),
                                      n=8)

f = sd.tri_p0.shape[0]
bf = mk._natural_block_f(sd, f)
jm = jax.jit(lambda *a: mk._mask_words(sd, "cull", *a, 1024, bf, f,
                                       False)[0])
stages["mask_words_one_wavefront"] = time_frames(
    lambda: jm(nox, noy, noz, ndx, ndy, ndz), n=8)

jg = jax.jit(lambda *a: mk.gbuffer_pallas(sd, uo.origin, *a).t)
stages["primary_gbuffer+expand"] = time_frames(lambda: jg(dx, dy, dz),
                                               n=8)

print(json.dumps({k: round(v, 2) for k, v in stages.items()}))
