"""Decompose config 8 (streamed-scene PT) cost by bounce count.

Times render_pathtrace at bounces=0..3; successive differences isolate
the per-bounce cost (fused extend closest-hit + NEE any-hit at 0.5M
rays). Also prints mask stats for the bounce-1 extension wavefront:
admitted clusters/tile under the current octant-cone interval cull —
the number the exact per-ray union mask must beat.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import jax, jax.numpy as jnp, numpy as np
from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig)
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.core.camera import Camera
from rust_wgpu_raytracing_tpu.ops.pathtrace import render_pathtrace
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 960, 540
cfg = SceneConfig(
    meshes=(MeshConfig(obj_path="builtin:terrain:512",
                       translation=(0.0, 0.0, -3.0),
                       light_direction=(6.0, -1.0, 1.0)),),
    camera=CameraConfig(eye=(0.0, -0.4, -1.2), target=(0.0, 0.0, -3.0)),
    render=RenderConfig(width=W, height=H))
sd = Scene.build(cfg).data
cam = Camera.from_config(cfg.camera, aspect=W / H)
uni = jnp.asarray(cam.uniforms().flat())
key = jax.random.PRNGKey(0)

prev = 0.0
for b in range(4):
    fn = lambda: render_pathtrace(sd, uni, key, width=W, height=H,
                                  bounces=b, spp=1)
    ms = time_frames(fn, n=2, warmup=1)
    print(f"bounces={b}: {ms:.1f} ms  (delta {ms - prev:.1f})", flush=True)
    prev = ms

# ---- within-bounce stage breakdown on a REALISTIC bounce-1 wavefront
# (the per-bounce delta above bundles: sort-perm machinery, streamed
# closest-hit, streamed NEE any-hit, and the XLA glue — albedo gather,
# cosine sampling, radiance math. Time each in isolation so the delta
# decomposes and the next optimization targets the real majority.)
from rust_wgpu_raytracing_tpu.core.camera import CameraUniforms
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.ops import pathtrace as pt
from rust_wgpu_raytracing_tpu.ops.traverse import perray_super_any

uo = CameraUniforms.unflat(uni)
tile = mk._pick_tile_shape(W, H)
dx, dy, dz = pt._jittered_dirs(W, H, uo, key, tile)
r = dx.shape[0]
ox = jnp.full((r,), uo.origin[0])
oy = jnp.full((r,), uo.origin[1])
oz = jnp.full((r,), uo.origin[2])
gb = mk.gbuffer_pallas(sd, uo.origin, dx, dy, dz)
hit = jnp.isfinite(gb.t)
flip = gb.nd > 0.0
nx = jnp.where(flip, -gb.nx, gb.nx)
ny = jnp.where(flip, -gb.ny, gb.ny)
nz = jnp.where(flip, -gb.nz, gb.nz)
bdx, bdy, bdz = pt._cosine_sample(nx, ny, nz, jax.random.fold_in(key, 1))
ts = jnp.where(hit, gb.t, 0.0)
park = 1e9
px = jnp.where(hit, ox + dx * ts + nx * 1e-3, park)
py = jnp.where(hit, oy + dy * ts + ny * 1e-3, park)
pz = jnp.where(hit, oz + dz * ts + nz * 1e-3, park)
ndx = jnp.where(hit, bdx, 0.0)
ndy = jnp.where(hit, bdy, 0.0)
ndz = jnp.where(hit, bdz, 0.0)
light = sd.mat_light[0]
ll = float(jnp.sqrt(jnp.sum(light ** 2)))
sdx = jnp.full((r,), -float(light[0]) / ll)
sdy = jnp.full((r,), -float(light[1]) / ll)
sdz = jnp.full((r,), -float(light[2]) / ll)

perm = mk._bounce_sort_perm(sd, px, py, pz, ndx, ndy, ndz)
pv = mk._permute_planes([px, py, pz, ndx, ndy, ndz,
                         hit.astype(jnp.float32)], perm)
pv = [jax.device_put(p) for p in pv]
hit_f = hit.astype(jnp.float32)


def perm_roundtrip():
    q = mk._bounce_sort_perm(sd, px, py, pz, ndx, ndy, ndz)
    s = mk._permute_planes([px, py, pz, ndx, ndy, ndz, hit_f], q)
    return mk._unpermute_planes(s, q)


print("live_frac", round(float(jnp.mean(hit_f)), 4), flush=True)
t_perm = time_frames(jax.jit(perm_roundtrip), n=4, warmup=1)
print(f"perm_machinery: {t_perm:.1f} ms", flush=True)
t_ch = time_frames(
    lambda: mk.gbuffer_perray_pallas(sd, pv[0], pv[1], pv[2],
                                     pv[3], pv[4], pv[5]).t,
    n=4, warmup=1)
print(f"streamed_closest_hit: {t_ch:.1f} ms", flush=True)
t_ah = time_frames(
    lambda: mk.anyhit_pallas(sd, pv[0], pv[1], pv[2],
                             sdx, sdy, sdz, pv[6] > 0.0),
    n=4, warmup=1)
print(f"streamed_nee_anyhit: {t_ah:.1f} ms", flush=True)

# mask refinement alone (runs inside the CH jit; costed here separately)
n_super = sd.tri_p0.shape[0] // mk.SUPER_F
_, _, slo, shi = mk._super_aabbs(sd, n_super)
live = (pv[3] != 0.0) | (pv[4] != 0.0) | (pv[5] != 0.0)
t_mask = time_frames(jax.jit(
    lambda: perray_super_any(slo, shi, pv[0], pv[1], pv[2],
                             pv[3], pv[4], pv[5], mk.TILE_R, act=live)),
    n=4, warmup=1)
print(f"perray_exact_mask: {t_mask:.1f} ms", flush=True)
print(f"glue_residual_hint: per-bounce delta minus "
      f"{t_perm + t_ch + t_ah:.1f} ms (perm+ch+ah)", flush=True)
