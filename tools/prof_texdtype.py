"""Round-5 config-4: why is the one-index-per-ray texture tap gather
18 ns/index when the f32 gpack gather is 2 ns/index?

prof_pt_gathers.py at 96df7de: albedo taps 36.6 ms for 2M indices —
layout-immune (column 36.8, row 36.6, all-indices-zero 37.6). The one
remaining variable is the POOL DTYPE: tex_packed is u16 and sub-word
gathers may scalarize in XLA:TPU, while gpack (f32) gathers at
~2 ns/index. A/B the same (N, 12)-row gather with the pool held as
u16 vs i32-cast vs f32-cast vs (N, 6) i32 BITCAST pairs (same bytes,
word-addressable; split back with shifts after the gather).
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
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 1920, 1080
cfg = reference_scene(W, H)
cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 2.5)))
sd = Scene.build(cfg).data
cam = Camera.from_config(cfg.camera, aspect=W / H)
uo = CameraUniforms.unflat(jnp.asarray(cam.uniforms().flat()))
key = jax.random.PRNGKey(0)
tile = mk._pick_tile_shape(W, H)
r = W * (tile[2] if tile else H)
dx, dy, dz = pt._jittered_dirs(W, H, uo, key, tile)
gb = mk.gbuffer_pallas(sd, uo.origin, dx, dy, dz)

tex_base = mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_base[k])
hw_h = mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_h[k])
hw_w = mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_w[k])
u, v = gb.uvx, 1.0 - gb.uvy

x = u * hw_w - 0.5
y = v * hw_h - 0.5
x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0,
              (hw_w - 1.0).astype(jnp.int32))
y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0,
              (hw_h - 1.0).astype(jnp.int32))
flat = tex_base.astype(jnp.int32) + y0 * hw_w.astype(jnp.int32) + x0

pool = sd.tex_packed                       # (12, N) u16
pool_t_u16 = jnp.asarray(np.asarray(pool.T))          # (N, 12) u16
pool_t_i32 = pool_t_u16.astype(jnp.int32)             # (N, 12) i32
pool_t_f32 = pool_t_u16.astype(jnp.float32)           # (N, 12) f32
pool_t_b32 = jax.lax.bitcast_convert_type(            # (N, 6) i32
    pool_t_u16.reshape(-1, 6, 2), jnp.int32).reshape(-1, 6)

def row_gather(p):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    def f(idx):
        t = jax.lax.gather(p, idx[:, None], dn,
                           slice_sizes=(1, p.shape[1]),
                           mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return t.astype(jnp.int32).sum()
    return jax.jit(f)

out = {"rays": int(r), "pool_n": int(pool.shape[1])}
for name, p in (("u16", pool_t_u16), ("i32", pool_t_i32),
                ("f32", pool_t_f32), ("b32pairs", pool_t_b32)):
    f = row_gather(p)
    out[f"taps_{name}_ms"] = time_frames(lambda f=f: f(flat), n=8)
    print(json.dumps(out), flush=True)

# bitcast-pair correctness: unpack and compare against the u16 gather
dn = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
tb = jax.lax.gather(pool_t_b32, flat[:100][:, None], dn, slice_sizes=(1, 6),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
lo = (tb & 0xFFFF).astype(jnp.uint16)
hi = ((tb >> 16) & 0xFFFF).astype(jnp.uint16)
un = jnp.stack([lo, hi], axis=-1).reshape(100, 12)
tu = jax.lax.gather(pool_t_u16, flat[:100][:, None], dn, slice_sizes=(1, 12),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
out["b32_unpack_exact"] = bool(jnp.all(un == tu))
print(json.dumps(out), flush=True)
