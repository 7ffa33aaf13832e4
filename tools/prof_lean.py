import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import jax, jax.numpy as jnp
import unittest.mock as mock
from rust_wgpu_raytracing_tpu.config import reference_scene, CameraConfig
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.core.camera import Camera, CameraUniforms
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

INT_MISS = 2**31 - 1
F32_INF = float("inf")

def _ch_block_lean(g, o, dx, dy, dz, face_base,
                   t_ref, face_ref, u_ref, v_ref, nd_ref,
                   uvx_ref, uvy_ref, nx_ref, ny_ref, nz_ref, mat_ref,
                   nm_refs):
    def col(m, k):
        return m[:, k:k + 1]
    ndotd = col(g, 0) * dx + col(g, 1) * dy + col(g, 2) * dz
    t = col(o, 0) / ndotd
    h0 = col(o, 1) + t * (col(g, 3) * dx + col(g, 4) * dy + col(g, 5) * dz)
    h1 = col(o, 2) + t * (col(g, 6) * dx + col(g, 7) * dy + col(g, 8) * dz)
    h2 = col(o, 3) + t * (col(g, 9) * dx + col(g, 10) * dy + col(g, 11) * dz)
    valid = ((jnp.abs(ndotd) >= 1e-9) & (t >= 0.0)
             & (h0 >= 0.0) & (h1 >= 0.0) & (h2 >= 0.0))
    tm = jnp.where(valid, t, F32_INF)
    tmin = jnp.min(tm, axis=0, keepdims=True)
    face_ids = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
    idx_blk = jnp.min(jnp.where(tm == tmin, face_ids, INT_MISS), axis=0,
                      keepdims=True)
    win = face_ids == idx_blk
    def pick(m):
        return jnp.sum(jnp.where(win, m, 0.0), axis=0, keepdims=True)
    invd = col(g, 12)
    u_n = h1 * invd
    v_n = h2 * invd
    w_n = 1.0 - u_n - v_n
    uvx_m = u_n * col(g, 16) + v_n * col(g, 18) + w_n * col(g, 20)
    uvy_m = u_n * col(g, 17) + v_n * col(g, 19) + w_n * col(g, 21)
    prev_t = t_ref[:].reshape(1, -1)
    new_face = idx_blk + face_base
    better = ((tmin < prev_t) | ((tmin == prev_t)
              & (new_face < face_ref[:].reshape(1, -1)))).reshape(-1)
    def merge(ref, new):
        ref[:] = jnp.where(better, new.reshape(-1), ref[:])
    merge(t_ref, tmin)
    merge(face_ref, new_face)
    merge(nd_ref, pick(ndotd))
    merge(uvx_ref, pick(uvx_m))
    merge(uvy_ref, pick(uvy_m))
    merge(nx_ref, pick(jnp.broadcast_to(col(g, 13), tm.shape)))
    merge(ny_ref, pick(jnp.broadcast_to(col(g, 14), tm.shape)))
    merge(nz_ref, pick(jnp.broadcast_to(col(g, 15), tm.shape)))
    merge(mat_ref, pick(jnp.broadcast_to(col(g, 22), tm.shape)))
    # u/v picks skipped (frame never reads them)

W, H = 1920, 1080
base = reference_scene(W, H, shadows=True)
base = dc.replace(base, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
cam = Camera.from_config(base.camera, aspect=W/H)
sd = Scene.build(base).data
uo = CameraUniforms.unflat(jnp.asarray(cam.uniforms().flat()))
th, tw, hpad = mk._pick_tile_shape(W, H)
dx, dy, dz = mk.raygen_planar_tiled(W, hpad, uo, tile_h=th, tile_w=tw)

gb = lambda: mk.gbuffer_pallas(sd, uo.origin, dx, dy, dz).t
print("full_ch", round(time_frames(gb, n=10), 3), flush=True)
jax.clear_caches()
with mock.patch.object(mk, "_ch_block", _ch_block_lean):
    print("lean_ch", round(time_frames(gb, n=10), 3), flush=True)
