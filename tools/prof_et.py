import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from rust_wgpu_raytracing_tpu.config import reference_scene, CameraConfig
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.core.camera import Camera, CameraUniforms
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames
import unittest.mock as mock

W, H = 1920, 1080
base = reference_scene(W, H, shadows=True)
base = dc.replace(base, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
cam = Camera.from_config(base.camera, aspect=W/H)
uni = jnp.asarray(cam.uniforms().flat())
sd = Scene.build(base).data
uo = CameraUniforms.unflat(uni)
th, tw, hpad = mk._pick_tile_shape(W, H)
dx, dy, dz = mk.raygen_planar_tiled(W, hpad, uo, tile_h=th, tile_w=tw)

F32_INF = float("inf")

def loop_no_et(tlb_ref, order_ref, nb, visit, bound_fn):
    def body(p, c):
        cidx = order_ref[0, 0, p]
        @pl.when(tlb_ref[0, 0, cidx] < F32_INF)
        def _():
            visit(cidx)
        return c
    jax.lax.fori_loop(0, nb, body, 0)

def loop_et_k(k):
    # early-exit bound re-evaluated every k-th visit only
    def loop(tlb_ref, order_ref, nb, visit, bound_fn):
        def cond(p):
            c = order_ref[0, 0, jnp.minimum(p, nb - 1)]
            t = tlb_ref[0, 0, c]
            chk = jnp.logical_or((p % k) != 0, t <= bound_fn())
            return jnp.logical_and(p < nb, jnp.logical_and(t < F32_INF, chk))
        def body(p):
            visit(order_ref[0, 0, p])
            return p + 1
        jax.lax.while_loop(cond, body, jnp.int32(0))
    return loop

gb = lambda: mk.gbuffer_pallas(sd, uo.origin, dx, dy, dz).t
print("ET(current)", round(time_frames(gb, n=10), 3), flush=True)
jax.clear_caches()
with mock.patch.object(mk, "_ordered_cluster_loop", loop_no_et):
    print("no_ET", round(time_frames(gb, n=10), 3), flush=True)
jax.clear_caches()
with mock.patch.object(mk, "_ordered_cluster_loop", loop_et_k(4)):
    print("ET_every4", round(time_frames(gb, n=10), 3), flush=True)
