import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import jax, jax.numpy as jnp, numpy as np
from rust_wgpu_raytracing_tpu.config import reference_scene, CameraConfig
from rust_wgpu_raytracing_tpu.core import scene as scene_mod
from rust_wgpu_raytracing_tpu.core.camera import Camera, CameraUniforms
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 1920, 1080
cfg = reference_scene(W, H, shadows=True)
cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
cam = Camera.from_config(cfg.camera, aspect=W/H)
uni = jnp.asarray(cam.uniforms().flat())
uo = CameraUniforms.unflat(uni)
th, tw, hpad = mk._pick_tile_shape(W, H)
dx, dy, dz = mk.raygen_planar_tiled(W, hpad, uo, tile_h=th, tile_w=tw)

import unittest.mock as mock
for cb in (32, 16, 8):
    with mock.patch.object(scene_mod, "CULL_BLOCK", cb):
        sd = scene_mod.Scene.build(cfg).data
    assert sd.blk_lo.shape[0] == sd.padded_faces // cb
    fn = jax.jit(lambda sd=sd, cb=cb: mk.gbuffer_pallas(
        sd, uo.origin, dx, dy, dz, block_f=cb).t)
    t = time_frames(fn, n=10)
    # count mean admitted clusters per tile for context
    mask, nw = mk._mask_words(sd, "cull", uo.origin[0], uo.origin[1],
                              uo.origin[2], dx, dy, dz, 1024, cb,
                              sd.padded_faces)
    m = np.asarray(mask).reshape(-1, nw)
    bits = np.unpackbits(m.astype(">i4").view(np.uint8), axis=1)
    print(f"block_f={cb}: gbuffer {t:.3f} ms, mean admitted faces/tile "
          f"{bits.sum(1).mean()*cb:.0f}", flush=True)
