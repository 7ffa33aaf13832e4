"""Reconcile two measurements that cannot both be true (round 5):

- the fused frame (dense suzanne 1080p, shadows) = 13.7 ms TOTAL
  (BENCH_CONFIGS_r5 config 3b), and it contains gather_packed_taps
  over ~2.07M rays (fusedframe.py XLA tail);
- the SAME gather standalone = ~37 ms (prof_pt_gathers/prof_texdtype:
  layout-, dtype-, and locality-immune, ~18 ns/index).

Times: (a) the full fused frame; (b) the gather+texshade tail
standalone on the frame's own uv/mat planes; (c) the bare gather; and
(d) a pool-size ladder (same 2M indices, pool rows 128..262144) to
find where the fast small-table emitter ends. Prints optimized-HLO
gather lines for (b) and for the fused frame to diff the lowering.
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
from rust_wgpu_raytracing_tpu.ops import fusedframe as ff
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 1920, 1080
cfg = reference_scene(W, H, shadows=True)
cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
sd = Scene.build(cfg).data
cam = Camera.from_config(cfg.camera, W / H)
uni = jnp.asarray(cam.uniforms().flat())

out = {}

# (a) full fused frame
jf = jax.jit(lambda u: ff.render_frame_fused(sd, u, width=W, height=H,
                                             shadows=True))
out["fused_frame_ms"] = time_frames(lambda: jf(uni), n=10)
print(json.dumps(out), flush=True)

# pull the frame's own uv/mat planes via the split gbuffer
uo = CameraUniforms.unflat(uni)
tile = mk._pick_tile_shape(W, H)
r = W * (tile[2] if tile else H)
ys = jnp.arange(r, dtype=jnp.int32)
from rust_wgpu_raytracing_tpu.ops.raygen import ray_directions
d = ray_directions(W, H, uo)
dx, dy, dz = (d[..., i].reshape(-1) for i in range(3))
gb = mk.gbuffer_pallas(sd, uo.origin, dx[:r], dy[:r], dz[:r])

tex_base = mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_base[k])
hw_h = mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_h[k])
hw_w = mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_w[k])
ones = jnp.ones((r,), jnp.float32)

# (b) gather + texshade, exactly the fused tail's compose
def tail(mat, u, v):
    taps, fx, fy = mk.gather_packed_taps(sd.tex_packed, tex_base,
                                         hw_h, hw_w, u, 1.0 - v)
    mr, mg, mb = mk._texshade_pallas(taps, fx, fy, ones, ones,
                                     ones, ones, ones, ones, ones, ones)
    return mr + mg + mb

jt = jax.jit(lambda m, u, v: tail(m, u, v).sum())
out["tail_gather_texshade_ms"] = time_frames(
    lambda: jt(gb.mat, gb.uvx, gb.uvy), n=8)
print(json.dumps(out), flush=True)

# (c) bare gather on the same indices
def bare(mat, u, v):
    taps, fx, fy = mk.gather_packed_taps(sd.tex_packed, tex_base,
                                         hw_h, hw_w, u, 1.0 - v)
    return taps.astype(jnp.int32).sum() + (fx + fy).sum()

jb = jax.jit(bare)
out["bare_gather_ms"] = time_frames(lambda: jb(gb.mat, gb.uvx, gb.uvy), n=8)
print(json.dumps(out), flush=True)

# (d) pool-rows ladder, fixed 2M indices, row gather (1, 12)
dn = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
for rows in (128, 1024, 8192, 65536, 262144):
    p = jnp.zeros((rows, 12), jnp.float32) + 1.0
    idx = (jnp.arange(r, dtype=jnp.int32) * 40503) % rows
    f = jax.jit(lambda i, p=p: jax.lax.gather(
        p, i[:, None], dn, slice_sizes=(1, 12),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS).sum())
    out[f"ladder_{rows}_ms"] = time_frames(lambda f=f, idx=idx: f(idx), n=8)
    print(json.dumps(out), flush=True)

# HLO of the bare gather vs the fused frame: what did each lower to?
txt = jb.lower(gb.mat, gb.uvx, gb.uvy).compile().as_text()
glines = [l.strip()[:240] for l in txt.splitlines() if "gather" in l]
print("BARE GATHER HLO:", *glines[:8], sep="\n  ", flush=True)
txt2 = jf.lower(uni).compile().as_text()
glines2 = [l.strip()[:240] for l in txt2.splitlines() if "gather" in l]
print("FUSED FRAME HLO:", *glines2[:10], sep="\n  ", flush=True)
