"""Round-5 config-4 deep dive: the two per-bounce gathers.

prof_pt4 at HEAD: per-bounce cost ~45 ms of which the Pallas sweep is
~2 ms; the rest is (a) expand_tf_gbuffer's winner-attribute gather and
(b) the albedo sample_packed_texture gather (36 ms standalone?!).
This probes each in isolation plus the candidate replacements:

- expand: jnp.take row-gather vs ONE-HOT MATMUL (idx==iota -> f32
  dot at HIGHEST precision; bit-exact selection, rides the MXU —
  scene face tables are tiny (128 faces here) so the contraction is
  (R,F)x(F,37) at trivial FLOPs but zero per-index cost);
- albedo: taps gather alone vs filter alone vs the composed sampler,
  and the same gather with all indices clamped to 0 (locality probe).

Run with RT_TEX_ROW_GATHER=0/1 to A/B the tap layouts.
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
uni = jnp.asarray(cam.uniforms().flat())
uo = CameraUniforms.unflat(uni)
key = jax.random.PRNGKey(0)
tile = mk._pick_tile_shape(W, H)
r = W * (tile[2] if tile else H)
dx, dy, dz = pt._jittered_dirs(W, H, uo, key, tile)
gb = mk.gbuffer_pallas(sd, uo.origin, dx, dy, dz)
hit = jnp.isfinite(gb.t)
t_f = jnp.where(hit, gb.t, jnp.float32(np.inf))
face = gb.face

gp = mk._gpack_stream(sd)
print(json.dumps({"gpack_shape": list(gp.shape),
                  "tex_pool_shape": list(sd.tex_packed.shape),
                  "row_gather": mk.TEX_ROW_GATHER,
                  "rays": int(r)}), flush=True)

out = {}

# ---- expand: consume every plane PT uses so nothing DCEs ----
def consume(g):
    return (g.t + g.nd + g.uvx + g.uvy + g.nx + g.ny + g.nz
            + g.mat).sum()

jtake = jax.jit(lambda t, f: consume(mk.expand_tf_gbuffer(
    sd, t, f, dx, dy, dz, oxyz=(dx, dy, dz))))
out["expand_take_all_rows"] = time_frames(lambda: jtake(t_f, face), n=8)

# one-hot matmul replacement for the row gather
def expand_onehot(t, f):
    idx = jnp.clip(f, 0, gp.shape[1] - 1)
    oh = (idx[:, None] == jnp.arange(gp.shape[1], dtype=jnp.int32)
          [None, :]).astype(jnp.float32)
    a = jax.lax.dot_general(oh, gp.T, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST).T
    return a

jmm = jax.jit(lambda t, f: expand_onehot(t, f).sum())
out["expand_onehot_mm_sum"] = time_frames(lambda: jmm(t_f, face), n=8)

# bit-exactness of the selection on this chip
a_take = jnp.take(gp.T, jnp.clip(face, 0, gp.shape[1] - 1), axis=0).T
a_mm = jax.jit(expand_onehot)(t_f, face)
out["onehot_bitexact"] = float(jnp.all(a_take == a_mm))
print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                  for k, v in out.items()}), flush=True)

# ---- albedo path, exactly as render_pathtrace composes it ----
def albedo(mat, u, v):
    tex_base = mk._mat_const(sd, mat, lambda k: sd.mat_tex_base[k])
    hw_h = mk._mat_const(sd, mat, lambda k: sd.mat_tex_h[k])
    hw_w = mk._mat_const(sd, mat, lambda k: sd.mat_tex_w[k])
    ar, ag, ab = mk.sample_packed_texture(sd.tex_packed, tex_base,
                                          hw_h, hw_w, u, 1.0 - v)
    return (ar + ag + ab).sum()

jal = jax.jit(albedo)
out["albedo_composed"] = time_frames(
    lambda: jal(gb.mat, gb.uvx, gb.uvy), n=8)

def taps_only(mat, u, v):
    tex_base = mk._mat_const(sd, mat, lambda k: sd.mat_tex_base[k])
    hw_h = mk._mat_const(sd, mat, lambda k: sd.mat_tex_h[k])
    hw_w = mk._mat_const(sd, mat, lambda k: sd.mat_tex_w[k])
    taps, fx, fy = mk.gather_packed_taps(sd.tex_packed, tex_base,
                                         hw_h, hw_w, u, 1.0 - v)
    return taps.astype(jnp.int32).sum() + (fx + fy).sum()

jtaps = jax.jit(taps_only)
out["albedo_taps_only"] = time_frames(
    lambda: jtaps(gb.mat, gb.uvx, gb.uvy), n=8)

# same gather, all indices 0 (locality / index-spread probe)
def taps_zero(u):
    flat = jnp.zeros((r,), jnp.int32) + (u * 0).astype(jnp.int32)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(1,), start_index_map=(1,))
    taps = jax.lax.gather(
        sd.tex_packed, flat[:, None], dn, slice_sizes=(12, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return taps.astype(jnp.int32).sum()

jz = jax.jit(taps_zero)
out["taps_gather_idx0"] = time_frames(lambda: jz(gb.uvx), n=8)

# filter alone
taps, fx, fy = jax.jit(lambda u, v: mk.gather_packed_taps(
    sd.tex_packed,
    mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_base[k]),
    mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_h[k]),
    mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_w[k]),
    u, 1.0 - v))(gb.uvx, gb.uvy)
jf = jax.jit(lambda t, x, y: sum(mk._texfilter_pallas(t, x, y)).sum())
out["texfilter_only"] = time_frames(lambda: jf(taps, fx, fy), n=8)

print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                  for k, v in out.items()}), flush=True)
