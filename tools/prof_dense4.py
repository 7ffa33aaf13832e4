"""Dense 1080p suzanne+shadows STAGE BREAKDOWN: where do the ms beyond
the two Pallas sweeps go? Times each prefix of the split frame under
its own jit so the deltas attribute cost to expand/texshade/composite
glue vs the kernels, plus the fused-frame variant for reference.
Run on-chip (tools/tpu_round.sh); all timings amortized via
profiler.time_frames."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import jax, jax.numpy as jnp, numpy as np
from rust_wgpu_raytracing_tpu.config import reference_scene, CameraConfig
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.core.camera import Camera, CameraUniforms
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 1920, 1080
cfg = reference_scene(W, H, shadows=True)
cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
sd = Scene.build(cfg).data
cam = Camera.from_config(cfg.camera, aspect=W / H)
uni = jnp.asarray(cam.uniforms().flat())
uo = CameraUniforms.unflat(uni)

th, tw, hpad = mk._pick_tile_shape(W, H)
dx, dy, dz = mk.raygen_planar_tiled(W, hpad, uo, tile_h=th, tile_w=tw)
origin = uo.origin


def t(name, fn, n=10):
    f = jax.jit(fn)
    print(name, round(time_frames(f, n=n), 3), flush=True)


# 1. the sweep alone (t/face) — no winner expansion
t("sweep_tface", lambda: mk.gbuffer_pallas(sd, origin, dx, dy, dz).t)

# 2. sweep + winner expansion + spheres (what the frame consumes)
def gb_full():
    gb, sph = mk.gbuffer_pallas(sd, origin, dx, dy, dz, with_spheres=True)
    return gb.uvx + gb.uvy + gb.mat

t("sweep_expand", gb_full)

# 3. + texture shade (taps gather + texshade kernel)
def gb_shade():
    gb, sph = mk.gbuffer_pallas(sd, origin, dx, dy, dz, with_spheres=True)
    tex_base = mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_base[k])
    hw_h = mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_h[k])
    hw_w = mk._mat_const(sd, gb.mat, lambda k: sd.mat_tex_w[k])
    taps, fx, fy = mk.gather_packed_taps(sd.tex_packed, tex_base, hw_h,
                                         hw_w, gb.uvx, 1.0 - gb.uvy)
    lam = jnp.maximum(gb.nx, 0.0)
    z = jnp.zeros_like(lam)
    pr, pg, pb = mk._texshade_pallas(taps, fx, fy, lam, z, z, z, z,
                                     z, z, z)
    return pr

t("sweep_expand_shade", gb_shade)

# 4/5. full frame without/with shadows
t("frame_noshadow", lambda: mk.render_megakernel(
    sd, uni, width=W, height=H, shadows=False))
t("frame_shadow", lambda: mk.render_megakernel(
    sd, uni, width=W, height=H, shadows=True))

# 6. shadow any-hit alone on the real winner rays
gb, _ = mk.gbuffer_pallas(sd, origin, dx, dy, dz, with_spheres=True)
hit = jnp.isfinite(gb.t)
flip = gb.nd > 0.0
nx = jnp.where(flip, -gb.nx, gb.nx)
ny = jnp.where(flip, -gb.ny, gb.ny)
nz = jnp.where(flip, -gb.nz, gb.nz)
light = sd.mat_light[0]
ll = float(jnp.sqrt(jnp.sum(light ** 2)))
ts = jnp.where(hit, gb.t, 0.0)
park = 1e9
px = jnp.where(hit, origin[0] + dx * ts + nx * 1e-3, park)
py = jnp.where(hit, origin[1] + dy * ts + ny * 1e-3, park)
pz = jnp.where(hit, origin[2] + dz * ts + nz * 1e-3, park)
sdx = jnp.where(hit, -light[0] / ll, 0.0)
sdy = jnp.where(hit, -light[1] / ll, 0.0)
sdz = jnp.where(hit, -light[2] / ll, 0.0)
args = [jax.device_put(a) for a in (px, py, pz, sdx, sdy, sdz, hit)]
t("anyhit_alone", lambda: mk.anyhit_pallas(sd, *args))

# 7. the fused single-kernel frame variant (measured 21.9 ms in r2)
t("frame_fused", lambda: mk.render_megakernel(
    sd, uni, width=W, height=H, shadows=True, fused=True))
