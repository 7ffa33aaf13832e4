import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc, functools
import jax, jax.numpy as jnp
from rust_wgpu_raytracing_tpu.config import reference_scene, CameraConfig
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.core.camera import Camera, CameraUniforms
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

W, H = 1920, 1080
base = reference_scene(W, H, shadows=True)
base = dc.replace(base, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
cam = Camera.from_config(base.camera, aspect=W/H)
uni_np = cam.uniforms().flat()
sd = Scene.build(base).data

@functools.partial(jax.jit, static_argnames=("stage",))
def frame(scene, uni_flat, stage):
    uni = CameraUniforms.unflat(jnp.asarray(uni_flat, jnp.float32))
    th, tw, hpad = mk._pick_tile_shape(W, H)
    dx, dy, dz = mk.raygen_planar_tiled(W, hpad, uni, tile_h=th, tile_w=tw)
    gb = mk.gbuffer_pallas(scene, uni.origin, dx, dy, dz)
    if stage == "ch":
        return gb.t
    flip = gb.nd > 0.0
    nx = jnp.where(flip, -gb.nx, gb.nx)
    ny = jnp.where(flip, -gb.ny, gb.ny)
    nz = jnp.where(flip, -gb.nz, gb.nz)
    lightx = mk._mat_const(scene, gb.mat, lambda k: scene.mat_light[k, 0])
    lighty = mk._mat_const(scene, gb.mat, lambda k: scene.mat_light[k, 1])
    lightz = mk._mat_const(scene, gb.mat, lambda k: scene.mat_light[k, 2])
    lam, spec = mk.blinn_phong_planar(nx, ny, nz, dx, dy, dz,
                                      (lightx, lighty, lightz))
    tex_base = mk._mat_const(scene, gb.mat, lambda k: scene.mat_tex_base[k])
    hw_h = mk._mat_const(scene, gb.mat, lambda k: scene.mat_tex_h[k])
    hw_w = mk._mat_const(scene, gb.mat, lambda k: scene.mat_tex_w[k])
    amb = [mk._mat_const(scene, gb.mat, lambda k, i=i: scene.mat_ambient[k, i]) for i in range(3)]
    spc = [mk._mat_const(scene, gb.mat, lambda k, i=i: scene.mat_specular[k, i]) for i in range(3)]
    taps, fx, fy = mk.gather_packed_taps(scene.tex_packed, tex_base, hw_h,
                                         hw_w, gb.uvx, 1.0 - gb.uvy)
    if stage == "gather":
        return taps
    pr, pg, pb = mk._texshade_pallas(taps, fx, fy, lam, spec, *amb, *spc)
    if stage == "texshade":
        return pr
    # sphere passes + composite
    state_c = [jnp.zeros_like(pr), jnp.zeros_like(pr), jnp.zeros_like(pr),
               jnp.ones_like(pr)]
    for i in range(scene.num_spheres):
        t, hit, sx, sy, sz = mk.sphere_pass_planar(scene, i, uni.origin, dx, dy, dz)
        sl, ss = mk.blinn_phong_planar(sx, sy, sz, dx, dy, dz, scene.sphere_light[i])
        coeff = scene.sphere_coeff[i]; col = scene.sphere_color[i]
        sh = coeff[0] + coeff[1] * sl
        d = mk.to_nonlinear_depth(jnp.where(hit, t, 1.0), 0.01, 100.0)
        w = hit & (d < state_c[3])
        state_c = [jnp.where(w, col[0]*sh + coeff[2]*ss, state_c[0]),
                   jnp.where(w, col[1]*sh + coeff[2]*ss, state_c[1]),
                   jnp.where(w, col[2]*sh + coeff[2]*ss, state_c[2]),
                   jnp.where(w, d, state_c[3])]
    dm = mk.to_nonlinear_depth(jnp.where(jnp.isfinite(gb.t), gb.t, 1.0), 0.01, 100.0)
    w = jnp.isfinite(gb.t) & (dm < state_c[3])
    cr = jnp.where(w, pr, state_c[0])
    if stage == "composite":
        return cr
    return cr

for stage in ("ch", "gather", "texshade", "composite"):
    fn = lambda stage=stage: frame(sd, uni_np, stage)
    print(stage, round(time_frames(fn, n=10), 3), flush=True)
# reference: full real frames
fn = lambda: mk.render_megakernel(sd, jnp.asarray(uni_np), width=W, height=H, shadows=False, fused=False)
print("real_noshadow_split", round(time_frames(fn, n=10), 3), flush=True)
