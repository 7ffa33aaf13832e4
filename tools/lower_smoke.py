"""Cross-platform (CPU-host) Mosaic lowering smoke tests for every
kernel path changed this round: streamed CH (shared + per-ray),
streamed any-hit, VMEM CH (+fused spheres), VMEM per-ray, VMEM any-hit,
fused extend+shadow — catches tpu-dialect verification errors without
the chip."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                             RenderConfig, SceneConfig,
                                             reference_scene)
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.core.camera import Camera, CameraUniforms
from rust_wgpu_raytracing_tpu.ops import megakernel as mk

def lower(name, fn, *args):
    try:
        jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
        print(f"{name}: OK", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:1200]}",
              flush=True)
        return False

ok = True

# streamed scene (SUPER_F aligned)
cfg = SceneConfig(
    meshes=(MeshConfig(obj_path="builtin:terrain:128",
                       translation=(0.0, 0.0, -3.0),
                       light_direction=(6.0, -1.0, 1.0)),),
    camera=CameraConfig(eye=(0.0, -0.4, -1.2), target=(0.0, 0.0, -3.0)),
    render=RenderConfig(width=128, height=128))
sd = Scene.build(cfg).data
cam = Camera.from_config(cfg.camera, aspect=1.0)
uo = CameraUniforms.unflat(jnp.asarray(cam.uniforms().flat()))
dx, dy, dz = mk.raygen_planar(128, 128, uo)
act = jnp.ones(dx.shape, bool)

ok &= lower("streamed CH", lambda s, o, a, b, c:
            mk.gbuffer_pallas(s, o, a, b, c).t, sd, uo.origin, dx, dy, dz)
ok &= lower("streamed CH perray", lambda s, a, b, c, d, e, f:
            mk.gbuffer_perray_pallas(s, a, b, c, d, e, f).t,
            sd, dx, dy, dz, dx, dy, dz)
ok &= lower("streamed anyhit", lambda s, a, b, c, d, e, f, g:
            mk.anyhit_pallas(s, a, b, c, d, e, f, g),
            sd, dx, dy, dz, dx, dy, dz, act)
ok &= lower("streamed frame+shadows", lambda s, u:
            mk.render_megakernel(s, u, width=128, height=128,
                                 shadows=True)[0],
            sd, jnp.asarray(cam.uniforms().flat()))

# VMEM scene with spheres (reference)
cfg2 = reference_scene(128, 128, shadows=True)
cfg2 = __import__("dataclasses").replace(
    cfg2, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
sd2 = Scene.build(cfg2).data
cam2 = Camera.from_config(cfg2.camera, aspect=1.0)
uni2 = jnp.asarray(cam2.uniforms().flat())
uo2 = CameraUniforms.unflat(uni2)
dx2, dy2, dz2 = mk.raygen_planar(128, 128, uo2)

ok &= lower("vmem frame+spheres+shadows", lambda s, u:
            mk.render_megakernel(s, u, width=128, height=128,
                                 shadows=True)[0], sd2, uni2)
ok &= lower("vmem extend_shadow (PT fused)",
            lambda s, a, b, c, d, e, f, g:
            mk.extend_shadow_pallas(s, a, b, c, d, e, f,
                                    a, b, c, d, e, f, g)[0].t,
            sd2, dx2, dy2, dz2, dx2, dy2, dz2, act)
ok &= lower("vmem CH bvh accel", lambda s, o, a, b, c:
            mk.gbuffer_pallas(s, o, a, b, c, accel="bvh").t,
            sd2, uo2.origin, dx2, dy2, dz2)
ok &= lower("fused frame+shadows", lambda s, u:
            mk.render_megakernel(s, u, width=128, height=128,
                                 shadows=True, fused=True)[0], sd2, uni2)

# instanced refit (bench config 5's jit program: device-side refit +
# in-jit gpack refresh + render)
from rust_wgpu_raytracing_tpu.ops.instances import (InstancedScene,
                                                    grid_transforms)
try:
    inst = InstancedScene.from_config(
        MeshConfig(obj_path="suzanne_lowpoly.obj"), 4)
    cfg5 = SceneConfig(camera=CameraConfig(eye=(0.0, 0.0, 18.0)),
                       render=RenderConfig(width=128, height=128))
    cam5 = Camera.from_config(cfg5.camera, aspect=1.0)
    uni5 = jnp.asarray(cam5.uniforms().flat())
    tr = grid_transforms(4, spacing=2.5, z=-6.0, angle=0.1)

    def refit_frame(uni, tr):
        sdi = inst.instantiate(tr)
        return mk.render_megakernel(sdi, uni, width=128, height=128)[0]

    ok &= lower("instanced refit frame", refit_frame, uni5, tr)
except FileNotFoundError:
    print("instanced refit frame: SKIPPED (asset missing)", flush=True)

print("ALL OK" if ok else "SOME FAILED", flush=True)
