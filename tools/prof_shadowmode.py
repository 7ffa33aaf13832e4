#!/usr/bin/env python
"""Round-5 probe: in-kernel vs scheduled shadow mode of the fused
frame at the two key scenes (dense suzanne 16 clusters, combined
config-3 80 clusters), plus fused-nm config 2."""
import dataclasses as dc
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                                 RenderConfig, SceneConfig,
                                                 reference_scene)
    from rust_wgpu_raytracing_tpu.core.camera import Camera
    from rust_wgpu_raytracing_tpu.core.scene import Scene
    from rust_wgpu_raytracing_tpu.ops.fusedframe import render_frame_fused
    from rust_wgpu_raytracing_tpu.ops.megakernel import render_megakernel
    from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

    W, H = 1920, 1080

    def uni_of(cfg, w=W, h=H):
        return jnp.asarray(Camera.from_config(
            cfg.camera, aspect=w / h).uniforms().flat())

    # dense suzanne (16 clusters)
    cfg = reference_scene(W, H, shadows=True)
    cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
    sd = Scene.build(cfg).data
    uni = uni_of(cfg)
    for mode in ("inkernel", "sched"):
        ms = time_frames(lambda: render_frame_fused(
            sd, uni, width=W, height=H, shadows=True, shadow_mode=mode),
            n=10, warmup=1)
        print(json.dumps({"scene": "dense16cl", "mode": mode,
                          "ms": round(ms, 3)}))

    # combined config 3 (80 clusters)
    cfg3 = SceneConfig(
        meshes=(MeshConfig(obj_path="suzanne_lowpoly.obj"),
                MeshConfig(obj_path="cube.obj",
                           translation=(0.0, -2.2, 0.0), scale=1.2)),
        camera=CameraConfig(eye=(0.0, 0.5, 3.0)),
        render=RenderConfig(width=W, height=H, shadows=True))
    sd3 = Scene.build(cfg3).data
    uni3 = uni_of(cfg3)
    for mode in ("inkernel", "sched"):
        ms = time_frames(lambda: render_frame_fused(
            sd3, uni3, width=W, height=H, shadows=True, shadow_mode=mode),
            n=10, warmup=1)
        print(json.dumps({"scene": "combined80cl", "mode": mode,
                          "ms": round(ms, 3)}))

    # config 2: suzanne nm 512 fused vs split, + 1080p nm fused
    for w, h in ((512, 512), (1920, 1080)):
        cfg2 = SceneConfig(
            meshes=(MeshConfig(obj_path="suzanne_lowpoly.obj",
                               normal_mapping=True),),
            camera=CameraConfig(eye=(0.0, 0.0, 2.5)),
            render=RenderConfig(width=w, height=h))
        sd2 = Scene.build(cfg2).data
        uni2 = uni_of(cfg2, w, h)
        for fused in (True, False):
            ms = time_frames(lambda: render_megakernel(
                sd2, uni2, width=w, height=h, normal_mapping=True,
                fused=fused), n=10, warmup=1)
            print(json.dumps({"scene": f"nm_{w}x{h}", "fused": fused,
                              "ms": round(ms, 3)}))


if __name__ == "__main__":
    main()
