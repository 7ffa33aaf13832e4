#!/usr/bin/env python
"""Round-5 probe: where does config 3 (cube+suzanne combined, 1080p,
shadows) lose vs the 16 ms bar? Times fused/split x shadows on/off and
reports hit_frac + cluster stats."""
import dataclasses as dc
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                                 RenderConfig, SceneConfig)
    from rust_wgpu_raytracing_tpu.core.camera import Camera
    from rust_wgpu_raytracing_tpu.core.scene import Scene
    from rust_wgpu_raytracing_tpu.ops.megakernel import render_megakernel
    from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

    W, H = 1920, 1080
    cfg = SceneConfig(
        meshes=(MeshConfig(obj_path="suzanne_lowpoly.obj"),
                MeshConfig(obj_path="cube.obj",
                           translation=(0.0, -2.2, 0.0), scale=1.2)),
        camera=CameraConfig(eye=(0.0, 0.5, 3.0)),
        render=RenderConfig(width=W, height=H, shadows=True))
    sd = Scene.build(cfg).data
    cam = Camera.from_config(cfg.camera, aspect=W / H)
    uni = jnp.asarray(cam.uniforms().flat())

    c, d = render_megakernel(sd, uni, width=W, height=H, shadows=True)
    hit = float(np.asarray(d < 1.0).mean())
    print(json.dumps({"hit_frac": round(hit, 4),
                      "clusters": int(sd.blk_lo.shape[0]),
                      "f_pad": int(sd.tri_p0.shape[0])}))

    for fused in (True, False):
        for shadows in (True, False):
            fn = lambda: render_megakernel(sd, uni, width=W, height=H,
                                           shadows=shadows, fused=fused)
            ms = time_frames(fn, n=10, warmup=1)
            print(json.dumps({"fused": fused, "shadows": shadows,
                              "ms": round(ms, 3)}))
    # accel variants on the fused path
    for accel in ("bvh", "brute"):
        fn = lambda: render_megakernel(sd, uni, width=W, height=H,
                                       shadows=True, fused=True, accel=accel)
        ms = time_frames(fn, n=10, warmup=1)
        print(json.dumps({"fused": True, "shadows": True, "accel": accel,
                          "ms": round(ms, 3)}))


if __name__ == "__main__":
    main()
