#!/usr/bin/env python
"""End-to-end demo of every major capability. Writes PNGs to ./out.

    python examples/demo.py                 # auto backend (TPU if available)
    python examples/demo.py --small --cpu   # fast local run

On CPU the Pallas kernels run in interpret mode — use --small. (--cpu
forces the CPU platform even when a tunneled-TPU sitecustomize presets
jax_platforms; a plain JAX_PLATFORMS=cpu env var would be overridden.)
"""

import argparse
import dataclasses as dc
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny sizes for CPU/interpret runs")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (interpret-mode kernels)")
    ap.add_argument("--window", action="store_true",
                    help="open the interactive desktop window (needs a "
                         "display; WASD/arrows orbit, close to continue)")
    ap.add_argument("--out", default="out")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import rust_wgpu_raytracing_tpu as rwrt
    from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                                 RenderConfig, SceneConfig,
                                                 reference_scene)
    from rust_wgpu_raytracing_tpu.core.camera import Camera
    from rust_wgpu_raytracing_tpu.core.scene import Scene
    from rust_wgpu_raytracing_tpu.io import write_png

    big = not args.small
    W, H = (1920, 1080) if big else (256, 128)
    print(f"backend: {jax.default_backend()}  size: {W}x{H}")

    def save(name, fb):
        path = os.path.join(args.out, name)
        write_png(path, np.asarray(fb))
        print("wrote", path)

    # 1. the reference live scene, orbit a few steps out of suzanne's head
    r = rwrt.Renderer(dc.replace(reference_scene(W, H, shadows=big),
                                 camera=CameraConfig(eye=(0.0, 0.0, 2.5))))
    color, _ = r.render(block=True)
    save("1_reference_scene.png", color)
    print(f"   frame (incl. one sync round trip): {r.last_frame_ms:.1f} ms")

    if args.window:
        # interactive desktop shell (the winit-window analogue); on a
        # headless host fall back to the HTTP shell instructions
        from rust_wgpu_raytracing_tpu.runtime.window import Window
        try:
            Window(r).run()
        except RuntimeError as err:
            print(f"   ({err})")

    # 2. normal mapping on the bump-mapped cube
    cfg = SceneConfig(
        meshes=(MeshConfig(obj_path="cube.obj", translation=(0, 0, -3.0),
                           scale=0.6, normal_mapping=True),),
        render=RenderConfig(width=W, height=H))
    try:
        r2 = rwrt.Renderer(cfg)
        c2, _ = r2.render()
        save("2_normal_mapped_cube.png", c2)
    except FileNotFoundError:
        print("   (cube.obj asset not found; skipped)")

    # 3. progressive path tracing
    cfg = dc.replace(reference_scene(W, H),
                     camera=CameraConfig(eye=(0.0, 0.0, 2.5)))
    cfg = dc.replace(cfg, render=dc.replace(cfg.render, pt_bounces=3,
                                            pt_spp=8))
    r3 = rwrt.Renderer(cfg)
    for _ in range(8 if big else 2):
        c3, _ = r3.render()
    save("3_pathtraced.png", c3)

    # 4. 16-instance animated field with per-frame refit
    from rust_wgpu_raytracing_tpu.ops.instances import (InstancedScene,
                                                        grid_transforms)
    from rust_wgpu_raytracing_tpu.ops.megakernel import render_megakernel

    inst = InstancedScene.from_config(
        MeshConfig(obj_path="suzanne_lowpoly.obj"), 16)
    cam = Camera.from_config(CameraConfig(eye=(0.0, 0.0, 10.0)),
                             aspect=W / H)
    sd = inst.instantiate(grid_transforms(16, spacing=2.5, z=-4.0,
                                          angle=0.5))
    c4, _ = render_megakernel(sd, jnp.asarray(cam.uniforms().flat()),
                              width=W, height=H,
                              interpret=jax.default_backend() != "tpu")
    save("4_instances.png", c4)

    # 5. checkpoint round trip
    from rust_wgpu_raytracing_tpu.io import load_checkpoint, save_checkpoint

    ck = os.path.join(args.out, "demo.ckpt.npz")
    save_checkpoint(ck, r)
    r5 = load_checkpoint(ck)
    print("checkpoint restored: frame", r5.frame_count, "eye", r5.camera.eye)

    # 6. large procedural scene (HBM-streamed face pack) with the LBVH
    # acceleration path — way beyond the reference's 428-face maximum
    grid_n = 512 if big else 48
    cfg = SceneConfig(
        meshes=(MeshConfig(obj_path=f"builtin:terrain:{grid_n}",
                           translation=(0.0, 0.0, -3.0)),),
        camera=CameraConfig(eye=(0.0, -0.4, -1.2), target=(0.0, 0.0, -3.0)),
        render=RenderConfig(width=W, height=H, accel="bvh",
                            shadows=not big))
    r6 = rwrt.Renderer(cfg, backend="megakernel")
    c6, _ = r6.render(block=True)
    nf = r6.scene.data.num_faces
    save("6_terrain_bvh.png", c6)
    print(f"   {nf:,} faces, accel=bvh, streamed="
          f"{r6.scene.data.padded_faces > 16384}: {r6.last_frame_ms:.1f} ms")

    # 7. geometry-parallel frame: the face soup sharded over every
    # visible device (parallel/geometry_sharding.py) — bit-identical
    # to the single-chip frame; only meaningful with >1 device
    if len(jax.devices()) > 1:
        r7 = rwrt.Renderer(cfg, backend="megakernel_gp")
        c7, _ = r7.render(block=True)
        save("7_terrain_gp.png", c7)
        same = bool(np.array_equal(np.asarray(c6), np.asarray(c7)))
        print(f"   gp over {len(jax.devices())} devices: "
              f"{r7.last_frame_ms:.1f} ms, bitwise == single: {same}")


if __name__ == "__main__":
    main()
