#!/usr/bin/env python
"""Generate the committed golden-image fixtures (VERDICT r1 next #4).

Renders BASELINE configs 1-3 with the ORACLE (pure-jnp transcription of
the reference WGSL, ops/oracle.py) on CPU at small resolution and
writes bit-exact PNGs under tests/goldens/. tests/test_goldens.py
compares both the oracle and the Pallas megakernel against these pixel
for pixel, so any regression in camera math, intersection, shading,
texturing, compositing, or quantization fails loudly.

The true wgpu reference output was never capturable in this
environment (no GPU, zero egress); these goldens pin OUR reading of
the reference — see COVERAGE.md for the validation caveat.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def golden_configs():
    """name -> (SceneConfig, render kwargs). Small-res versions of
    BASELINE configs 1-3 (cheap enough for CI on CPU)."""
    import dataclasses as dc

    from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                                 RenderConfig, SceneConfig,
                                                 cube_scene, reference_scene)

    out = {}

    # config 1: cube, fixed camera, primary rays, brute force
    out["config1_cube"] = cube_scene(160, 160)

    # config 2: suzanne with normal mapping, orbit viewpoint
    out["config2_suzanne_nm"] = SceneConfig(
        meshes=(MeshConfig(obj_path="suzanne_lowpoly.obj",
                           normal_mapping=True),),
        camera=CameraConfig(eye=(0.0, 0.0, 2.5)),
        render=RenderConfig(width=160, height=160))

    # config 3: cube + suzanne combined, hard shadows
    out["config3_combined_shadows"] = SceneConfig(
        meshes=(MeshConfig(obj_path="suzanne_lowpoly.obj"),
                MeshConfig(obj_path="cube.obj", translation=(0.0, -2.2, 0.0),
                           scale=1.2)),
        camera=CameraConfig(eye=(0.0, 0.5, 3.0)),
        render=RenderConfig(width=160, height=160, shadows=True))

    # the reference live scene (spheres + suzanne), shadowless parity
    ref = reference_scene(160, 160)
    out["reference_scene"] = dc.replace(
        ref, camera=CameraConfig(eye=(0.0, 0.0, 2.5)))

    # procedural terrain under the low sun (the round-2 large-scene
    # family at CI scale): pins cast-shadow semantics — including the
    # exactness of the shadow-relevance gate — against the oracle
    out["terrain_shadows"] = SceneConfig(
        meshes=(MeshConfig(obj_path="builtin:terrain:23",
                           translation=(0.0, 0.0, -3.0),
                           light_direction=(6.0, -1.0, 1.0)),),
        camera=CameraConfig(eye=(0.0, -2.0, -1.0), target=(0.0, 0.0, -3.2)),
        render=RenderConfig(width=160, height=160, shadows=True))
    return out


def render_golden(cfg):
    import jax.numpy as jnp

    from rust_wgpu_raytracing_tpu.core.camera import Camera
    from rust_wgpu_raytracing_tpu.core.scene import Scene
    from rust_wgpu_raytracing_tpu.ops.oracle import render_oracle

    rc = cfg.render
    scene = Scene.build(cfg)
    cam = Camera.from_config(cfg.camera, aspect=rc.width / rc.height)
    uni = jnp.asarray(cam.uniforms().flat())
    nm = any(m.normal_mapping for m in cfg.meshes)
    color, _ = render_oracle(scene.data, uni, width=rc.width,
                             height=rc.height, shadows=rc.shadows,
                             normal_mapping=nm)
    return np.asarray(color)


def main():
    from rust_wgpu_raytracing_tpu.io.image_out import write_png

    gold_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens")
    os.makedirs(gold_dir, exist_ok=True)
    for name, cfg in golden_configs().items():
        fb = render_golden(cfg)
        path = os.path.join(gold_dir, f"{name}.png")
        write_png(path, fb, srgb=True)
        print(f"wrote {path}  nonzero_frac={float((fb > 0).mean()):.3f}")


if __name__ == "__main__":
    main()
