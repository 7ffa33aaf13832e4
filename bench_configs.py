#!/usr/bin/env python
"""Benchmark all five BASELINE configs on the current device.

Prints one JSON object per config (bench.py remains the driver's
single-line headline metric).
"""

import dataclasses as dc
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import numpy as np

# optional config-name prefix filter: `python bench_configs.py 4 6`
# reruns only matching configs (fresh-process numbers for one config
# beat in-process interference from a long run)
ONLY = [a for a in sys.argv[1:] if not a.startswith("-")]


def _want(prefix) -> bool:
    return not ONLY or any(o.startswith(prefix) or prefix.startswith(o)
                           for o in ONLY)


def _git_sha():
    import subprocess
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=__file__.rsplit("/", 1)[0], capture_output=True,
            text=True).stdout.strip() or "unknown"
    except OSError:
        return "unknown"


GIT_SHA = _git_sha()


def bench_one(name, frame_fn, width, height, n=10, rays_factor=1.0):
    if not _want(name.split("_")[0]):
        return
    import jax

    from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

    timing = {}
    try:
        ms = time_frames(frame_fn, n=n, warmup=1, details=timing)
    except Exception as e:  # config too big for this chip etc.
        print(json.dumps({"config": name, "error": str(e)[:200],
                          "git_sha": GIT_SHA}))
        return
    rays = width * height * rays_factor
    print(json.dumps({
        "config": name,
        "frame_ms": round(ms, 3),
        "mrays_per_s": round(rays / ms / 1e3, 1),
        "size": [width, height],
        "git_sha": GIT_SHA,
        "timing": timing,
    }))


def main():
    import jax
    import jax.numpy as jnp

    from rust_wgpu_raytracing_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()

    from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                                 RenderConfig, SceneConfig,
                                                 cube_scene, reference_scene)
    from rust_wgpu_raytracing_tpu.core.camera import Camera
    from rust_wgpu_raytracing_tpu.core.scene import Scene
    from rust_wgpu_raytracing_tpu.ops.instances import (InstancedScene,
                                                        grid_transforms)
    from rust_wgpu_raytracing_tpu.ops.megakernel import render_megakernel
    from rust_wgpu_raytracing_tpu.ops.pathtrace import render_pathtrace

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu

    def uni_for(cfg, w, h):
        cam = Camera.from_config(cfg.camera, aspect=w / h)
        return jnp.asarray(cam.uniforms().flat())

    # 1. cube 256x256 primary-ray brute force
    if _want("1"):
        w = h = 256
        cfg = cube_scene(w, h)
        sd = Scene.build(cfg).data
        uni = uni_for(cfg, w, h)
        bench_one("1_cube_256_primary",
                  lambda: render_megakernel(sd, uni, width=w, height=h,
                                            interpret=interp), w, h)

    # 2. suzanne + normal mapping, 512x512, orbit camera
    if _want("2"):
        w = h = 512
        cfg = SceneConfig(
            meshes=(MeshConfig(obj_path="suzanne_lowpoly.obj",
                               normal_mapping=True),),
            camera=CameraConfig(eye=(0.0, 0.0, 2.5)),
            render=RenderConfig(width=w, height=h))
        sd2 = Scene.build(cfg).data
        uni2 = uni_for(cfg, w, h)
        bench_one("2_suzanne_nm_512",
                  lambda: render_megakernel(sd2, uni2, width=w, height=h,
                                            normal_mapping=True,
                                            interpret=interp), w, h)

    # 3. cube + suzanne combined, shadows, 1080p
    w, h = 1920, 1080
    if _want("3"):
        cfg = SceneConfig(
            meshes=(MeshConfig(obj_path="suzanne_lowpoly.obj"),
                    MeshConfig(obj_path="cube.obj",
                               translation=(0.0, -2.2, 0.0),
                               scale=1.2)),
            camera=CameraConfig(eye=(0.0, 0.5, 3.0)),
            render=RenderConfig(width=w, height=h, shadows=True))
        sd3 = Scene.build(cfg).data
        uni3 = uni_for(cfg, w, h)
        bench_one("3_combined_1080p_shadows",
                  lambda: render_megakernel(sd3, uni3, width=w, height=h,
                                            shadows=True,
                                            interpret=interp),
                  w, h, rays_factor=2.0)

    # 3b. DENSE-view suzanne + shadows (VERDICT r1 weak #4: the sparse
    # headline view is mostly a measurement of the culler; this one
    # fills the frame — hit_frac ~0.86 — for an honest Mrays/s figure)
    if _want("3"):
        cfg = reference_scene(w, h, shadows=True)
        cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
        sd3b = Scene.build(cfg).data
        uni3b = uni_for(cfg, w, h)
        bench_one("3b_dense_suzanne_1080p_shadows",
                  lambda: render_megakernel(sd3b, uni3b, width=w,
                                            height=h, shadows=True,
                                            interpret=interp),
                  w, h, rays_factor=2.0)

    # 4. path-traced suzanne, 4 bounces, 1080p (per 1-spp frame)
    if _want("4"):
        cfg = reference_scene(w, h)
        cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 2.5)))
        sd4 = Scene.build(cfg).data
        uni4 = uni_for(cfg, w, h)
        key = jax.random.PRNGKey(0)
        bench_one("4_pathtrace_1080p_4bounce_1spp",
                  lambda: render_pathtrace(sd4, uni4, key, width=w,
                                           height=h, bounces=4, spp=1,
                                           interpret=interp,
                                           compact_cap="auto"),
                  w, h, rays_factor=10.0)  # ~5 segments + 5 shadows

    # 5. 64-instance suzanne field with per-frame refit (stretch: 4K).
    # BOTH resolutions run (a round-4 `break` made the 1080p row dead
    # code — advisor finding); the refit cost (instantiate = transform
    # + SoA/cluster rebuild, the BVH-refit analogue) is also timed on
    # its own so the render and refit halves are separable.
    inst = (InstancedScene.from_config(
        MeshConfig(obj_path="suzanne_lowpoly.obj"), 64)
        if _want("5") else None)
    if inst is not None:
        from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

        angle_r = [0.0]

        def refit_only():
            angle_r[0] += 0.05
            return inst.instantiate(grid_transforms(
                64, spacing=2.5, z=-6.0, angle=angle_r[0])).tri_p0

        try:
            refit_ms = time_frames(refit_only, n=5, warmup=1)
            print(json.dumps({"config": "5_instances64_refit_only",
                              "refit_ms": round(refit_ms, 3),
                              "git_sha": GIT_SHA}))
        except Exception as e:
            print(json.dumps({"config": "5_instances64_refit_only",
                              "error": str(e)[:200], "git_sha": GIT_SHA}))
    for w, h, tag in (((3840, 2160, "4k"), (1920, 1080, "1080p"))
                      if _want("5") else ()):
        cfg5 = SceneConfig(camera=CameraConfig(eye=(0.0, 0.0, 18.0)),
                           render=RenderConfig(width=w, height=h))
        uni5 = uni_for(cfg5, w, h)
        angle = [0.0]

        def frame5(w=w, h=h, uni5=uni5, angle=angle):
            angle[0] += 0.05
            sd = inst.instantiate(grid_transforms(
                64, spacing=2.5, z=-6.0, angle=angle[0]))
            return render_megakernel(sd, uni5, width=w, height=h,
                                     interpret=interp)

        bench_one(f"5_instances64_refit_{tag}", frame5, w, h, n=5)

    # 6. large-scene stress: 522k-face procedural terrain (round 2).
    # Exercises the HBM-streaming kernels (face pack >> VMEM) and
    # compares acceleration strategies; the reference caps out at 428
    # faces, so this axis (SURVEY §5.7 long-axis scaling) is generated.
    w, h = 1920, 1080
    cfg6 = SceneConfig(
        meshes=(MeshConfig(obj_path="builtin:terrain:512",
                           translation=(0.0, 0.0, -3.0)),),
        camera=CameraConfig(eye=(0.0, -0.4, -1.2), target=(0.0, 0.0, -3.0)),
        render=RenderConfig(width=w, height=h))
    if _want("6"):
        sd6 = Scene.build(cfg6).data
        uni6 = uni_for(cfg6, w, h)
        for accel in ("cull", "bvh"):
            bench_one(f"6_terrain522k_1080p_{accel}",
                      lambda accel=accel: render_megakernel(
                          sd6, uni6, width=w, height=h, accel=accel,
                          interpret=interp), w, h, n=5)
        # shadows with a LOW SUN so occlusion is real (the default
        # light's shadow rays leave the heightfield without ever
        # hitting it — measured zero occluded pixels, i.e. a shadow
        # bench that casts no shadows; this sun shades ~4% of pixels
        # and exercises the any-hit early exit)
        cfg6s = dc.replace(cfg6, meshes=(dc.replace(
            cfg6.meshes[0], light_direction=(6.0, -1.0, 1.0)),))
        sd6s = Scene.build(cfg6s).data
        bench_one("6_terrain522k_1080p_shadows",
                  lambda: render_megakernel(sd6s, uni6, width=w, height=h,
                                            shadows=True,
                                            interpret=interp),
                  w, h, n=3, rays_factor=2.0)

    # 7. 2M-face terrain (round 2): only renderable since the streaming
    # record moved to a host-side precompute — assembling the 128-col
    # pack in-jit OOMed HBM with ~18 one-GB layout-padded temps.
    if _want("7"):
        cfg7 = SceneConfig(
            meshes=(MeshConfig(obj_path="builtin:terrain:1024",
                               translation=(0.0, 0.0, -3.0)),),
            camera=CameraConfig(eye=(0.0, -0.4, -1.2),
                                target=(0.0, 0.0, -3.0)),
            render=RenderConfig(width=w, height=h))
        sd7 = Scene.build(cfg7).data
        uni7 = uni_for(cfg7, w, h)
        bench_one("7_terrain2M_1080p_cull",
                  lambda: render_megakernel(sd7, uni7, width=w, height=h,
                                            interpret=interp), w, h, n=5)
        cfg7s = dc.replace(cfg7, meshes=(dc.replace(
            cfg7.meshes[0], light_direction=(6.0, -1.0, 1.0)),))
        sd7s = Scene.build(cfg7s).data
        bench_one("7_terrain2M_1080p_shadows",
                  lambda: render_megakernel(sd7s, uni7, width=w, height=h,
                                            shadows=True,
                                            interpret=interp),
                  w, h, n=3, rays_factor=2.0)

    # 8. path tracing at streaming scale (round 2): only usable since
    # the bounce wavefront is (origin, direction-octant) binned —
    # unsorted hemisphere-sampled tiles defeat interval culling
    # entirely (measured 18.7 s/spp; binned: ~3.3 s/spp).
    if _want("8"):
        w8, h8 = 960, 540
        cfg8 = SceneConfig(
            meshes=(MeshConfig(obj_path="builtin:terrain:512",
                               translation=(0.0, 0.0, -3.0),
                               light_direction=(6.0, -1.0, 1.0)),),
            camera=CameraConfig(eye=(0.0, -0.4, -1.2),
                                target=(0.0, 0.0, -3.0)),
            render=RenderConfig(width=w8, height=h8))
        sd8 = Scene.build(cfg8).data
        uni8 = uni_for(cfg8, w8, h8)
        key8 = jax.random.PRNGKey(0)
        bench_one("8_pt_terrain522k_540p_3bounce_1spp",
                  lambda: render_pathtrace(sd8, uni8, key8, width=w8,
                                           height=h8, bounces=3, spp=1,
                                           interpret=interp),
                  w8, h8, n=2, rays_factor=8.0)

    if _want("9"):
        # LBVH build time — a BASELINE.md "metrics to report" item. The
        # builder is host-side C++ (native/rtnative.cpp::lbvh_build),
        # Karras radix tree over Morton-sorted 32-face cluster leaves;
        # device-independent, reported alongside the frame metrics.
        import time as _time

        import numpy as np

        from rust_wgpu_raytracing_tpu.ops.bvh import build_lbvh

        def _expand(v):
            v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
            v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
            v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
            v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
            return v

        for n_terr, tag in ((512, "522k"), (1024, "2M")):
            cfgb = SceneConfig(
                meshes=(MeshConfig(obj_path=f"builtin:terrain:{n_terr}",
                                   translation=(0.0, 0.0, -3.0)),),
                render=RenderConfig(width=64, height=64))
            sb = Scene.build(cfgb).data
            lo = np.asarray(sb.blk_lo)
            hi = np.asarray(sb.blk_hi)
            fin = np.isfinite(lo).all(1) & np.isfinite(hi).all(1)
            lo, hi = lo[fin], hi[fin]
            c = (lo + hi) * 0.5
            el, eh = c.min(0), c.max(0)
            q = np.clip((c - el) / np.maximum(eh - el, 1e-12) * 1023.0,
                        0, 1023).astype(np.uint32)
            codes = ((_expand(q[:, 0]) << 2) | (_expand(q[:, 1]) << 1)
                     | _expand(q[:, 2]))
            order = np.argsort(codes, kind="stable")
            codes = codes[order].copy()
            lo, hi = lo[order].copy(), hi[order].copy()
            best = min(_timed(build_lbvh, codes, lo, hi, _time)
                       for _ in range(3))
            print(json.dumps({
                "config": f"9_lbvh_build_{tag}",
                "build_ms": round(best, 2),
                "cluster_leaves": int(len(codes)),
                "faces": int(sb.num_faces)}))


def _timed(fn, codes, lo, hi, _time):
    t0 = _time.perf_counter()
    fn(codes, lo, hi)
    return (_time.perf_counter() - t0) * 1e3


if __name__ == "__main__":
    main()
