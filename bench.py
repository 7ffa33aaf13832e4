#!/usr/bin/env python
"""Headline benchmark: 1080p suzanne + 2 spheres with hard shadows at
the DENSE viewpoint (eye 0.9 — the mesh fills most of the frame,
hit_frac ~0.86), orbited slightly between frames.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured-frame-budget ratio against the driver target of
16 ms/frame at 1080p (BASELINE.json north star; the reference itself
publishes no numbers): >1.0 means faster than the 60 fps-equivalent bar.

Honesty notes (round-2 verdict): the former headline viewpoint (eye
2.5) had hit_frac ~0.05 — 95% of its "shadow rays" were parked by the
relevance gate and the Mrays/s figure mostly measured the culler. This
headline uses the dense view and counts only RELEVANT shadow rays
(pixels whose shading occlusion can change: covered and not backlit) in
the rate metric. The sparse view is still reported in
bench_configs.py (config 3).
"""

import dataclasses as dc
import json
import os
import subprocess
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import numpy as np


def preflight_backend(timeout_s: float = 120.0) -> str:
    """Probe the JAX backend in a SUBPROCESS with a hard timeout.

    The axon TPU tunnel can wedge in a way that hangs any in-process
    ``jax.devices()`` call forever (round-3 outage: the driver bench
    burned its one shot on a dead tunnel and recorded a 4k traceback).
    A bounded subprocess probe turns that into one parseable JSON line
    so BENCH_r* artifacts distinguish "outage" from "regression".

    Returns the backend name on success; emits a structured error line
    and exits nonzero on outage/timeout.
    """
    probe = ("import jax; print('BACKEND=' + jax.default_backend());"
             " print('NDEV=%d' % len(jax.devices()))")
    try:
        out = subprocess.run(
            [sys.executable, "-c", probe], capture_output=True, text=True,
            timeout=timeout_s, cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        print(json.dumps({
            "metric": "frame_ms_1080p_suzanne_dense_shadows",
            "value": None, "unit": "ms/frame", "vs_baseline": None,
            "error": "tpu backend unavailable: device probe timed out "
                     f"after {timeout_s:.0f}s (axon tunnel down/wedged)"}))
        sys.exit(2)
    if out.returncode != 0:
        tail = (out.stderr or out.stdout).strip().splitlines()[-1:]
        print(json.dumps({
            "metric": "frame_ms_1080p_suzanne_dense_shadows",
            "value": None, "unit": "ms/frame", "vs_baseline": None,
            "error": "backend init failed: " + (tail[0] if tail else "?")}))
        sys.exit(2)
    for line in out.stdout.splitlines():
        if line.startswith("BACKEND="):
            return line.split("=", 1)[1]
    return "unknown"


def main():
    backend = preflight_backend()
    import jax

    from rust_wgpu_raytracing_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()

    from rust_wgpu_raytracing_tpu.config import CameraConfig, reference_scene
    from rust_wgpu_raytracing_tpu.core.camera import Camera
    from rust_wgpu_raytracing_tpu.core.controls import CircleCameraController
    from rust_wgpu_raytracing_tpu.core.scene import Scene
    from rust_wgpu_raytracing_tpu.runtime.profiler import device_sync, time_frames

    W, H = 1920, 1080
    shadows = True
    cfg = reference_scene(W, H, shadows=shadows)
    # DENSE benchmark viewpoint: close enough that the mesh fills the
    # frame (hit_frac ~0.86) — the honest view the round-2 verdict
    # asked to lead with (the reference's default eye is INSIDE the
    # head; 2.5 was the old sparse orbit-out view)
    cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
    scene = Scene.build(cfg)
    cam = Camera.from_config(cfg.camera, aspect=W / H)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from rust_wgpu_raytracing_tpu.ops.megakernel import render_megakernel

        def make_frame(fused):
            return lambda u: render_megakernel(
                scene.data, u, width=W, height=H, shadows=shadows,
                fused=fused)
    else:
        from rust_wgpu_raytracing_tpu.ops.oracle import render_oracle
        frame = lambda u: render_oracle(
            scene.data, u, width=W, height=H, shadows=shadows)

    # orbit slightly between frames so nothing is trivially cacheable
    ctl = CircleCameraController()
    ctl.keys.right = True
    unis = []
    import jax.numpy as jnp
    for _ in range(20):
        ctl.update_camera(cam)
        unis.append(jnp.asarray(cam.uniforms().flat()))

    if on_tpu:
        # two bit-identical whole-frame programs exist (split: Pallas
        # G-buffer sweep + XLA shade + Pallas shadow any-hit; fused: ONE
        # Pallas kernel for the full frame — ops/fusedframe.py, equality
        # tested at u8). The framework's frame path is whichever is
        # faster on THIS chip; the headline measures both and reports
        # the winner, with both figures recorded.
        import time
        t0 = time.time()
        per_variant = {}
        variant_timing = {}
        # fused first: it is the expected winner, so if the split
        # variant must be skipped on time budget the headline is still
        # the real frame path's figure
        for name, fused in (("fused", True), ("split", False)):
            if not fused and time.time() - t0 > 480.0:
                # cold remote compiles run 2-4.5 min each; never let the
                # second variant push the whole bench past a driver
                # timeout — the fused figure alone is a valid headline
                per_variant[name] = None
                print("# split variant skipped: time budget", file=sys.stderr)
                continue
            try:
                fr = make_frame(fused)
                it = iter(unis * 10)
                det = {}
                per_variant[name] = time_frames(
                    lambda: fr(next(it)), n=20, warmup=2, details=det)
                variant_timing[name] = det
            except Exception as e:  # one variant's failure must not
                per_variant[name] = None  # void the headline
                print(f"# {name} variant failed: {e!r}"[:300],
                      file=sys.stderr)
        timed = {k: v for k, v in per_variant.items() if v is not None}
        variant = min(timed, key=timed.get)
        frame_ms = timed[variant]
        frame = make_frame(variant == "fused")
    else:
        it = iter(unis * 10)
        variant_timing = {"oracle": {}}
        frame_ms = time_frames(lambda: frame(next(it)), n=20, warmup=2,
                               details=variant_timing["oracle"])
        per_variant, variant = {}, "oracle"

    # sanity: the frame must actually render something dense
    c, d = frame(unis[0])
    hit_frac = float(np.asarray(d < 1.0).mean())
    assert np.isfinite(np.asarray(c)).all() and hit_frac > 0.5, hit_frac

    # honest ray accounting: every pixel casts one primary ray; a
    # shadow ray is COUNTED only for covered pixels (the relevance gate
    # parks uncovered/backlit pixels, and parked rays are not work —
    # hit_frac is the measurable covered fraction, a slight OVERcount
    # of traced shadow rays since backlit covered pixels park too)
    rays = W * H * ((1.0 + hit_frac) if shadows else 1.0)
    mrays = rays / (frame_ms * 1e-3) / 1e6
    print(json.dumps({
        "metric": "frame_ms_1080p_suzanne_dense_shadows",
        "value": round(frame_ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(16.0 / frame_ms, 3),
        "extra": {"mrays_per_s": round(mrays, 1),
                  "traced_rays_per_frame": int(rays),
                  "backend": jax.default_backend(),
                  "hit_frac": round(hit_frac, 4),
                  "variant": variant,
                  "variant_ms": {k: (round(v, 3) if v is not None else None)
                                 for k, v in per_variant.items()},
                  "git_sha": _git_sha(),
                  # full methodology per variant: two-point windows,
                  # raw (uncalibrated) ms/frame, idle sync round trip
                  "timing": variant_timing},
    }))


def _git_sha():
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True).stdout.strip() or "unknown"
    except OSError:
        return "unknown"


if __name__ == "__main__":
    main()
