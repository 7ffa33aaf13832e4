#!/usr/bin/env python
"""Validate the bench timing methodology against device-side truth
(VERDICT r4 weak #3 / next #4).

The headline figure comes from runtime/profiler.time_frames: wall-clock
over N per-frame dispatches with the end-sync cost cancelled by the
two-point estimator. Its residual uncertainty is host-side: per-dispatch
Python/runtime overhead and tunnel jitter.

Assumption-free device truth = the BRACKET from one long raw window.
The device executes dispatched programs in FIFO order on one stream and
the end fetch is ordered after all of them, so a wall window of n
back-to-back dispatched frames + one sync bounds the true per-frame
cost T with NO model of the sync's overlap structure:

    (wall(n) - idle_rt) / n  <=  T  <=  wall(n) / n

(lower bound: the sync cannot cost more than a full idle round trip;
upper: it cannot cost less than zero). Bracket width = idle_rt/n, so
n=48 shrinks it to ~0.8 ms on this tunnel — tight enough to place the
headline on one side of the 16 ms bar without trusting any
calibration. The two-point estimator is validated iff it lands inside
the bracket; bench.py additionally records raw windows so any reader
can re-derive the bracket.

A scan-chained variant (N frames inside one lax.scan, one dispatch) is
also measured and recorded but NOT used as truth: measured on-chip it
runs ~1.9x slower per frame than the identical per-dispatch program —
XLA pessimizes the frame body inside the loop (round-5 measurement in
docs/timing_validation.json) — so it is a loose upper bound only.

Run on the real chip: python tools/validate_timing.py
"""

import dataclasses as dc
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rust_wgpu_raytracing_tpu.config import CameraConfig, reference_scene
    from rust_wgpu_raytracing_tpu.core.camera import Camera
    from rust_wgpu_raytracing_tpu.core.controls import CircleCameraController
    from rust_wgpu_raytracing_tpu.core.scene import Scene
    from rust_wgpu_raytracing_tpu.ops.megakernel import render_megakernel
    from rust_wgpu_raytracing_tpu.runtime.profiler import (device_sync,
                                                           time_frames)

    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "needs the real chip",
                          "backend": jax.default_backend()}))
        return 2

    W, H = 1920, 1080
    cfg = reference_scene(W, H, shadows=True)
    cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
    scene = Scene.build(cfg)
    cam = Camera.from_config(cfg.camera, aspect=W / H)

    # the bench.py frame sequence: orbit slightly between frames
    ctl = CircleCameraController()
    ctl.keys.right = True
    unis = []
    for _ in range(20):
        ctl.update_camera(cam)
        unis.append(np.asarray(cam.uniforms().flat(), np.float32))
    unis = jnp.asarray(np.stack(unis))  # (20, 35)

    frame = lambda u: render_megakernel(scene.data, u, width=W, height=H,
                                        shadows=True, fused=True)

    # --- methodology under test: per-dispatch two-point ---
    it = iter(list(unis) * 50)
    det = {}
    dispatch_ms = time_frames(lambda: frame(next(it)), n=20, warmup=2,
                              details=det)

    # --- device truth: N frames inside one scan, one dispatch ---
    @jax.jit
    def scan_frames(uni_stack):
        def body(carry, u):
            c, d = frame(u)
            # fold the frame into a checksum carry: a real data
            # dependence consumes every iteration's output without
            # materializing 20 framebuffers
            return carry + jnp.sum(c[::64, ::64]) + jnp.sum(d[::97, ::97]), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), uni_stack)
        return acc

    def scan_window(k):
        # pad by cycling: k frames from the 20 distinct uniforms
        reps = -(-k // 20)
        stack = jnp.concatenate([unis] * reps)[:k]
        r = scan_frames(stack)
        t0 = time.perf_counter()  # warm: above call compiled k-shape
        r = scan_frames(stack)
        device_sync(r)
        return time.perf_counter() - t0

    n, n0 = 20, 5
    scan_window(n0)  # compile both shapes before timing
    scan_window(n)
    w0 = min(scan_window(n0), scan_window(n0))
    wn = min(scan_window(n), scan_window(n))
    scan_ms = max(0.0, wn - w0) * 1e3 / (n - n0)

    # --- assumption-free bracket from one long raw window ---
    idle_rt = det.get("idle_sync_rt_ms", 0.0)
    nl = 48
    it2 = iter(list(unis) * 50)

    def long_window():
        t0 = time.perf_counter()
        r = None
        for _ in range(nl):
            r = frame(next(it2))
        device_sync(r)
        return (time.perf_counter() - t0) * 1e3

    wl = min(long_window(), long_window())
    bracket = [round((wl - idle_rt) / nl, 3), round(wl / nl, 3)]
    inside = bracket[0] - 0.15 <= dispatch_ms <= bracket[1] + 0.15

    out = {
        "scene": "dense suzanne 1080p + shadows, fused frame",
        "dispatch_two_point_ms": round(dispatch_ms, 3),
        "dispatch_timing": det,
        "bracket_ms": {"n": nl, "window_ms": round(wl, 3),
                       "idle_sync_rt_ms": idle_rt,
                       "lo": bracket[0], "hi": bracket[1],
                       "rule": "(wall-idle_rt)/n <= T <= wall/n; FIFO "
                               "stream + end-ordered fetch, no overlap "
                               "model assumed"},
        "scan_chained_ms": round(scan_ms, 3),
        "scan_windows_ms": {"n": n, "n0": n0,
                            "window_n_ms": round(wn * 1e3, 3),
                            "window_n0_ms": round(w0 * 1e3, 3),
                            "note": "scan pessimizes the frame body; "
                                    "upper bound only, not truth"},
        "verdict": (("two-point inside the assumption-free bracket: "
                     "methodology stands" if inside else
                     "two-point OUTSIDE the bracket: report bracket hi")
                    + f"; headline <16ms is {'PROVEN' if bracket[1] < 16.0 else 'NOT proven'}"
                      " by the bracket upper bound"),
        "git_sha": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True).stdout.strip(),
    }
    with open(os.path.join(REPO, "docs", "timing_validation.json"),
              "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
