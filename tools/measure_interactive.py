#!/usr/bin/env python
"""Measure the interactive shells on the real chip (VERDICT r4 #7).

Two surfaces, each at 600x600 (the reference's default window,
src/lib.rs:1248) and 1080p:

1. FrameLoop (the winit event-loop analogue, runtime/frame_loop.py):
   steady-state presented fps and per-frame PRESENTED latency — the
   wall time from the frame's step() start (camera update + dispatch)
   to its present callback firing with the fetched+encoded image. The
   pipelined loop presents frame k during step k+1, so latency ~
   frame_time + fetch; fps ~ 1/frame_time (the fetch hides behind the
   next render).
2. RenderServer MJPEG stream (the web-shell analogue,
   runtime/server.py): client-observed stream fps + HTTP key-event
   round trip, measured over localhost with a real GET of /stream.

Writes docs/interactive_latency.json. Run: python tools/measure_interactive.py
"""

import dataclasses as dc
import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def measure_frame_loop(width, height, n=40, warmup=8):
    from rust_wgpu_raytracing_tpu.config import CameraConfig, reference_scene
    from rust_wgpu_raytracing_tpu.runtime.frame_loop import FrameLoop
    from rust_wgpu_raytracing_tpu.runtime.renderer import Renderer

    cfg = reference_scene(width, height, shadows=True)
    # pin the known-winner frame program: variant='auto' autotunes by
    # compiling BOTH programs (2-4.5 min each cold on the tunnel),
    # which blew the measurement's time budget
    cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 0.9)),
                     render=dc.replace(cfg.render, variant="fused"))
    r = Renderer(cfg, backend="megakernel")

    presents = []
    loop = FrameLoop(r, present=lambda img: presents.append(
        time.perf_counter()))
    loop.push_key("right", True)  # orbit so every frame differs
    starts = []
    for _ in range(n):
        starts.append(time.perf_counter())
        loop.step()
    loop.flush()
    assert len(presents) == n, (len(presents), n)
    lat = [(presents[k] - starts[k]) * 1e3 for k in range(warmup, n)]
    span = starts[-1] - starts[warmup]
    fps = (n - 1 - warmup) / span
    return {
        "size": [width, height],
        "frames": n - warmup,
        "fps": round(fps, 1),
        "frame_ms_mean": round(1e3 / fps, 2),
        "present_latency_ms_mean": round(float(np.mean(lat)), 2),
        "present_latency_ms_p99": round(float(np.percentile(lat, 99)), 2),
    }


def measure_server(width, height, n_frames=30):
    from rust_wgpu_raytracing_tpu.config import CameraConfig, reference_scene
    from rust_wgpu_raytracing_tpu.runtime.frame_loop import FrameLoop
    from rust_wgpu_raytracing_tpu.runtime.renderer import Renderer
    from rust_wgpu_raytracing_tpu.runtime.server import RenderServer

    cfg = reference_scene(width, height, shadows=True)
    cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 0.9)))
    r = Renderer(cfg, backend="megakernel")
    loop = FrameLoop(r)
    srv = RenderServer(loop, port=0)
    th = threading.Thread(target=srv.httpd.serve_forever, daemon=True)
    th.start()
    render_th = loop.run_async()
    base = f"http://127.0.0.1:{srv.port}"

    # key round trip (input path: HTTP -> queue -> next step)
    t0 = time.perf_counter()
    urllib.request.urlopen(base + "/key?k=d&p=1", timeout=10).read()
    key_rt_ms = (time.perf_counter() - t0) * 1e3

    # client-observed MJPEG frame intervals
    arrivals = []
    with urllib.request.urlopen(base + "/stream", timeout=60) as stream:
        buf = b""
        while len(arrivals) < n_frames:
            chunk = stream.read(65536)
            if not chunk:
                break
            buf += chunk
            while b"\xff\xd9" in buf:  # JPEG EOI
                _, buf = buf.split(b"\xff\xd9", 1)
                arrivals.append(time.perf_counter())
    loop.stop()
    srv.httpd.shutdown()
    render_th.join(timeout=30)
    iv = np.diff(arrivals[5:]) * 1e3
    return {
        "size": [width, height],
        "stream_frames": len(arrivals),
        "stream_fps": round(1e3 / float(np.mean(iv)), 1),
        "stream_interval_ms_mean": round(float(np.mean(iv)), 2),
        "stream_interval_ms_p99": round(float(np.percentile(iv, 99)), 2),
        "key_event_http_rt_ms": round(key_rt_ms, 2),
    }


def main():
    import jax

    backend = jax.default_backend()
    out = {"backend": backend,
           "git_sha": subprocess.run(
               ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
               capture_output=True, text=True).stdout.strip(),
           "frame_loop": [], "server_mjpeg": []}
    for w, h in ((600, 600), (1920, 1080)):
        out["frame_loop"].append(measure_frame_loop(w, h))
        print(json.dumps(out["frame_loop"][-1]))
    for w, h in ((600, 600), (1920, 1080)):
        out["server_mjpeg"].append(measure_server(w, h))
        print(json.dumps(out["server_mjpeg"][-1]))
    with open(os.path.join(REPO, "docs", "interactive_latency.json"),
              "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote docs/interactive_latency.json")


if __name__ == "__main__":
    main()
