"""Trace one PT frame variant on the chip and print per-op device
times (reusable round-5 profiling harness; parses the xplane proto
directly — tensorboard_plugin_profile's converter needs a protobuf
downgrade). Usage: python tools/xprof_pt.py [auto|full] [top_n]"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
import dataclasses as dc
import glob

import jax
import jax.numpy as jnp

from rust_wgpu_raytracing_tpu.config import CameraConfig, reference_scene
from rust_wgpu_raytracing_tpu.core.camera import Camera
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.ops.pathtrace import render_pathtrace

variant = sys.argv[1] if len(sys.argv) > 1 else "auto"
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30

W, H = 1920, 1080
key = jax.random.PRNGKey(7)
cfg = reference_scene(W, H)
cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 2.5)))
sd = Scene.build(cfg).data
uni = jnp.asarray(Camera.from_config(cfg.camera, W / H).uniforms().flat())

cap = None if variant == "full" else variant
jf = jax.jit(lambda u, k: render_pathtrace(
    sd, u, k, width=W, height=H, bounces=4, spp=1, compact_cap=cap))
jf(uni, key).block_until_ready()

logdir = f"/tmp/pt_trace_{variant}"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for i in range(3):
        r = jf(uni, jax.random.fold_in(key, i))
    r.block_until_ready()

pb = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))[0]
from tensorflow.tsl.profiler.protobuf.xplane_pb2 import XSpace
xs = XSpace()
xs.ParseFromString(open(pb, "rb").read())
plane = [p for p in xs.planes if p.name == "/device:TPU:0"][0]
md = plane.event_metadata
for line in plane.lines:
    if line.name != "XLA Ops":
        continue
    agg = {}
    for ev in line.events:
        name = md[ev.metadata_id].name
        a = agg.setdefault(name, [0, 0.0])
        a[0] += 1
        a[1] += ev.duration_ps / 1e9
    total = sum(v[1] for v in agg.values())
    print(f"== XLA Ops total {total/3:.2f} ms/frame")
    for name, (n, ms) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:top_n]:
        print(f"{ms/3:9.3f} ms/fr x{n//3:4d}  {name[:130]}")
