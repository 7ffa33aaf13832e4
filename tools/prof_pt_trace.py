"""Round-5 config-4: device-truth per-op breakdown of the 62 ms frame.

Every host-side ablation (mask/RNG/albedo/tile/glue) measures ~0 while
the frame stays at 62 ms — so stop ablating and read the device
timeline: jax.profiler trace of 3 steady-state frames, parsed with
tensorboard_plugin_profile into per-HLO self-times.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import glob
import json

import jax
import jax.numpy as jnp

from rust_wgpu_raytracing_tpu.config import CameraConfig, reference_scene
from rust_wgpu_raytracing_tpu.core.camera import Camera
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.ops import pathtrace as pt

W, H = 1920, 1080
key = jax.random.PRNGKey(7)
cfg = reference_scene(W, H)
cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 2.5)))
sd = Scene.build(cfg).data
uni = jnp.asarray(Camera.from_config(cfg.camera, W / H).uniforms().flat())

jf = jax.jit(lambda u, k: pt.render_pathtrace(
    sd, u, k, width=W, height=H, bounces=4, spp=1))
jf(uni, key).block_until_ready()  # compile + warm

logdir = "/tmp/pt_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for i in range(3):
        r = jf(uni, jax.random.fold_in(key, i))
    r.block_until_ready()

pb = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
print("xplane files:", pb)
if not pb:
    sys.exit(1)

# ---- parse: sum device-side event durations per op name ----
from tensorflow.python.profiler.internal import _pywrap_profiler_plugin  # noqa
try:
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(pb, "hlo_op_stats^",
                                                   {})
    open("/tmp/pt_trace/opstats.out", "wb").write(
        data if isinstance(data, bytes) else data.encode())
    print("wrote opstats via tbp")
except Exception as e:
    print("tbp convert failed:", e)
    # fallback: decode XSpace proto directly
    from tensorflow.core.profiler.protobuf.xplane_pb2 import XSpace
    xs = XSpace()
    xs.ParseFromString(open(pb[0], "rb").read())
    rows = []
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        md = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                name = md[ev.metadata_id].name if ev.metadata_id in md \
                    else str(ev.metadata_id)
                rows.append((name, ev.duration_ps / 1e9))  # ms
    agg = {}
    for name, ms in rows:
        a = agg.setdefault(name, [0, 0.0])
        a[0] += 1
        a[1] += ms
    top = sorted(agg.items(), key=lambda kv: -kv[1][1])[:40]
    total = sum(v[1] for v in agg.values())
    print(json.dumps({"planes": [p.name for p in xs.planes],
                      "total_ms_3frames": round(total, 2)}))
    for name, (n, ms) in top:
        print(f"{ms/3:9.3f} ms/frame  x{n:4d}  {name[:110]}")
