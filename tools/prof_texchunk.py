"""Round-5: map the XLA:TPU gather fast-path threshold and test
chunk-packed texture pool layouts.

prof_fusedtail ladder (f32 (rows,12), 2M indices): 65536 rows
(3.1 MB) = 5.3 ms, 262144 rows (12.6 MB) = 22 ms; the real u16
(262144,12) pool (6.3 MB) = 29 ms. Is the cliff on ROWS or BYTES?
Same 2M hashed indices against:
  - f32 (131072, 12) 6.3 MB          (bytes probe)
  - u16 (131072, 24) 6.3 MB          (rows at same bytes)
  - u16 (65536, 48)  6.3 MB          (chunk-pack 4 texels/row)
  - u16 (32768, 96)  6.3 MB          (chunk-pack 8 texels/row)
  - u16 (262144, 12) 6.3 MB          (today's pool, control)
  - split: 2x u16 (131072, 12) gathers + select (both halves fast?)
Then the full chunk-packed SAMPLE (gather + within-row 4-way select +
filter weights) to get the end-to-end candidate cost.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

import jax
import jax.numpy as jnp
import numpy as np

from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

R = 2088960
idx = (jnp.arange(R, dtype=jnp.int32) * 40503) % 262144

def row_gather(p, scale):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    def f(i):
        t = jax.lax.gather(p, (i // scale)[:, None], dn,
                           slice_sizes=(1, p.shape[1]),
                           mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return t.astype(jnp.int32).sum()
    return jax.jit(f)

out = {}
cases = [
    ("f32_131072x12", jnp.ones((131072, 12), jnp.float32), 2),
    ("u16_131072x24", jnp.ones((131072, 24), jnp.uint16), 2),
    ("u16_65536x48", jnp.ones((65536, 48), jnp.uint16), 4),
    ("u16_32768x96", jnp.ones((32768, 96), jnp.uint16), 8),
    ("u16_262144x12", jnp.ones((262144, 12), jnp.uint16), 1),
]
for name, p, scale in cases:
    f = row_gather(p, scale)
    out[name + "_ms"] = time_frames(lambda f=f: f(idx), n=8)
    print(json.dumps({k: round(v, 2) for k, v in out.items()}), flush=True)

# split-pool: two halves, each (131072, 12) u16, predicated select
pa = jnp.ones((131072, 12), jnp.uint16)
pb = jnp.ones((131072, 12), jnp.uint16) * 2
def split(i):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    hi = i >= 131072
    ia = jnp.where(hi, 0, i)
    ib = jnp.where(hi, i - 131072, 0)
    ta = jax.lax.gather(pa, ia[:, None], dn, slice_sizes=(1, 12),
                        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    tb = jax.lax.gather(pb, ib[:, None], dn, slice_sizes=(1, 12),
                        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    t = jnp.where(hi[:, None], tb, ta)
    return t.astype(jnp.int32).sum()
js = jax.jit(split)
out["split_2x131072_ms"] = time_frames(lambda: js(idx), n=8)
print(json.dumps({k: round(v, 2) for k, v in out.items()}), flush=True)

# end-to-end chunk-packed sample: gather wide row, select texel slot
pc = jnp.arange(65536 * 48, dtype=jnp.uint16).reshape(65536, 48)
def chunk_sample(i):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    row = jax.lax.gather(pc, (i >> 2)[:, None], dn, slice_sizes=(1, 48),
                         mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    slot = (i & 3).astype(jnp.int32)[:, None]
    t = row[:, 0:12]
    for k in range(1, 4):
        t = jnp.where(slot == k, row[:, 12 * k:12 * (k + 1)], t)
    return t.astype(jnp.int32).sum()
jc = jax.jit(chunk_sample)
out["chunk4_sample_ms"] = time_frames(lambda: jc(idx), n=8)
print(json.dumps({k: round(v, 2) for k, v in out.items()}), flush=True)

# correctness of the chunk select vs direct u16 (262144,12) gather
pd = jnp.arange(262144 * 12, dtype=jnp.uint16).reshape(262144, 12)
pcx = pd.reshape(65536, 48)
dn = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
small = idx[:4096]
direct = jax.lax.gather(pd, small[:, None], dn, slice_sizes=(1, 12),
                        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
row = jax.lax.gather(pcx, (small >> 2)[:, None], dn, slice_sizes=(1, 48),
                     mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
slot = (small & 3).astype(jnp.int32)[:, None]
t = row[:, 0:12]
for k in range(1, 4):
    t = jnp.where(slot == k, row[:, 12 * k:12 * (k + 1)], t)
out["chunk4_exact"] = bool(jnp.all(t == direct))
print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                  for k, v in out.items()}), flush=True)
