"""Texture-pool gather layout probe (round 5, config-4 decomposition).

prof_pt4 measured sample_packed_texture at ~30 ms for 2.09M rays with
semi-coherent indices; a first version of this probe found a RANDOM-
index (12,1)-column gather over the (12, 262144) u16 pool takes >10 s
per call (never finished n=16). This probe times one dispatch at a
time (n=4 two-point) across layouts/dtypes to find what the hardware
actually punishes: column-slice vs contiguous-row gathers, u16 vs f32,
random vs coherent indices.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

import jax
import jax.numpy as jnp
import numpy as np

from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

N = 262144
R = 2073600
key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
flat_np = rng.integers(0, N, R).astype(np.int32)
flat = jnp.asarray(flat_np)          # random
coh = jnp.asarray(np.minimum(np.arange(R) // 8, N - 1).astype(np.int32))

pool_u16 = jnp.asarray(rng.integers(0, 65535, (12, N)).astype(np.uint16))
poolT_u16 = jnp.asarray(np.asarray(pool_u16).T.copy())   # (N, 12)
poolT_f32 = poolT_u16.astype(jnp.float32)
pool_f32 = pool_u16.astype(jnp.float32)
# 2x2 taps as 3 u32 words per texel row (pairs of u16 packed)
poolT_u32 = jnp.asarray(
    np.asarray(poolT_u16).view(np.uint32).copy())        # (N, 6)

dn = jax.lax.GatherDimensionNumbers(
    offset_dims=(0,), collapsed_slice_dims=(1,), start_index_map=(1,))


def col(pool):
    return jax.jit(lambda idx: jax.lax.gather(
        pool, idx[:, None], dn, slice_sizes=(pool.shape[0], 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS))


def row(poolT):
    return jax.jit(lambda idx: jnp.take(poolT, idx, axis=0, mode="clip"))


cases = [
    ("row_u16_coh", row(poolT_u16), coh),
    ("row_u16_rand", row(poolT_u16), flat),
    ("row_f32_rand", row(poolT_f32), flat),
    ("row_u32_rand", row(poolT_u32), flat),
    ("col_u16_coh", col(pool_u16), coh),
    ("col_u16_rand", col(pool_u16), flat),
]
for name, fn, idx in cases:
    ms = time_frames(lambda: fn(idx), n=4)
    print(json.dumps({name: round(ms, 2)}), flush=True)
