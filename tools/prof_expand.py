"""Micro-benchmark: winner-attribute expansion gather layouts (on-chip).

The round-3 (t,face) sweep redesign made the SWEEP fast but its
post-sweep expansion (`expand_tf_gbuffer`) gathers gpack as
(ROWS, F).take(idx, axis=1): one random 4-byte access per row per ray,
each wasting a full ~512 B HBM transaction — ~24 rows x 2M rays.
Hypothesis: transposing to (F, ROWS) row-major so a winner's attributes
are CONTIGUOUS turns this into one ~100 B row fetch per ray.

Times, for F in {968 (suzanne), 522k (terrain)}, R = 2,073,600 rays:
  colgather  — today's (ROWS, F) take axis=1
  rowgather  — (F, ROWS) take axis=0, then column slices
  rowgather_pad32 — (F, 32) padded rows (128 B aligned)
  onehot_dot — per-128-face-chunk one-hot matmul (MXU), F=968 only
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from rust_wgpu_raytracing_tpu.runtime.profiler import time_frames

R = 1920 * 1080
ROWS = 24


def bench(F):
    key = jax.random.PRNGKey(0)
    gp = jax.random.normal(key, (ROWS, F), jnp.float32)
    gp_t = jnp.asarray(gp.T)                      # (F, ROWS)
    gp_p = jnp.zeros((F, 32), jnp.float32).at[:, :ROWS].set(gp.T)
    idx = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, F)
    idx = jax.device_put(idx)

    def consume(a):  # touch every row so nothing dead-codes
        return sum(a[i] for i in range(ROWS))

    def t(name, fn):
        f = jax.jit(fn)
        print(F, name, round(time_frames(f, n=10), 3), flush=True)

    t("colgather", lambda: consume(jnp.take(gp, idx, axis=1)))
    t("rowgather", lambda: consume(jnp.take(gp_t, idx, axis=0).T))
    t("rowgather_pad32", lambda: consume(jnp.take(gp_p, idx, axis=0).T))
    if F <= 2048:
        Fp = -(-F // 128) * 128
        gpp = jnp.zeros((Fp, ROWS), jnp.float32).at[:F].set(gp.T)

        def onehot_dot():
            acc = jnp.zeros((R, ROWS), jnp.float32)
            for c in range(Fp // 128):
                oh = (idx[:, None] == (c * 128 + jnp.arange(128))[None, :])
                acc = acc + jnp.dot(oh.astype(jnp.float32),
                                    gpp[c * 128:(c + 1) * 128],
                                    preferred_element_type=jnp.float32)
            return consume(acc.T)

        t("onehot_dot", onehot_dot)


for F in (968, 522240):
    bench(F)
