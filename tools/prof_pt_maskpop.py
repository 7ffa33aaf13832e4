"""Round-5 config-4: is the per-bounce cull mask actually sparse?

Every host-side ablation (mask cost, RNG, albedo, tile size, glue)
measures ~0, so the ~10.5 ms/bounce lives in the fused ES kernel.
Two hypotheses left: (a) the act-aware cull masks are NOT sparse at
later bounces (the kernel genuinely visits most (tile, cluster)
pairs), or (b) masks are sparse and the cost is per-admitted-visit /
per-tile floor. Measure (a): run the UN-jitted frame eagerly at 540p
so the es_fn hook sees concrete wavefronts, then popcount the very
words the kernel would walk.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses as dc
import json

import jax
import jax.numpy as jnp
import numpy as np

from rust_wgpu_raytracing_tpu.config import CameraConfig, reference_scene
from rust_wgpu_raytracing_tpu.core.camera import Camera
from rust_wgpu_raytracing_tpu.core.scene import Scene
from rust_wgpu_raytracing_tpu.ops import megakernel as mk
from rust_wgpu_raytracing_tpu.ops import pathtrace as pt

W, H = 960, 540
key = jax.random.PRNGKey(7)
cfg = reference_scene(W, H)
cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 2.5)))
sd = Scene.build(cfg).data
uni = jnp.asarray(Camera.from_config(cfg.camera, W / H).uniforms().flat())

CAPTURED = []

def probing_es(scene, ox, oy, oz, dx, dy, dz,
               sox, soy, soz, sdx, sdy, sdz, active, *, interpret=False):
    CAPTURED.append([jax.device_get(a) for a in
                     (ox, oy, oz, dx, dy, dz,
                      sox, soy, soz, sdx, sdy, sdz, active)])
    return mk.extend_shadow_pallas(scene, ox, oy, oz, dx, dy, dz,
                                   sox, soy, soz, sdx, sdy, sdz, active,
                                   interpret=interpret)

img = pt.render_pathtrace.__wrapped__(
    sd, uni, key, width=W, height=H, bounces=4, spp=1,
    es_fn=probing_es, background=(0.0, 0.0, 0.0))
jax.block_until_ready(img)

f = sd.tri_p0.shape[0]
bf = mk._natural_block_f(sd, f)
tile_r = mk.TILE_R
print(json.dumps({"faces": int(f), "block_f": int(bf),
                  "n_clusters": int(f // bf), "tile_r": tile_r}))

@jax.jit
def stats_of(ox, oy, oz, dx, dy, dz, sox, soy, soz, sdx, sdy, sdz, act):
    planes = [mk._pad1(a, tile_r) for a in (dx, dy, dz, ox, oy, oz,
                                            sdx, sdy, sdz, sox, soy, soz)]
    actp = mk._pad1(act.astype(jnp.float32), tile_r) > 0
    (dxp, dyp, dzp, oxp, oyp, ozp,
     sdxp, sdyp, sdzp, soxp, soyp, sozp) = planes
    wa, nwords = mk._mask_words(sd, "cull", oxp, oyp, ozp,
                                dxp, dyp, dzp, tile_r, bf, f,
                                False, act=actp)
    wb, _ = mk._mask_words(sd, "cull", soxp, soyp, sozp,
                           sdxp, sdyp, sdzp, tile_r, bf, f,
                           False, act=actp)
    un = wa | wb
    tiles = dxp.shape[0] // tile_r
    pop = lambda w: jnp.sum(jax.lax.population_count(w))
    tact = jnp.sum(jnp.any(actp.reshape(-1, tile_r), axis=1))
    tvis = jnp.sum(jnp.any(un.reshape(tiles, nwords) != 0, axis=1))
    return (jnp.sum(act.astype(jnp.int32)), tact, tvis,
            pop(wa), pop(wb), pop(un),
            jnp.asarray(tiles), jnp.asarray(nwords))

for b, planes in enumerate(CAPTURED):
    n_act, tact, tvis, pa, pb, pu, tiles, nwords = [
        int(x) for x in jax.device_get(stats_of(*[jnp.asarray(p)
                                                  for p in planes]))]
    print(json.dumps({
        "bounce": b + 1, "active_lanes": n_act,
        "active_tiles": tact, "visited_tiles": tvis, "tiles": tiles,
        "pop_extend": pa, "pop_shadow": pb, "pop_union": pu,
        "bits_total": tiles * (f // bf),
        "union_fill_pct": round(100.0 * pu / (tiles * (f // bf)), 2)}))
