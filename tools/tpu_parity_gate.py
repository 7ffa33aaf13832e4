#!/usr/bin/env python
"""On-TPU parity gate (VERDICT r1 next #3).

CI runs Pallas only in interpret mode (tests force JAX_PLATFORMS=cpu),
so an interpret-vs-Mosaic divergence — layout, precision, masked-lane
handling — would ship with a green suite. This gate renders the oracle
(pure jnp, compiled by XLA:TPU) and the Pallas megakernel (compiled by
Mosaic) ON THE REAL CHIP and asserts they agree within <=1 u8 level
everywhere and exactly on >=99.9% of subpixels, across the paths that
exercise every kernel: shadows (any-hit), normal mapping (bump
sampling + tangent frames), HBM streaming + LBVH mask (big scene), and
all three accel modes against each other (must be BIT-identical).

Run before benchmarks: `python tools/tpu_parity_gate.py`. Writes
PARITY_TPU.json at the repo root (committed as the gate artifact).
Exits nonzero on any failure or if no TPU is available.
"""

import dataclasses as dc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def u8(fb):
    """LINEAR u8 levels — the reference's rgba8unorm storage texture
    domain (sphere/compute.wgsl:2). Comparing after sRGB ENCODE would
    amplify a 1-level linear difference to 3-4 levels at the dark end
    (the encode slope is ~12.92x near zero)."""
    return np.round(np.clip(np.asarray(fb), 0.0, 1.0)
                    * 255.0).astype(np.int32)


def gate_case(name, cfg, results, accel_modes=("cull",), **render_kw):
    import jax.numpy as jnp

    from rust_wgpu_raytracing_tpu.core.camera import Camera
    from rust_wgpu_raytracing_tpu.core.scene import Scene
    from rust_wgpu_raytracing_tpu.ops.megakernel import render_megakernel
    from rust_wgpu_raytracing_tpu.ops.oracle import render_oracle

    rc = cfg.render
    scene = Scene.build(cfg)
    cam = Camera.from_config(cfg.camera, aspect=rc.width / rc.height)
    uni = jnp.asarray(cam.uniforms().flat())
    kw = dict(width=rc.width, height=rc.height, shadows=rc.shadows,
              **render_kw)

    # megakernel-only knobs (e.g. fused) never reach the oracle
    mk_only = {k: kw.pop(k) for k in ("fused",) if k in kw}

    t0 = time.time()
    ref = u8(render_oracle(scene.data, uni, **kw)[0])
    imgs = {}
    for accel in accel_modes:
        imgs[accel] = u8(render_megakernel(scene.data, uni, accel=accel,
                                           interpret=False, **kw,
                                           **mk_only)[0])
    elapsed = time.time() - t0

    base = imgs[accel_modes[0]]
    diff = np.abs(base.astype(np.int32) - ref.astype(np.int32))
    bit_identical_accels = all(
        np.array_equal(imgs[a], base) for a in accel_modes[1:])
    entry = {
        "case": name,
        "size": [rc.width, rc.height],
        "accel_modes": list(accel_modes),
        "max_u8_delta": int(diff.max()),
        "exact_frac": round(float((diff == 0).mean()), 6),
        "hit_nonbg_frac": round(float((ref > 0).any(axis=2).mean()), 4),
        "accels_bit_identical": bool(bit_identical_accels),
        "seconds": round(elapsed, 1),
    }
    entry["pass"] = (entry["max_u8_delta"] <= 1
                     and entry["exact_frac"] >= 0.999
                     and bit_identical_accels)
    results.append(entry)
    print(json.dumps(entry))
    return entry["pass"]


def main():
    import jax

    from rust_wgpu_raytracing_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()

    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "no TPU backend; parity gate needs "
                          "the real chip", "backend": jax.default_backend()}))
        return 2

    from rust_wgpu_raytracing_tpu.config import (CameraConfig, MeshConfig,
                                                 RenderConfig, SceneConfig,
                                                 reference_scene)

    results = []
    ok = True

    # reference live scene + shadows: closest-hit + any-hit + texturing,
    # all accel modes must be bit-identical on the compiled path.
    # fused=False PINS the split program: since the fused-by-default
    # flip (RenderConfig.variant auto) this scene would otherwise
    # silently run the fused kernel and duplicate the _fused case,
    # losing on-chip split-path coverage (spheres/any-hit/compositing
    # on the split program, still reachable via variant='split',
    # autotune, and every streamed/nm/mip scene).
    cfg = reference_scene(256, 256, shadows=True)
    cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 2.5)))
    ok &= gate_case("reference_shadows_256", cfg, results,
                    accel_modes=("cull", "brute", "bvh"), fused=False)

    # normal mapping: bump-pool gather + tangent frames. Since round 5
    # nm scenes default to the FUSED program (tangent frames merged
    # out of the sweep) — gate both programs: the unpinned case runs
    # the shipping default (fused), the pinned one keeps split-nm
    # coverage.
    cfg = SceneConfig(
        meshes=(MeshConfig(obj_path="cube.obj", translation=(0.0, 0.0, -3.0),
                           scale=0.75, normal_mapping=True),),
        render=RenderConfig(width=256, height=256))
    ok &= gate_case("cube_normal_mapping_fused_256", cfg, results,
                    normal_mapping=True)
    ok &= gate_case("cube_normal_mapping_split_256", cfg, results,
                    normal_mapping=True, fused=False)

    # fused single-kernel frame (ops/fusedframe.py): spheres + sweep +
    # in-kernel shadow loop + compositing in ONE Mosaic program — a
    # different compile context than the split path, so it gets its own
    # oracle gate (round-4 RenderConfig.variant makes it selectable)
    cfg = reference_scene(256, 256, shadows=True)
    cfg = dc.replace(cfg, camera=CameraConfig(eye=(0.0, 0.0, 2.5)))
    ok &= gate_case("reference_shadows_fused_256", cfg, results,
                    fused=True)

    # big scene: HBM streaming kernels + LBVH walk mask on Mosaic
    cfg = SceneConfig(
        meshes=(MeshConfig(obj_path="builtin:terrain:100",
                           translation=(0.0, 0.0, -3.0)),),
        camera=CameraConfig(eye=(0.0, -2.0, -1.0), target=(0.0, 0.0, -3.2)),
        render=RenderConfig(width=256, height=256, shadows=True))
    ok &= gate_case("terrain20k_streamed_shadows_256", cfg, results,
                    accel_modes=("cull", "bvh"), fused=False)

    import subprocess
    try:
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             cwd=REPO, capture_output=True,
                             text=True).stdout.strip()
        dirty = bool(subprocess.run(["git", "status", "--porcelain",
                                     "rust_wgpu_raytracing_tpu"],
                                    cwd=REPO, capture_output=True,
                                    text=True).stdout.strip())
    except OSError:
        sha, dirty = "unknown", False

    out = {
        "pass": bool(ok),
        "backend": "tpu",
        "jax": jax.__version__,
        "git_sha": sha,
        "source_dirty": dirty,
        "cases": results,
    }
    with open(os.path.join(REPO, "PARITY_TPU.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"parity_gate": "PASS" if ok else "FAIL"}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
