"""Checkpoint / resume (SURVEY §5.4: absent in the reference, whose
state is reconstructed from constants each launch — lib.rs:352-361).

Needed here for deterministic benchmark replays and resumable
progressive path tracing: serializes camera state, controller key
flags, render progress (accumulated spp + the accumulation buffer) and
the scene config.
"""

from __future__ import annotations

import json
import os
import numpy as np

from ..config import SceneConfig


def save_checkpoint(path: str, renderer) -> None:
    cam = renderer.camera
    state = {
        "config": json.loads(renderer.config.to_json()),
        "camera": {
            "eye": cam.eye.tolist(),
            "target": cam.target.tolist(),
            "up": cam.up.tolist(),
            "aspect": cam.aspect,
        },
        "keys": vars(renderer.controller.keys),
        "frame_count": renderer.frame_count,
        "spp_done": getattr(renderer, "_spp_done", 0),
    }
    arrays = {}
    accum = getattr(renderer, "_accum", None)
    if accum is not None:
        arrays["accum"] = np.asarray(accum)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # np.savez silently appends '.npz' to other suffixes — write to the
    # EXACT path given so load_checkpoint(path) always round-trips
    with open(path, "wb") as fh:
        np.savez(fh, state=json.dumps(state), **arrays)


def load_checkpoint(path: str, backend: str = "auto"):
    from ..runtime.renderer import Renderer

    with np.load(path, allow_pickle=False) as z:
        state = json.loads(str(z["state"]))
        accum = z["accum"] if "accum" in z.files else None

    cfg = SceneConfig.from_json(json.dumps(state["config"]))
    r = Renderer(cfg, backend=backend)
    r.camera.eye = np.asarray(state["camera"]["eye"], np.float64)
    r.camera.target = np.asarray(state["camera"]["target"], np.float64)
    r.camera.up = np.asarray(state["camera"]["up"], np.float64)
    r.camera.aspect = float(state["camera"]["aspect"])
    for k, v in state["keys"].items():
        setattr(r.controller.keys, k, bool(v))
    r.frame_count = int(state["frame_count"])
    if accum is not None:
        import jax.numpy as jnp

        r._accum = jnp.asarray(accum)
        r._spp_done = int(state["spp_done"])
    return r
