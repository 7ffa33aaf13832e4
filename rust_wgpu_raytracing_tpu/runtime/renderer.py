"""Renderer: the TPU-native analogue of the reference's `State`
(src/lib.rs:223-257).

Where `State` owns the wgpu device, swapchain, bind groups and pipelines
and re-records a command encoder every frame (src/lib.rs:1012-1230), the
Renderer owns the device-resident SceneData and ONE jitted frame function;
per-frame host->device traffic is a single (35,) f32 camera vector (the
analogue of the two queue.write_buffer calls at src/lib.rs:999-1009), and
the framebuffer stays on device until presented.

update()/render()/resize() mirror State::update/render/resize
(src/lib.rs:994,1012,772). The reference's resize has an aspect-lag bug
(reads the OLD size when updating camera.aspect, src/lib.rs:774-777); we
fix it — divergence documented here and in tests.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import numpy as np

from ..config import SceneConfig
from ..core.camera import Camera, CameraUniforms
from ..core.controls import CircleCameraController
from ..core.scene import Scene
from ..io.image_out import encode_u8_device, framebuffer_to_image, write_png


class Renderer:
    def __init__(self, config: SceneConfig, backend: str = "auto",
                 limits=None):
        """limits: optional runtime.limits.DeviceLimits — validated the
        way wgpu validates pipelines at creation (the reference's wasm
        build requests crippled limits, src/lib.rs:136-170,287-297;
        under them its mesh path cannot validate). Raises ValueError
        listing every violation."""
        if limits is not None:
            from .limits import validate_limits

            bad = validate_limits(config, limits)
            if bad:
                raise ValueError(
                    "scene does not validate under device limits:\n  "
                    + "\n  ".join(bad))
        self.config = config
        self.scene = Scene.build(config)
        self.camera = Camera.from_config(
            config.camera, aspect=config.render.width / config.render.height)
        self.controller = CircleCameraController(speed=0.2)
        self.backend = self._pick_backend(backend)
        self.width = config.render.width
        self.height = config.render.height
        self._frame_fn = None
        # frame-program variant bookkeeping (RenderConfig.variant)
        self.variant_chosen: Optional[str] = None
        self.variant_ms: Optional[dict] = None
        self._build_frame_fn()
        # perf counters (metrics subsystem the reference lacks; SURVEY §5.5)
        self.frame_count = 0
        self.last_frame_ms = float("nan")

    @staticmethod
    def _pick_backend(backend: str) -> str:
        if backend != "auto":
            return backend
        platform = jax.default_backend()
        return "megakernel" if platform == "tpu" else "oracle"

    # ------------------------------------------------------------------
    def _build_frame_fn(self):
        rc = self.config.render
        interactive_interpret = jax.default_backend() != "tpu"
        if rc.pt_bounces > 0:
            # progressive path tracing (BASELINE config 4): accumulate
            # jittered samples across frames; update() resets on camera
            # motion (classic interactive-PT behavior)
            from ..ops.pathtrace import render_pathtrace

            self._accum = None
            self._spp_done = 0

            def frame(scene, uni):
                import jax.numpy as jnp

                depth = jnp.ones((self.height, self.width), jnp.float32)
                # pt_spp <= 0 means UNBOUNDED progressive accumulation
                # (guards the 0/0 NaN frame a literal target of 0 gave)
                target = rc.pt_spp if rc.pt_spp > 0 else None
                if self._accum is not None and target is not None \
                        and self._spp_done >= target:
                    # converged: pt_spp is a TARGET — once reached, frames
                    # re-present the finished accumulation (no more samples)
                    return self._accum / self._spp_done, depth
                key = jax.random.fold_in(
                    jax.random.PRNGKey(rc.seed), self._spp_done)
                spp = 1 if target is None else min(target - self._spp_done, 1)
                # the path tracer always runs the Pallas kernels; off-TPU
                # they execute in interpret mode
                # accumulation rides inside the render jit (a separate
                # eager add costs a ~3 ms dispatch on tunneled backends)
                # compact_cap="auto": post-primary hit-wavefront
                # compaction (4x on BASELINE config 4; bit-identical,
                # falls back in-jit on dense views — ops/pathtrace.py)
                self._accum = render_pathtrace(
                    scene, uni, key, width=self.width, height=self.height,
                    bounces=rc.pt_bounces, spp=spp,
                    background=tuple(self.config.background),
                    interpret=interactive_interpret, accum=self._accum,
                    compact_cap="auto")
                self._spp_done += spp
                color = self._accum / self._spp_done
                return color, depth

            self._frame_fn = frame
            return

        # MeshConfig.normal_mapping was declared but consumed NOWHERE
        # before round 4 — the flag never reached a backend. The frame
        # kwarg is scene-wide; per-material map_Bump gating inside the
        # shader limits the effect to the meshes that carry a map, so
        # the scene-level OR preserves per-mesh semantics.
        nm = any(m.normal_mapping for m in self.config.meshes)
        kwargs = dict(
            width=self.width,
            height=self.height,
            near=rc.kernel_near,
            far=rc.kernel_far,
            background=tuple(self.config.background),
            shadows=rc.shadows,
            quantize=rc.quantize_rgba8,
            normal_mapping=nm,
        )
        if self.backend == "oracle":
            from ..ops.oracle import render_oracle

            self._frame_fn = lambda scene, uni: render_oracle(scene, uni, **kwargs)
        elif self.backend == "megakernel":
            from ..ops.megakernel import STREAM_FACES, render_megakernel

            def mk(fused):
                return lambda scene, uni: render_megakernel(
                    scene, uni, accel=rc.accel, mip=rc.mip,
                    interpret=interactive_interpret, fused=fused,
                    **kwargs)

            variant = getattr(rc, "variant", "split")
            if variant not in ("split", "fused", "auto"):
                raise ValueError(f"unknown frame variant {variant!r}")
            if variant == "fused" and (rc.mip or (nm and rc.shadows)):
                raise ValueError(
                    "variant='fused' needs a VMEM frame without mip or "
                    "nm+shadows — use 'split' or 'auto'")
            if variant == "auto":
                # two bit-identical frame programs exist (split / fused,
                # see RenderConfig.variant); which is faster depends on
                # the device and scene. Eligibility first (the fused
                # kernel needs a VMEM-resident mesh, no mip, no
                # nm+shadows) — then the first render() times both and
                # locks the winner.
                sd = self.scene.data
                if not (sd.num_faces > 0 and not rc.mip
                        and not (nm and rc.shadows)
                        and sd.tri_p0.shape[0] <= STREAM_FACES):
                    variant = "split"
            if variant != "auto":
                self.variant_chosen = variant
                self._frame_fn = mk(variant == "fused")
            else:
                fns = {"split": mk(False), "fused": mk(True)}

                def autotune(scene, uni):
                    from .profiler import time_frames

                    # n=8: the two-point estimator (profiler.py) needs
                    # window(8)-window(2) to stand clear of tunnel
                    # jitter; at n=3 a clamped/noisy delta could make
                    # the winner arbitrary (round-4 advisor finding)
                    self.variant_ms = {
                        name: time_frames(lambda: fn(scene, uni),
                                          n=8, warmup=1)
                        for name, fn in fns.items()}
                    self.variant_chosen = min(self.variant_ms,
                                              key=self.variant_ms.get)
                    self._frame_fn = fns[self.variant_chosen]
                    return self._frame_fn(scene, uni)

                self._frame_fn = autotune
        elif self.backend == "megakernel_gp":
            # geometry-parallel frame: face soup sharded over every
            # visible device (parallel/geometry_sharding.py) — the
            # multi-chip runtime path; bit-identical to "megakernel"
            from ..parallel.geometry_sharding import (make_gp_mesh,
                                                      render_sharded_gp)

            mesh = make_gp_mesh()
            self.variant_chosen = "gp"
            self._frame_fn = lambda scene, uni: render_sharded_gp(
                scene, uni, mesh, accel=rc.accel, mip=rc.mip,
                interpret=interactive_interpret, **kwargs)
        else:
            raise ValueError(f"unknown backend {self.backend!r}")

    # --- State::update (src/lib.rs:994-1010) ---
    def update(self):
        before = self.camera.eye.copy()
        self.controller.update_camera(self.camera)
        if getattr(self, "_accum", None) is not None and not np.array_equal(
                before, self.camera.eye):
            # camera moved: restart progressive accumulation
            self._accum = None
            self._spp_done = 0

    # --- State::render (src/lib.rs:1012-1230) ---
    def render(self, block: bool = False):
        """Returns the device-resident (color, depth) arrays.

        block=True forces a REAL device sync (a tiny device->host fetch —
        block_until_ready does not reliably synchronize on tunneled TPU
        backends, see runtime/profiler.py), so last_frame_ms then includes
        one host round trip (~25-30 ms on remote chips). For honest
        steady-state numbers use profiler.time_frames."""
        t0 = time.perf_counter()
        uni = self.camera.uniforms().flat()
        color, depth = self._frame_fn(self.scene.data, uni)
        if block:
            from .profiler import device_sync

            device_sync(color)
        self.last_frame_ms = (time.perf_counter() - t0) * 1e3
        self.frame_count += 1
        self._last = (color, depth)
        return color, depth

    # --- State::resize (src/lib.rs:772-989) ---
    def resize(self, width: int, height: int):
        if width <= 0 or height <= 0:
            return  # the reference also ignores degenerate sizes
        self.width, self.height = width, height
        # Fix of the reference's aspect-lag bug: use the NEW size.
        self.camera.aspect = width / height
        self._rc_replace(width=width, height=height)
        self._build_frame_fn()

    def _rc_replace(self, **kw):
        import dataclasses as dc

        self.config = dc.replace(
            self.config, render=dc.replace(self.config.render, **kw))

    # --- presentation (screenquad.wgsl analogue) ---
    def present_image(self, srgb: bool = True, color=None) -> np.ndarray:
        """Fetch + encode a framebuffer (the latest render by default;
        pass `color` to present an older device array — the pipelined
        FrameLoop presents frame k-1 while frame k renders).

        The sRGB quantize runs ON DEVICE (io.image_out.encode_u8_device)
        so only the u8 image crosses the host link — 4x less transfer
        than fetching the f32 framebuffer, which dominated interactive
        fps on tunneled chips (measured: 1080p FrameLoop 1.2 -> ~4 fps).
        File writers and goldens keep the host encode (bit-pinned)."""
        if color is None:
            color, _ = getattr(self, "_last", (None, None))
        if color is None:
            color, _ = self.render()
        if isinstance(color, jax.Array):
            img = np.asarray(jax.device_get(
                encode_u8_device(color, srgb=srgb)))
            return img[::-1]
        return framebuffer_to_image(jax.device_get(color), srgb=srgb)

    def save_png(self, path: str, srgb: bool = True):
        color, _ = getattr(self, "_last", (None, None))
        if color is None:
            color, _ = self.render()
        write_png(path, jax.device_get(color), srgb=srgb)

    # --- metrics ---
    @property
    def spp_done(self) -> int:
        """Accumulated progressive-PT samples per pixel (0 outside PT mode)."""
        return getattr(self, "_spp_done", 0)

    @property
    def pt_converged(self) -> bool:
        """True once progressive accumulation reached config.render.pt_spp."""
        rc = self.config.render
        return rc.pt_bounces > 0 and self.spp_done >= rc.pt_spp

    @property
    def mrays_per_s(self) -> float:
        if not np.isfinite(self.last_frame_ms):
            return float("nan")
        return (self.width * self.height) / (self.last_frame_ms * 1e-3) / 1e6
