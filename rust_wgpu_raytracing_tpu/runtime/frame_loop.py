"""Interactive frame loop — the analogue of the reference's winit event
loop (src/lib.rs:1305-1352: MainEventsCleared -> request_redraw ->
update() -> render(), with SurfaceError recovery).

Headless-friendly: input events come from a queue (the HTTP shell in
server.py feeds it; scripts can push keys programmatically), frames are
presented through a callback. Error handling mirrors the reference's
render-error match (lib.rs:1338-1347): recoverable errors trigger a
device reset + resize, OOM aborts.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from .profiler import Profiler
from .renderer import Renderer


@dataclass
class KeyEvent:
    key: str
    pressed: bool


# Classification of render errors, mirroring the reference's match on
# SurfaceError (src/lib.rs:1338-1347): Lost/Outdated -> recreate + retry,
# OutOfMemory -> abort, Timeout -> warn-and-skip, everything else (a
# programming error) -> surface as itself immediately.
_OOM_MARKERS = ("RESOURCE_EXHAUSTED", "Out of memory", "OOM")
_LOST_MARKERS = ("UNAVAILABLE", "ABORTED", "FAILED_PRECONDITION",
                 "Device or resource busy", "socket closed",
                 "connection reset")
_TIMEOUT_MARKERS = ("DEADLINE_EXCEEDED",)


def classify_render_error(exc: BaseException) -> str:
    """'oom' | 'lost' | 'timeout' | 'fatal' for a render-path exception.

    Only runtime/device errors (JaxRuntimeError / XlaRuntimeError /
    MemoryError) are ever recoverable; Python-level exceptions are
    deterministic programming errors and always 'fatal'.
    """
    if isinstance(exc, MemoryError):
        return "oom"
    name = type(exc).__name__
    if name not in ("JaxRuntimeError", "XlaRuntimeError"):
        return "fatal"
    msg = str(exc)
    if any(m in msg for m in _OOM_MARKERS):
        return "oom"
    if any(m in msg for m in _TIMEOUT_MARKERS):
        return "timeout"
    if any(m in msg for m in _LOST_MARKERS):
        return "lost"
    return "fatal"


class FrameLoop:
    def __init__(self, renderer: Renderer,
                 present: Optional[Callable[[np.ndarray], None]] = None,
                 max_fps: Optional[float] = None, pipeline: bool = True):
        self.renderer = renderer
        self.present = present
        self.max_fps = max_fps
        self.pipeline = pipeline
        self.events: "queue.Queue[KeyEvent]" = queue.Queue()
        self.profiler = Profiler()
        self.running = False
        self.frame_index = 0
        self._stopped = False  # sticky: a stop() before run() must win
        self._resize_req: Optional[tuple] = None
        self._inflight = None  # device framebuffer of the youngest dispatch

    # --- input path (State::input, src/lib.rs:990-992) ---
    def push_key(self, key: str, pressed: bool = True):
        self.events.put(KeyEvent(key, pressed))

    def request_resize(self, width: int, height: int):
        """Thread-safe resize request (WindowEvent::Resized analogue,
        src/lib.rs:1325): applied by the RENDER thread at the start of
        the next step — Renderer.resize rebuilds jit state and must not
        race an in-flight render."""
        self._resize_req = (int(width), int(height))

    def _drain_events(self):
        req, self._resize_req = self._resize_req, None
        if req is not None and req != (self.renderer.width,
                                       self.renderer.height):
            # Drop the in-flight frame: it was rendered at the OLD
            # resolution and must not be presented after the resize.
            self._inflight = None
            self.renderer.resize(*req)
        while True:
            try:
                ev = self.events.get_nowait()
            except queue.Empty:
                return
            self.renderer.controller.process_key(ev.key, ev.pressed)

    # --- one iteration of the redraw cycle ---
    def step(self) -> np.ndarray:
        self._drain_events()
        self.renderer.update()
        t0 = time.perf_counter()
        color = None  # this step's framebuffer; stays None on a skipped frame
        try:
            color, _ = self.renderer.render()
        except Exception as err:
            kind = classify_render_error(err)
            if kind == "oom":
                # the reference exits on OutOfMemory (lib.rs:1343)
                self.running = False
                raise
            if kind == "timeout":
                # the reference warns and carries on (lib.rs:1345-1346)
                import logging

                logging.getLogger(__name__).warning(
                    "frame %d render timeout: %s", self.frame_index, err)
            elif kind == "lost":
                # Lost/Outdated analogue: rebuild size-dependent state and
                # retry once (lib.rs:1341-1342); if the retry also fails,
                # re-raise the ORIGINAL error, not the retry's
                self._inflight = None  # dispatched pre-reset: don't present
                self.renderer.resize(self.renderer.width,
                                     self.renderer.height)
                try:
                    color, _ = self.renderer.render()
                except Exception:
                    self.running = False
                    raise err
            else:
                # deterministic programming error: surface as itself
                self.running = False
                raise
        # Present-overlap pipeline: render() only DISPATCHES (async);
        # fetch + encode the PREVIOUS frame while this one computes, so
        # the tunneled-chip host round trip (~25-30 ms) hides behind
        # render instead of serializing with it (the reference's
        # output.present() has no such latency to hide, src/lib.rs:1227).
        # One frame of presentation latency; run()/flush() drain the
        # final in-flight frame so every rendered frame is presented.
        # A skipped frame (timeout) leaves color=None: the in-flight
        # frame is presented but NOT re-enqueued (no double present).
        img = None
        if self.pipeline:
            prev, self._inflight = self._inflight, color
            if prev is not None:
                img = self.renderer.present_image(color=prev)
        else:
            img = self.renderer.present_image()
        self.profiler.record((time.perf_counter() - t0) * 1e3)
        if img is not None and self.present is not None:
            self.present(img)
        self.frame_index += 1
        return img

    def flush(self) -> Optional[np.ndarray]:
        """Present the youngest dispatched-but-unpresented frame (the
        pipeline's one-frame latency tail)."""
        color, self._inflight = self._inflight, None
        if color is None:
            return None
        img = self.renderer.present_image(color=color)
        if self.present is not None:
            self.present(img)
        return img

    def run(self, n_frames: Optional[int] = None):
        """Blocking loop (the event_loop.run analogue). A stop() issued
        before run() starts (e.g. a window closed while the render
        thread spins up) is honored — running is never re-asserted over
        a sticky stop."""
        self.running = not self._stopped
        count = 0
        while self.running and (n_frames is None or count < n_frames):
            t0 = time.perf_counter()
            self.step()
            count += 1
            if self.max_fps:
                budget = 1.0 / self.max_fps - (time.perf_counter() - t0)
                if budget > 0:
                    time.sleep(budget)
        self.running = False
        self.flush()

    def run_async(self, n_frames: Optional[int] = None) -> threading.Thread:
        th = threading.Thread(target=self.run, args=(n_frames,), daemon=True)
        th.start()
        return th

    def stop(self):
        self._stopped = True
        self.running = False
