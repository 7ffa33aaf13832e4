"""Timing/metrics harness (the observability subsystem the reference
lacks — SURVEY §5.1/5.5: no timers, no FPS counter in the reference).

Methodology note (measured on this TPU backend): dispatches are async,
`block_until_ready` does NOT reliably synchronize on tunneled devices,
and any host<->device round trip costs ~25-30 ms of network latency.
Correct wall-clock numbers therefore come from AMORTIZED timing: pipe-
line N dispatches back to back, force one real synchronization at the
end (a device->host fetch), and divide. `device_sync` implements the
real sync; `time_frames` implements the amortized loop.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def device_sync(tree) -> float:
    """Force completion of everything queued before `tree` and return a
    cheap checksum. A tiny slice keeps the host transfer negligible."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:8]))


def time_frames(frame_fn: Callable[[], object], n: int = 20,
                warmup: int = 1) -> float:
    """Amortized ms/frame over n pipelined dispatches (one end sync).

    The end sync is a host<->device round trip (~25-30 ms over the
    tunneled backend) that has nothing to do with the device's frame
    time, yet lands INSIDE the timed window — at n=10 that silently
    inflated every round-2/3 number by ~3 ms/frame (the same fused
    dense frame read 16.6 ms at n=20 and 20.9 ms at n=10 before this
    fix). Calibrate the pure round-trip cost on an already-complete
    result (min of 3 — the first fetch can pay connection setup) and
    subtract it, so the figure measures the chip, not the tunnel."""
    r = None
    for _ in range(warmup):
        r = frame_fn()
    device_sync(r)
    rt = min(_timed_sync(r) for _ in range(3))
    t0 = time.perf_counter()
    for _ in range(n):
        r = frame_fn()
    device_sync(r)
    return max(0.0, (time.perf_counter() - t0 - rt)) * 1e3 / n


def _timed_sync(r) -> float:
    """Seconds for one device_sync on an already-complete result —
    the pure host<->device fetch latency, no device work included."""
    t0 = time.perf_counter()
    device_sync(r)
    return time.perf_counter() - t0


@dataclass
class FrameStats:
    """Per-frame structured stats (SURVEY §5.5)."""

    frame_ms: float
    width: int
    height: int
    primary_rays: int
    shadow_rays: int = 0

    @property
    def mrays_per_s(self) -> float:
        total = self.primary_rays + self.shadow_rays
        return total / (self.frame_ms * 1e-3) / 1e6


@dataclass
class Profiler:
    """Rolling frame statistics for the interactive loop."""

    window: int = 60
    _times: List[float] = field(default_factory=list)

    def record(self, frame_ms: float):
        self._times.append(frame_ms)
        if len(self._times) > self.window:
            self._times.pop(0)

    @property
    def mean_ms(self) -> float:
        return float(np.mean(self._times)) if self._times else float("nan")

    @property
    def p99_ms(self) -> float:
        return float(np.percentile(self._times, 99)) if self._times else float("nan")

    def summary(self) -> Dict[str, float]:
        return {"mean_ms": self.mean_ms, "p99_ms": self.p99_ms,
                "frames": len(self._times)}
