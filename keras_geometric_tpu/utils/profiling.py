"""Profiling and roofline accounting utilities.

The reference has no tracing/profiling subsystem (SURVEY.md §5 — only
``time.time()`` deltas in tests). This module provides:

- :func:`trace`: context manager around ``jax.profiler`` writing a TensorBoard
  trace directory (works on TPU; inspect with xprof/tensorboard);
- :func:`timed_steps`: RTT-immune step timing on relayed/tunneled backends
  (iteration-count slope with device_get syncs — ``block_until_ready`` can
  return early through a relay);
- :class:`Roofline`: analytic FLOP/byte accounting for the framework's core
  ops, reporting utilization against per-chip peaks.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable

import jax

__all__ = ["trace", "timed_steps", "Roofline", "CHIP_SPECS"]

# (peak bf16 TFLOP/s, peak fp32-ish TFLOP/s, HBM GB/s) per chip generation.
CHIP_SPECS = {
    "v4": (275.0, 137.0, 1228.0),
    "v5e": (197.0, 98.0, 819.0),
    "v5p": (459.0, 229.0, 2765.0),
    "v6e": (918.0, 459.0, 1640.0),
}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/kgt_trace"):
    """Capture a jax.profiler trace around the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed_steps(
    fn: Callable[[], jax.Array],
    *,
    k_lo: int = 2,
    k_hi: int = 22,
    trials: int = 3,
) -> float:
    """Seconds per call of ``fn`` (which must return a device array).

    Cancels the device-fetch round-trip by differencing two iteration
    counts; each measurement syncs with ``device_get`` on one element.
    """

    def run(k: int) -> float:
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn()
            _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best

    _ = run(1)  # warm
    slope = (run(k_hi) - run(k_lo)) / (k_hi - k_lo)
    # Host-load noise can push a tiny workload's slope to ~0 or below
    # (the r5 machine adds heavy hypervisor steal); re-measure with a
    # wider iteration spread until the signal dominates.
    tries = 0
    while slope <= 0 and tries < 3:
        k_lo, k_hi = k_lo * 2, k_hi * 4
        slope = (run(k_hi) - run(k_lo)) / (k_hi - k_lo)
        tries += 1
    return max(slope, 1e-9)


@dataclasses.dataclass
class Roofline:
    """Accumulates FLOP/byte counts and reports utilization."""

    chip: str = "v5e"
    flops: float = 0.0
    bytes: float = 0.0

    def add_matmul(self, m: int, k: int, n: int, dtype_bytes: int = 4):
        self.flops += 2.0 * m * k * n
        self.bytes += dtype_bytes * (m * k + k * n + m * n)
        return self

    def add_spmm(self, e: int, f: int, n: int, dtype_bytes: int = 4):
        """Gather+scatter over E edges with F features into N rows."""
        self.bytes += dtype_bytes * (2 * e * f + n * f) + 4 * e
        return self

    def add_elementwise(self, elems: int, dtype_bytes: int = 4, passes: int = 2):
        self.bytes += dtype_bytes * elems * passes
        return self

    def report(self, seconds: float, *, use_bf16_peak: bool = False) -> dict:
        peak_bf16, peak_f32, peak_bw = CHIP_SPECS[self.chip]
        peak_flops = (peak_bf16 if use_bf16_peak else peak_f32) * 1e12
        peak_bytes = peak_bw * 1e9
        t_compute = self.flops / peak_flops
        t_memory = self.bytes / peak_bytes
        bound = "compute" if t_compute > t_memory else "memory"
        sol = max(t_compute, t_memory)
        return {
            "seconds": seconds,
            "speed_of_light_s": sol,
            "efficiency": sol / seconds if seconds > 0 else 0.0,
            "bound": bound,
            "achieved_tflops": self.flops / seconds / 1e12 if seconds else 0.0,
            "achieved_gbps": self.bytes / seconds / 1e9 if seconds else 0.0,
            "hbm_utilization": (
                (self.bytes / seconds) / peak_bytes if seconds else 0.0
            ),
        }
