"""Lightweight metrics/logging for training loops.

The reference has no metrics/observability beyond prints (SURVEY.md §5);
this module provides a minimal structured logger and jit-friendly metric
helpers shared by examples and benchmarks.
"""

from __future__ import annotations

import json
import time
from typing import Any

__all__ = ["MetricLogger"]


class MetricLogger:
    """Collects scalar metrics per step and emits JSONL or stdout lines."""

    def __init__(self, path: str | None = None, print_every: int = 0) -> None:
        self.path = path
        self.print_every = print_every
        self.history: list[dict[str, Any]] = []
        self._file = open(path, "a") if path else None
        self._start = time.time()

    def log(self, step: int, **metrics: float) -> None:
        rec = {"step": int(step), "time": time.time() - self._start}
        rec.update({k: float(v) for k, v in metrics.items()})
        self.history.append(rec)
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self.print_every and step % self.print_every == 0:
            parts = "  ".join(f"{k} {v:.4f}" for k, v in metrics.items())
            print(f"step {step:6d}  {parts}")

    def close(self) -> None:
        if self._file:
            self._file.close()
