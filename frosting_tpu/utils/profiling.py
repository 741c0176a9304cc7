"""Profiling & observability: jax.profiler traces, step timers, throughput
counters.

The reference has no profiling subsystem (SURVEY.md §5 — wall-clock prints
every 200 iters only); this provides the TPU-native equivalents: TensorBoard
trace capture around hot regions, EMA step timers with Mpix/s, and a tiny
JSONL metrics logger that trainers can tee into.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard/XPlane trace of the enclosed region
    (view with tensorboard --logdir)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region inside a trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """EMA-smoothed step timer with derived throughput counters."""

    def __init__(self, pixels_per_step: int = 0, ema: float = 0.9):
        self.pixels = pixels_per_step
        self.ema = ema
        self._avg: Optional[float] = None
        self._last = time.perf_counter()

    def tick(self) -> Dict[str, float]:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self._avg = dt if self._avg is None else (
            self.ema * self._avg + (1 - self.ema) * dt
        )
        out = {
            "step_ms": self._avg * 1e3,
            "steps_per_s": 1.0 / max(self._avg, 1e-12),
        }
        if self.pixels:
            out["mpix_per_s"] = self.pixels / self._avg / 1e6
        return out


class MetricsLogger:
    """Append-only JSONL metrics sink (the TensorBoard-lite of the vanilla
    trainer, gaussian_splatting/train.py:26-30, without the dependency)."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, step: int, **metrics):
        if self._f is None:
            return
        rec = {"step": step, "t": time.time()}
        rec.update(
            {
                k: (float(v) if hasattr(v, "__float__") else v)
                for k, v in metrics.items()
            }
        )
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        if self._f:
            self._f.close()


def device_memory_stats() -> Dict[str, int]:
    """HBM usage of the first device (the torch.cuda.memory_summary
    analogue, refine.py:252)."""
    try:
        stats = jax.devices()[0].memory_stats()
        return {
            "bytes_in_use": stats.get("bytes_in_use", -1),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
            "bytes_limit": stats.get("bytes_limit", -1),
        }
    except Exception:
        return {}
