"""Tracing / profiling / metrics utilities.

The reference has no profiling beyond wall-clock scripts (SURVEY.md §5);
here we provide: jax.profiler trace capture, named trace annotations, a
step-time + pairs/sec meter, and a minimal metric logger with pluggable
sinks (stdout JSON-lines, optional wandb when available) replacing the
reference's hard-wired ``wandb.log(..., step=romatch.GLOBAL_STEP)`` calls.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Callable

import jax


@contextlib.contextmanager
def trace(dir: str):
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for traces (wraps jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Step-time / throughput meter with warmup skip."""

    def __init__(self, items_per_step: int = 1, warmup: int = 1):
        self.items_per_step = items_per_step
        self.warmup = warmup
        self._times: list[float] = []
        self._t0: float | None = None
        self._steps = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._steps += 1
        if self._steps > self.warmup:
            self._times.append(dt)

    @property
    def mean_step_time(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    @property
    def items_per_sec(self) -> float:
        t = self.mean_step_time
        return self.items_per_step / t if t > 0 else 0.0


class MetricLogger:
    """JSON-lines metric logger; process-0 only; optional wandb sink."""

    def __init__(self, use_wandb: bool = False, file: str | None = None):
        self.enabled = jax.process_index() == 0
        self._file = open(file, "a") if (file and self.enabled) else None
        self._wandb = None
        if use_wandb and self.enabled:
            try:
                import wandb

                self._wandb = wandb
            except ImportError:
                pass

    def log(self, metrics: dict[str, Any], step: int):
        if not self.enabled:
            return
        payload = {k: float(v) for k, v in metrics.items()}
        if self._wandb is not None:
            self._wandb.log(payload, step=step)
        line = json.dumps({"step": step, **payload})
        if self._file is not None:
            self._file.write(line + "\n")
            self._file.flush()
        else:
            print(line)
