"""Profiling/tracing utilities (SURVEY.md section 5: the reference has only
MetricLogger's iteration timing; the TPU build adds jax.profiler traces).

Usage:
    with trace("/tmp/uniir-trace"):          # XLA/TPU trace for TensorBoard
        state, m = train_step(state, batch)

    with annotate("embed-sweep"):            # named region inside a trace
        ...

    timer = StepTimer()
    with timer:                               # wall-time a host-side block
        ...
    print(timer.elapsed)
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace into `log_dir` (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Minimal wall-clock context timer for host-side phases."""

    def __init__(self) -> None:
        self.elapsed: float = 0.0
        self._t0: Optional[float] = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self._t0


def device_memory_stats() -> dict:
    """Per-device HBM stats (bytes_in_use etc.), empty when unsupported."""
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = stats
    return out
