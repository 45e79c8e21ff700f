"""Tracing/profiling hooks (the reference has none — SURVEY.md §5; its only
introspection is tqdm bars and the OOM prober)."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: Path | str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sink: Optional[list] = None) -> Iterator[None]:
    """Wall-clock a block (blocks on async device work via barrier)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        try:
            jax.effects_barrier()
        except Exception:
            pass
        dt = time.perf_counter() - t0
        if sink is not None:
            sink.append((label, dt))
        else:
            print(f"[timed] {label}: {dt:.3f}s")
