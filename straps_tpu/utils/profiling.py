"""Lightweight step timing + jax.profiler trace hooks.

The reference has no tracing/profiling at all (SURVEY.md §5); this provides
per-step wall-time accounting wired into the training loop and an optional
on-demand XLA trace capture.
"""

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class StepTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        yield
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def mean_ms(self, name: str) -> float:
        c = self.counts.get(name, 0)
        return (self.totals[name] / c * 1e3) if c else 0.0

    def summary(self) -> str:
        return " ".join(f"{k}={self.mean_ms(k):.1f}ms" for k in self.totals)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture an XLA profiler trace around a block (no-op if log_dir None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_persistent_compile_cache(path: str = None) -> str:
    """Point JAX's persistent compilation cache at a stable directory.

    The CLIs call this at startup so repeat invocations skip XLA
    recompilation (the reference has no equivalent concern — torch eagerly
    executes; here a cold 800² detector program costs minutes to build).
    Override the location with $STRAPS_TPU_COMPILE_CACHE; set it to the
    empty string to disable.
    """
    import os
    import tempfile

    if path is None:
        path = os.environ.get(
            "STRAPS_TPU_COMPILE_CACHE",
            os.path.join(tempfile.gettempdir(), "straps_tpu_jax_cache"))
    if path:
        jax.config.update("jax_compilation_cache_dir", path)
    return path
