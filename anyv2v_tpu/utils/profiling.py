"""Profiling hooks (SURVEY.md §5 — greenfield vs the reference, which has
only tqdm progress bars): ``jax.profiler`` trace capture + lightweight
per-phase wall-clock timers.

Usage:
    with trace_if("/tmp/xprof"):           # no-op when dir is falsy
        run_hot_loop()

    timers = PhaseTimers()
    with timers.phase("invert"):
        ...
    timers.report()   # {"invert": 12.3, ...}

Traces are XProf/TensorBoard-compatible (``jax.profiler.trace`` output).
CLI surface: every driver accepts ``profile_dir`` in its config; bench.py
honors ``BENCH_PROFILE=<dir>``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace_if(trace_dir: Optional[str]):
    """jax.profiler.trace(trace_dir) when trace_dir is set, else no-op."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


class PhaseTimers:
    """Named wall-clock phases with device-sync boundaries."""

    def __init__(self) -> None:
        self.seconds: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        """``sync``: optional array/pytree to block_until_ready at exit so the
        timer covers async device work."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            self.seconds[name] = self.seconds.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self) -> Dict[str, float]:
        return {k: round(v, 3) for k, v in self.seconds.items()}
