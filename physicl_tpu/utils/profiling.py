"""Profiling hooks (SURVEY.md §5: the reference has only wall-clock
``run_time``; we add device-level tracing).

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-compatible device trace of everything dispatched inside;
* :class:`ChunkTimerStep` — a Step that records per-iteration wall time of
  the compiled pipeline at chunk granularity (negligible overhead: one
  host timestamp per chunk, amortized over K iterations).
"""

from __future__ import annotations

import contextlib
import time
from typing import List

import jax

from physicl_tpu.engine import Step

__all__ = ["trace", "ChunkTimerStep"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Device-level profiler trace: ``with profiling.trace('/tmp/prof'): ...``"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ChunkTimerStep(Step):
    """Records (iterations, wall_s, photon_steps_per_s) per engine chunk.

    Pure host-side observer: ``apply`` is an identity (records one tiny
    scalar so the engine can count valid iterations); timing happens in
    ``collect`` between chunk dispatches.
    """

    def __init__(self):
        self.data: List[tuple] = []
        self._last = None
        self._capacity = 0

    def setup(self, sim):
        self._last = time.perf_counter()

    def apply(self, state, ctx):
        self._capacity = state.capacity
        ctx.record(self, "tick", state.t)
        return state

    def collect(self, sim, records):
        now = time.perf_counter()
        iters = len(records["tick"])
        wall = now - self._last
        self._last = now
        if iters:
            self.data.append(
                (iters, wall, sim._host_n_alive * iters / max(wall, 1e-9)))
