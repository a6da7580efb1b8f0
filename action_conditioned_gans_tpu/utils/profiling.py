"""Profiling / tracing hooks (SURVEY.md §6).

The reference had nothing beyond TensorBoard scalars; here training can wrap
any step window in a ``jax.profiler`` trace (Perfetto/XProf-compatible) and
the bench harness does roofline accounting from XLA's cost analysis
(``bench.step_cost_flops``).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed steps:

        with profiling.trace("/tmp/trace"):
            for _ in range(10):
                state, m = step(state, batch, rng)
            jax.block_until_ready(m)

    View with XProf/TensorBoard or Perfetto.
    """
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named host-side region, visible in the trace timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Blocking wall-clock timer for ad-hoc measurements outside the bench
    harness (which remains the source of truth for BASELINE metrics)."""

    def __init__(self):
        self.samples = []

    @contextlib.contextmanager
    def measure(self, result_to_block_on=None):
        t0 = time.perf_counter()
        yield
        if result_to_block_on is not None:
            jax.block_until_ready(result_to_block_on)
        self.samples.append(time.perf_counter() - t0)

    def p50(self) -> Optional[float]:
        if not self.samples:
            return None
        xs = sorted(self.samples)
        return xs[len(xs) // 2]
