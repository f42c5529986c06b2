"""Tracing / profiling utilities.

Plays the role of the reference's torch profiler ranges + CUDA-event phase
timing (SURVEY 5.1: record_function ranges at training_loop.py:314,349,374
and loss.py phase scopes; wall-clock Timing/<phase> stats at
training_loop.py:264-269,495-500).

On TPU: ``jax.named_scope`` annotates the HLO so ``jax.profiler`` traces
show the same phase structure; ``PhaseTimer`` measures host wall-clock
around ``block_until_ready`` for the per-tick Timing/<phase> stats.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


def scope(name: str):
    """Alias for jax.named_scope — used around model stages so device traces
    mirror the reference's record_function structure."""
    return jax.named_scope(name)


class PhaseTimer:
    """Wall-clock phase timing; report() yields Timing/<phase> means."""

    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self._totals[name] += time.perf_counter() - start
            self._counts[name] += 1

    def report(self, prefix='Timing/'):
        out = {f'{prefix}{k}': self._totals[k] / max(self._counts[k], 1)
               for k in self._totals}
        return out

    def reset(self):
        self._totals.clear()
        self._counts.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (open with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
