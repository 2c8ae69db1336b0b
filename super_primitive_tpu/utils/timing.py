"""Structured per-stage timing + optional jax.profiler traces.

The reference's only timing surface is wall-clock prints around tracking and
mapping (odometery.py:330,425-428,694,935-937 with cuda.synchronize).  This
gives the same numbers in a structured, queryable form, plus opt-in XLA
profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional

import jax


class StageTimer:
    """Accumulates per-stage wall-clock with device synchronization."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.last: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1
        self.last[name] = dt

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 2),
            }
            for name in self.totals
        }

    def report(self) -> str:
        lines = [f"{'stage':<24}{'calls':>7}{'mean ms':>10}{'total s':>10}"]
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:<24}{s['count']:>7}{s['mean_ms']:>10.2f}{s['total_s']:>10.3f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """Opt-in jax.profiler trace (view with TensorBoard/xprof)."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
