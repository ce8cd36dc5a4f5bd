"""Per-phase timing + trace capture.

The reference's ScopeTime/SampledScopeTime timers are declared but dead
(types.hpp:77-98, all uses commented out); here phase metrics are
first-class: a lightweight host-side phase timer (correct under JAX async
dispatch by forcing a scalar sync) and a jax.profiler trace context for
deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase. `sync` arg forces device
    completion (pass the phase's output pytree) so the measurement covers
    the device work, not just dispatch."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def mean_ms(self, name: str) -> float:
        c = self.counts.get(name, 0)
        return 1000.0 * self.totals[name] / c if c else 0.0

    def report(self) -> str:
        lines = [
            f"  {k:24s} {self.mean_ms(k):9.2f} ms/frame  (x{self.counts[k]})"
            for k in sorted(self.totals, key=lambda k: -self.totals[k])
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/df_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
