"""Wall-clock timing: the seconds() analog (reference host_utilities.h:25)
plus a phase-timer context used for the debug-timing stdout lines
(reference als.cu:728-763) and structured metrics."""

from __future__ import annotations

import contextlib
import time
from typing import Dict


def seconds() -> float:
    """Monotonic wall-clock seconds (reference seconds() uses
    gettimeofday; monotonic avoids NTP jumps)."""
    return time.monotonic()


class PhaseTimer:
    """Accumulates named phase durations; the getRuntime.sh /
    hermitiantime.sh / solvertime.sh aggregation built in."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = seconds()
        try:
            yield
        finally:
            if sync is not None:
                sync.block_until_ready()
            dt = seconds() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            lines.append(f"{name}: {self.totals[name]:.6f} s over "
                         f"{self.counts[name]} calls")
        return "\n".join(lines)
