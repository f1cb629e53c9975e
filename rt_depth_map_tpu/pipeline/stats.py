"""Per-stage execution-time statistics.

Re-creates the reference's macro timing subsystem (include/estimator.h:46-80
+ estimator.cpp:265-292): each pipeline call site accumulates a running mean
of its execution time in call order; a report prints per-stage means, the
iteration count, and the overall per-frame sum. The reference prints this on
SIGINT; the Engine wires the same signal plus atexit.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List


class _StageAcc:
    __slots__ = ("name", "total", "count")

    def __init__(self, name: str):
        self.name = name
        self.total = 0.0
        self.count = 0

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0


class ExecTimeStats:
    """Call-order stage table (exec_times_tab parity, estimator.h:112-114)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._stages: Dict[str, _StageAcc] = {}
        self._order: List[str] = []
        self.iterations = 0

    def start_iteration(self) -> None:
        """MEASURE_EXECUTION_TIME_START parity: begin a new frame."""
        self.iterations += 1

    @contextlib.contextmanager
    def measure(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            acc = self._stages.get(name)
            if acc is None:
                acc = _StageAcc(name)
                self._stages[name] = acc
                self._order.append(name)
            acc.total += dt
            acc.count += 1

    def add(self, name: str, seconds: float) -> None:
        acc = self._stages.get(name)
        if acc is None:
            acc = _StageAcc(name)
            self._stages[name] = acc
            self._order.append(name)
        acc.total += seconds
        acc.count += 1

    def report(self) -> str:
        """print_exec_time_stats parity (estimator.cpp:265-292): aligned
        per-stage mean + period count + overall sum."""
        if not self._order:
            return "no timing data collected\n"
        width = max(len(n) for n in self._order)
        lines = ["", "Mean execution times:", ""]
        overall = 0.0
        for name in self._order:
            acc = self._stages[name]
            overall += acc.mean
            lines.append(
                f"  {name:<{width}} : {acc.mean * 1e3:9.3f} ms"
                f"  (n={acc.count})"
            )
        lines.append("-" * (width + 30))
        lines.append(
            f"  {'overall (sum of means)':<{width}} : {overall * 1e3:9.3f} ms"
            f"  over {self.iterations} iterations"
        )
        if overall > 0:
            lines.append(f"  {'implied fps':<{width}} : {1.0 / overall:9.2f}")
        lines.append("")
        return "\n".join(lines)
