"""Global inference-throughput window, excluding warmup.

Reference counterpart: ``perf_observer`` (src/utils/perf_observer.{hpp,cpp})
— a process-global window that accumulates total inferences and reports
``total / duration`` over the span between the first and the last
non-warmup completion; warmup jobs never count. The reference records
into it from the ResultDispatcher (record_job_metrics,
src/starpu_task_worker/result_dispatcher_component.cpp:407-456) and the
dual instance/global API mirrors the metrics facade convention
(src/monitoring/metrics.hpp:696-760).
"""

from __future__ import annotations

import threading
from typing import Optional

from .clock import now_s


class PerfObserver:
    """Throughput window: total inferences / (last - first) seconds."""

    def __init__(self):
        self._lock = threading.Lock()
        self._total = 0
        self._first_at: Optional[float] = None
        self._last_at: Optional[float] = None

    def record(self, inferences: int, warmup: bool = False) -> None:
        """Count ``inferences`` completed samples. Warmup is excluded
        (reference: perf observer throughput excludes warmup; warmup rows
        are likewise suppressed in traces)."""
        if warmup or inferences <= 0:
            return
        t = now_s()
        with self._lock:
            if self._first_at is None:
                self._first_at = t
            self._last_at = t
            self._total += inferences

    @property
    def total(self) -> int:
        with self._lock:
            return self._total

    def window_s(self) -> float:
        with self._lock:
            if self._first_at is None or self._last_at is None:
                return 0.0
            return self._last_at - self._first_at

    def throughput(self) -> float:
        """Inferences per second over the observed window; 0.0 until two
        distinct completion instants exist."""
        with self._lock:
            if self._first_at is None or self._last_at is None:
                return 0.0
            span = self._last_at - self._first_at
            if span <= 0.0:
                return 0.0
            return self._total / span

    def reset(self) -> None:
        with self._lock:
            self._total = 0
            self._first_at = None
            self._last_at = None


_GLOBAL = PerfObserver()


def global_perf_observer() -> PerfObserver:
    """The process-global observer (reference: free-function fallback API
    convention, src/monitoring/metrics.hpp:696-760)."""
    return _GLOBAL


def record_inferences(inferences: int, warmup: bool = False) -> None:
    _GLOBAL.record(inferences, warmup=warmup)


def observed_throughput() -> float:
    return _GLOBAL.throughput()
