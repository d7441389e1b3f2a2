"""Service-prefixed logging and metrics counters.

The reference logs with `[Service]`-prefixed println! gated by the
`debug` config int (config.rs:71; e.g. udp_service.rs:169-171) and
surfaces `pages_searched` / `servers_contacted` counters in results
(search_provider.rs:44-49, web.rs:318-323). Here: a tiny logger facade
plus a thread-safe counter registry that the serving layer exposes.
"""

from __future__ import annotations

import logging
import threading
import time
from collections import defaultdict
from contextlib import contextmanager

_root = logging.getLogger("dawnsearch")
if not _root.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(message)s"))
    _root.addHandler(_h)
    _root.setLevel(logging.INFO)


def service_logger(name: str) -> logging.Logger:
    """Logger named like the reference's [Service] prefixes."""
    return _root.getChild(name)


def set_debug(level: int) -> None:
    """Map the reference's integer debug flag to log levels."""
    _root.setLevel(logging.DEBUG if level > 0 else logging.INFO)


class Metrics:
    """Thread-safe counters + latency accumulators."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: dict[str, int] = defaultdict(int)
        self._timings: dict[str, list[float]] = defaultdict(list)
        self._samples: dict[str, list[float]] = defaultdict(list)

    def inc(self, name: str, amount: int = 1) -> None:
        with self._lock:
            self._counters[name] += amount

    def observe(self, name: str, seconds: float) -> None:
        with self._lock:
            buf = self._timings[name]
            buf.append(seconds)
            if len(buf) > 1000:
                del buf[: len(buf) - 1000]

    def record(self, name: str, value: float) -> None:
        """Raw sample series (batch sizes, counts — NOT durations).
        Surfaced by values() for benchmark breakdowns; snapshot() does
        not render it, so a 512-page batch never shows up as a bogus
        512000-ms latency percentile."""
        with self._lock:
            buf = self._samples[name]
            buf.append(value)
            if len(buf) > 1000:
                del buf[: len(buf) - 1000]

    @contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.observe(name, time.perf_counter() - t0)

    def values(self, name: str) -> list[float]:
        """Raw observation buffer (most recent <=1000) — for benchmark
        breakdowns that need sums/means, not just the p50/p99 the
        snapshot exposes."""
        with self._lock:
            if name in self._samples:
                return list(self._samples[name])
            return list(self._timings.get(name, ()))

    def reset(self) -> None:
        """Zero counters and timings (benchmarks call this after
        warmup so percentiles exclude compile-time one-offs)."""
        with self._lock:
            self._counters.clear()
            self._timings.clear()
            self._samples.clear()

    def snapshot(self) -> dict:
        with self._lock:
            out: dict = dict(self._counters)
            for name, buf in self._timings.items():
                if buf:
                    s = sorted(buf)
                    out[f"{name}_p50_ms"] = 1e3 * s[len(s) // 2]
                    out[f"{name}_p99_ms"] = 1e3 * s[min(len(s) - 1, int(len(s) * 0.99))]
                    out[f"{name}_count"] = len(buf)
            return out


METRICS = Metrics()
