"""Profiling hooks around the jitted step (green-field; the reference's
single timing call is commented out, MNIST/approximate_rpqmnxy.py:116).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace", "step_timer"]


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class step_timer:
    """Rolling steps/sec and images/sec meter.

    Forces each step's result to the host (``device_get``) — reliable on
    remote runtimes where block_until_ready returns early, at the cost
    of serializing dispatch; use only for measurement, and prefer the
    in-graph fori-loop differencing of bench.py for precise numbers.
    """

    def __init__(self, warmup: int = 2):
        self.warmup = max(warmup, 0)
        self.count = 0
        self._t0 = None
        self.images = 0

    def tick(self, result, batch_size: int) -> None:
        jax.device_get(jax.tree.leaves(result)[:1])
        self.count += 1
        if self.count >= self.warmup and self._t0 is None:
            self._t0 = time.perf_counter()
            self.images = 0
        elif self._t0 is not None:
            self.images += batch_size

    @property
    def images_per_sec(self) -> float:
        if self._t0 is None or self.images == 0:
            return 0.0
        return self.images / (time.perf_counter() - self._t0)

    @property
    def steps_per_sec(self) -> float:
        if self._t0 is None or self.count <= self.warmup:
            return 0.0
        return (self.count - self.warmup) / (time.perf_counter() - self._t0)
