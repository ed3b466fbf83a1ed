"""Structured per-step scalar logging.

Prints the reference-style progress lines (e.g. dSprites/rp.py:491-496)
*and* appends machine-readable JSONL records, replacing print-only
observability.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping, Optional

__all__ = ["MetricLogger"]


class MetricLogger:
    def __init__(self, jsonl_path: Optional[str] = None, print_every: int = 100):
        self.jsonl_path = jsonl_path
        self.print_every = print_every
        self._start = time.time()
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
            self._fh = open(jsonl_path, "a")
        else:
            self._fh = None

    def log(
        self,
        step: int,
        metrics: Mapping[str, float],
        *,
        epoch: Optional[int] = None,
        n_epochs: Optional[int] = None,
        batch: Optional[int] = None,
        n_batches: Optional[int] = None,
    ) -> None:
        should_print = step % self.print_every == 0
        if self._fh is None and not should_print:
            # avoid the device->host sync of float() on steps where
            # nothing is written or shown
            return
        record = {"step": step, "t": round(time.time() - self._start, 3)}
        record.update({k: float(v) for k, v in metrics.items()})
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if should_print:
            prefix = ""
            if epoch is not None and n_epochs is not None:
                prefix += f"[Epoch {epoch}/{n_epochs}] "
            if batch is not None and n_batches is not None:
                prefix += f"[Batch {batch}/{n_batches}] "
            body = " ".join(f"[{k}: {float(v):f}]" for k, v in metrics.items())
            print(prefix + body, flush=True)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
