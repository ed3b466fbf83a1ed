"""Observability utilities: structured metric logging + profiler hooks.

The reference's only observability is printf (SURVEY.md section 5);
here every step's scalars also land in a JSONL stream, and a profiler
context wraps the jitted step for ``jax.profiler`` traces.
"""

from eadgan_tpu.utils.logging import MetricLogger
from eadgan_tpu.utils.profiler import step_timer, trace
from eadgan_tpu.utils.watchdog import STALL_EXIT_CODE, Watchdog

__all__ = ["MetricLogger", "trace", "step_timer", "Watchdog", "STALL_EXIT_CODE"]
