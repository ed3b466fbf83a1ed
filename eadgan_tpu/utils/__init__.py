"""Observability utilities: structured metric logging + profiler hooks.

The reference's only observability is printf (SURVEY.md section 5);
here every step's scalars also land in a JSONL stream, and a profiler
context wraps the jitted step for ``jax.profiler`` traces.
"""

from eadgan_tpu.utils.logging import MetricLogger
from eadgan_tpu.utils.profiler import step_timer, trace

__all__ = ["MetricLogger", "trace", "step_timer"]
