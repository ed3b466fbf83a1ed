"""Stall watchdog: detect a wedged training process so a supervisor can
relaunch it with ``--resume auto``.

The reference cannot even observe this failure class — it has no
logging, no resume, and a crash loses the run (SURVEY.md section 5,
"Failure detection ... absent").  This repo's 600k-step CelebA soak hit
the live version of it: one remote-execution RPC hung mid-run (host
thread blocked inside a jax call forever, ~0 process CPU, log mtime
frozen for >25 min while the device itself stayed healthy) and had to
be diagnosed and killed by hand (evidence/soak_r3/celeba_600k/).

A hung runtime call cannot be interrupted from Python: the main thread
is parked in foreign code and never returns to the interpreter, so
signal handlers and exceptions never run.  Recovery therefore comes
from *outside* the call: a daemon thread watches a heartbeat the
training loop taps once per dispatched window, and when no beat lands
for ``timeout`` seconds it dumps every thread's stack (the diagnostic
that was gathered manually for the soak hang), writes a one-line JSON
stall record, and hard-exits the process with ``STALL_EXIT_CODE``.
``eadgan_tpu.cli.supervise`` recognizes that exit code and relaunches
the trainer with ``--resume auto``, which restores the newest
checkpoint — the exact recovery that was performed by hand.

The first heartbeat interval is judged against a separate, larger
``first_timeout``: the first window includes the train-step compile,
which costs 30 s - 7 min through the remote-compile tunnel.
"""

from __future__ import annotations

import faulthandler
import json
import os
import sys
import threading
import time

__all__ = ["Watchdog", "STALL_EXIT_CODE"]

# Distinctive exit code the supervisor keys on.  Chosen clear of shell
# conventions (1/2), Python defaults and the 128+signal band.
STALL_EXIT_CODE = 87


class Watchdog:
    """Heartbeat monitor that hard-exits a wedged process.

    ``beat(step)`` is called by the training loop after each completed
    dispatch; ``start()`` arms the monitor thread; ``stop()`` disarms it
    (normal end of training).  If ``on_stall`` is provided it replaces
    the default exit action (used by tests); the default action writes
    diagnostics to stderr plus ``diag_path`` and calls
    ``os._exit(STALL_EXIT_CODE)`` — ``sys.exit`` would only raise in the
    watchdog thread while the wedged main thread keeps not responding.
    """

    def __init__(
        self,
        timeout: float,
        first_timeout: float | None = None,
        on_stall=None,
        diag_path: str | None = None,
    ):
        if timeout <= 0:
            raise ValueError("watchdog timeout must be > 0")
        self.timeout = float(timeout)
        if first_timeout is None:
            first_timeout = float(
                os.environ.get("EADGAN_WATCHDOG_FIRST", 0) or 0
            ) or max(self.timeout, 900.0)
        self.first_timeout = float(first_timeout)
        self.diag_path = diag_path
        self._on_stall = on_stall
        self._lock = threading.Lock()
        self._last_beat = None  # None until the first beat
        self._armed_at = None
        self._last_step = None
        self._grace_until = None
        self._stop = threading.Event()
        self._thread = None

    # -- training-loop side -------------------------------------------------
    def beat(self, step=None) -> None:
        with self._lock:
            self._last_beat = time.monotonic()
            if step is not None:
                self._last_step = step

    def grace(self, seconds: float | None = None) -> None:
        """Allowance for a known-expensive in-flight operation, released
        by ``clear_grace()`` (or by its own expiry).

        The chained engine calls this before dispatching a window SHAPE
        it has not dispatched before: each distinct window size is its
        own XLA program, and a fresh compile costs 30 s - 7 min through
        the remote-compile tunnel — observed live when a supervised
        restart resumed mid-schedule, planned differently-aligned
        windows than the first life, and a tight timeout misread the
        resulting compile as a stall.  Dispatch is ASYNC through the
        tunnel, so the compile's host-visible block lands at the NEXT
        window's metric drain — heartbeats keep landing in between,
        hence explicit release rather than clear-on-beat (the drill in
        tests/test_watchdog.py and evidence/soak_r3/watchdog_drill
        caught exactly that).  Default allowance is ``first_timeout``
        (the same budget as the first compile).
        """
        with self._lock:
            self._grace_until = time.monotonic() + (
                self.first_timeout if seconds is None else float(seconds)
            )

    def clear_grace(self) -> None:
        """Release an active grace: the engine proved the expensive
        operation completed (the freshly-compiled window's metrics were
        fetched), so the steady timeout governs again."""
        with self._lock:
            self._grace_until = None

    def start(self) -> "Watchdog":
        self._armed_at = time.monotonic()
        self._thread = threading.Thread(
            target=self._watch, name="eadgan-watchdog", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self) -> "Watchdog":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- monitor side --------------------------------------------------------
    def _watch(self) -> None:
        poll = min(self.timeout / 4.0, 5.0)
        while not self._stop.wait(poll):
            now = time.monotonic()
            with self._lock:
                last, step = self._last_beat, self._last_step
                grace_until = self._grace_until
            if grace_until is not None and now < grace_until:
                continue
            if last is None:
                # still inside the first window (compile included)
                if now - self._armed_at <= self.first_timeout:
                    continue
                waited, limit = now - self._armed_at, self.first_timeout
            else:
                if now - last <= self.timeout:
                    continue
                waited, limit = now - last, self.timeout
            self._fire(step, waited, limit)
            return

    def _fire(self, step, waited, limit) -> None:
        record = {
            "event": "watchdog_stall",
            "step": step,
            "seconds_since_heartbeat": round(waited, 1),
            "timeout": limit,
            "pid": os.getpid(),
            "exit_code": STALL_EXIT_CODE,
        }
        try:
            print(
                f"watchdog: no training progress for {waited:.0f}s "
                f"(limit {limit:.0f}s, last step {step}); dumping stacks "
                f"and exiting {STALL_EXIT_CODE} for supervised restart",
                file=sys.stderr, flush=True,
            )
            print(json.dumps(record), file=sys.stderr, flush=True)
            faulthandler.dump_traceback(file=sys.stderr, all_threads=True)
            sys.stderr.flush()
            if self.diag_path:
                with open(self.diag_path, "a") as f:
                    f.write(json.dumps(record) + "\n")
                    faulthandler.dump_traceback(file=f, all_threads=True)
        finally:
            if self._on_stall is not None:
                self._on_stall(record)
            else:
                os._exit(STALL_EXIT_CODE)
