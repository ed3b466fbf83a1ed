"""Graceful preemption shutdown: SIGTERM becomes a final checkpoint
instead of lost work.

Cloud TPU VMs are preemptible and maintenance-evicted: the platform
delivers SIGTERM with a short grace window (typically 30+ seconds)
before the machine disappears.  The reference has no notion of this —
a preempted run loses everything since the last cadence save, and it
could not resume even from that (SURVEY.md section 5: checkpoints are
save-only, e.g. celebA/EAD-GAN_celebA.py:414-423).  Here the trainer
CLIs install a :class:`PreemptionGuard`; on SIGTERM the engine finishes
the in-flight window (its side effects included), stops at that window
boundary, writes ONE final atomic train-state checkpoint at the exact
current step (the trainer's ``on_shutdown`` callback), and the process
exits with :data:`PREEMPT_EXIT_CODE` — ``--resume auto`` then continues
with zero lost steps.  Budget on this repo's production config: one
CelebA window (~0.55 s) + one grid event + one ~620 MB state fetch and
serialize (~5 s) fits comfortably inside the platform grace window.

Signal-channel separation (each failure class has its own mechanism):

* **SIGTERM** -> graceful save (this module): preemption notices,
  ``kill <pid>``, a supervisor winding a gang down.
* **SIGINT** (Ctrl-C) -> default ``KeyboardInterrupt``: interactive
  abort; queued event writes still flush through the engine's
  ``finally`` (train/engine.py), but no extra checkpoint is written.
* **watchdog stall** -> ``os._exit(87)``: a WEDGED process cannot run
  signal handlers at all (main thread parked in foreign code), so no
  graceful path exists — ``cli.supervise`` relaunches it instead
  (utils/watchdog.py).

A second SIGTERM escalates: the handler restores the default
disposition and re-delivers, so an impatient operator — or a
supervisor's kill ladder hitting a slow save — still terminates
promptly.  That is always safe: checkpoint writes are atomic
(train/checkpoint.py), so a kill landing inside the final save leaves
the previous complete checkpoint, never a truncation.

Multi-process gangs: the guard's flag is only the LOCAL input — the
engines synchronize the stop decision across ranks each window
(``parallel.any_process_flag``) so the whole gang stops at one
boundary and writes one collective final checkpoint
(``train/engine.py`` multi-process stop contract;
``cli/supervise.py`` documents the gang semantics; drilled in
MULTIHOST_GANG_PREEMPT.json).
"""

from __future__ import annotations

import os
import signal
import threading

__all__ = ["PreemptionGuard", "PREEMPT_EXIT_CODE"]

# Distinct from a clean finish (0, schedule incomplete!) and from the
# watchdog's STALL_EXIT_CODE (87, which means "relaunch me").  Under
# plain ``cli.supervise`` a preemption therefore propagates (the host is
# going away; restarting on it is futile), while ``--restart_on_error``
# opts into relaunch-with-resume for merely-transient SIGTERMs.
PREEMPT_EXIT_CODE = 86


class PreemptionGuard:
    """Installable SIGTERM-to-graceful-save flag.

    ``install()`` arms the handler; ``requested`` is a
    ``threading.Event`` the training engines poll once per completed
    dispatch (``run_epochs(stop_event=...)``) — a signal can land at any
    instant, including mid-window inside a runtime call, and the event
    is simply observed at the next window boundary where a true
    post-step train state exists.
    """

    def __init__(self):
        self.requested = threading.Event()
        self._installed: dict = {}

    # -- signal side ---------------------------------------------------------
    def _handle(self, signum, frame) -> None:
        if self.requested.is_set():
            # second delivery: the operator (or a supervisor's kill
            # ladder) wants OUT now — restore the default disposition
            # and re-deliver.  The atomic checkpoint writer makes dying
            # mid-final-save safe.
            signal.signal(signum, signal.SIG_DFL)
            os.kill(os.getpid(), signum)
            return
        self.requested.set()
        # The flag is set FIRST: the graceful path survives even if the
        # diagnostic below fails.  os.write(2, ...) instead of print():
        # CPython runs this handler between bytecodes, which can be in
        # the middle of another buffered write to the same stderr stream
        # (watchdog diagnostics, warnings) — print() would then raise
        # "reentrant call inside BufferedWriter" at an arbitrary
        # bytecode in the main thread, aborting the run without the
        # graceful save this handler exists to guarantee.  os.write is
        # async-signal-safe (unbuffered fd write).
        try:
            os.write(
                2,
                (
                    f"preemption: caught signal {signum}; finishing the "
                    "in-flight window, saving a final checkpoint, then "
                    f"exiting {PREEMPT_EXIT_CODE} (send again to "
                    "terminate immediately)\n"
                ).encode(),
            )
        except OSError:
            pass

    # -- lifecycle -----------------------------------------------------------
    def install(self, signals=(signal.SIGTERM,)) -> "PreemptionGuard":
        """Arm the handler for ``signals`` (idempotent per signal).
        Outside the main thread (in-process test harnesses) CPython
        forbids ``signal.signal`` — the guard then stays unarmed but
        remains usable as a plain stop flag."""
        for s in signals:
            if s in self._installed:
                continue
            try:
                self._installed[s] = signal.signal(s, self._handle)
            except ValueError:
                pass  # not the main thread
        return self

    def uninstall(self) -> None:
        """Restore the previous dispositions (tests; long-lived hosts
        embedding the library)."""
        while self._installed:
            s, prev = self._installed.popitem()
            try:
                signal.signal(s, prev)
            except ValueError:
                pass
