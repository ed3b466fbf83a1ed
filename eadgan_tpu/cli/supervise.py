"""Supervised trainer launcher: automatic stall recovery for long runs.

    python -m eadgan_tpu.cli.supervise [--max_restarts N] [--restart_on_error] \
        [--ranks N] <trainer> [trainer args...]

``<trainer>`` is a trainer CLI name (``celeba``, ``rp``, ``mnist``,
``pxy``, ``rp_color``, ...; a dotted name is used as a module path
verbatim, and a path ending in ``.py`` is run as a script).  The child
runs as a subprocess; when it exits with the watchdog's
``STALL_EXIT_CODE`` (see ``eadgan_tpu/utils/watchdog.py`` — pass
``--watchdog SECONDS`` to the trainer to arm it), the supervisor
relaunches it with ``--resume auto`` appended, restoring the newest
checkpoint.  This automates the recovery that the 600k-step CelebA soak
needed by hand when a tunnel RPC hung mid-run
(evidence/soak_r3/celeba_600k/summary.json).

``--restart_on_error`` widens the restart condition to any nonzero exit
(e.g. an OOM or a killed tunnel), still bounded by ``--max_restarts``.

Multi-process runs (``--ranks N``): the supervisor owns the WHOLE gang.
It launches N replicas of the command, each with the rank environment
``eadgan_tpu.parallel.initialize`` reads (``EADGAN_MP_PROCESS_ID``,
``EADGAN_MP_NUM_PROCESSES``, ``EADGAN_MP_COORDINATOR`` — a fresh
localhost coordinator port per life, since a Gloo coordinator cannot be
rejoined after a member dies).  Ranks in a distributed run fail
COLLECTIVELY: one wedged rank parks every peer inside a Gloo/ICI
collective forever, so the first rank to exit nonzero (its own watchdog
firing 87, or a collective timeout) condemns the whole gang — the
supervisor kills the survivors (SIGTERM, then SIGKILL after 2 s; a
rank parked in foreign code ignores nothing at SIGKILL) and relaunches
ALL ranks with ``--resume auto``.  Drilled end-to-end with an injected
single-rank hang under ``tools/multiprocess_drive.py --gang_drill``
(evidence/drill_r4_gang/).

Gang preemption semantics (drilled by tools/gang_preempt_drill.py,
MULTIHOST_GANG_PREEMPT.json):

* **SIGTERM to the supervisor** (host eviction): it fans out SIGTERM
  with the graceful 30 s ladder; every rank's PreemptionGuard finishes
  the in-flight dispatch, the gang agrees on ONE stop boundary
  (``parallel.any_process_flag`` — a rank stopping alone would park its
  peers in a step collective), writes ONE collective final checkpoint
  (``checkpoint.save_train_state_sync``: barrier holds ranks until the
  coordinator's write lands), and exits 86.  The supervisor exits 143.
* **SIGTERM to a single rank** (per-VM preemption notice): the signaled
  rank's flag propagates through the same stop consensus — the WHOLE
  gang saves at the same boundary and exits 86.  ``_reap_gang`` treats
  a first exit of 86 as this gang-wide graceful stop: peers get a grace
  window to finish their own exits (not a kill), and 86 propagates as
  the supervisor's exit code.  By default the supervisor then gives up
  (the host is going away; relaunching on it is futile) —
  ``--restart_on_error`` opts into relaunch-with-resume for
  merely-transient SIGTERMs, with zero lost steps.
* **Condemnation after a rank FAILURE** (watchdog 87, crash) is
  different: survivors are parked in a collective their dead peer will
  never join, and the collective final save is equally impossible — the
  teardown ladder is fast (SIGTERM, 2 s, SIGKILL) and recovery is the
  relaunch-from-last-cadence-save path (evidence/drill_r4_gang/).

The reference has no counterpart: a crash mid-schedule loses the run
entirely (SURVEY.md section 5 — checkpoints are save-only, nothing ever
resumes them).

Note: on restart any ``--resume`` the command carried is REPLACED by a
single ``--resume auto`` (``with_resume_auto``) — correct for crash
recovery, since by restart time the newest on-disk checkpoint is
strictly later than whatever the run originally resumed from (and when
no checkpoint exists yet, ``auto`` starts fresh); stripping first keeps
the command line from growing across restarts.

Note on ``--max_steps``: the trainers count it INCREMENTALLY from the
restored step, so a restarted ``--max_steps N`` run trains N further
steps past the restored checkpoint, not to absolute step N.  Production
schedules bounded by ``--n_epochs`` (the reference's own contract)
resume to the exact original endpoint.
"""

from __future__ import annotations

import argparse
import os
import signal
import socket
import subprocess
import sys
import time

from eadgan_tpu.utils.watchdog import STALL_EXIT_CODE


def with_resume_auto(args):
    """Return ``args`` with exactly one trailing ``--resume auto`` —
    any existing ``--resume X`` / ``--resume=X`` is stripped first so
    repeated restarts don't grow the command line unboundedly."""
    out, i = [], 0
    while i < len(args):
        if args[i] == "--resume":
            i += 2  # skip the flag and its value
            continue
        if args[i].startswith("--resume="):
            i += 1
            continue
        out.append(args[i])
        i += 1
    return out + ["--resume", "auto"]


def _free_port() -> int:
    """An ephemeral port that was free at probe time.  Inherent TOCTOU:
    the probe socket closes before rank 0 binds the Gloo coordinator, so
    a concurrent service can steal the port in between — the gang then
    exits nonzero at startup, which costs one ``--restart_on_error``
    life (fresh port next time).  Unavoidable without coordinator-side
    port publication; collisions are rare and self-healing under the
    bounded retry loop."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch_gang(cmd, ranks):
    """Start ``ranks`` replicas of ``cmd`` as one distributed gang.

    ``ranks == 1`` inherits the parent environment untouched (the
    original single-process contract).  Multi-rank lives get a FRESH
    coordinator port each time: the previous life's coordinator died
    with its rank-0 process, and Gloo/coordination-service state cannot
    be rejoined.
    """
    if ranks == 1:
        return [subprocess.Popen(cmd)]
    port = _free_port()
    procs = []
    try:
        for i in range(ranks):
            env = dict(
                os.environ,
                EADGAN_MP_PROCESS_ID=str(i),
                EADGAN_MP_NUM_PROCESSES=str(ranks),
                EADGAN_MP_COORDINATOR=f"localhost:{port}",
            )
            procs.append(subprocess.Popen(cmd, env=env))
    except BaseException:
        # A failed spawn mid-gang (fork ENOMEM, SIGTERM between Popen
        # calls) must not orphan the ranks already launched — they would
        # keep training and double-run against the next supervised
        # launch.  The caller's cleanup only covers a fully-built gang.
        _kill_gang(procs)
        raise
    return procs


def _kill_gang(procs, grace: float = 2.0) -> None:
    """Terminate every still-running rank: SIGTERM, ``grace`` s, SIGKILL.

    Two ladders, chosen by the caller:

    * **fast** (``grace=2.0``, the default) — condemnation teardown
      after a rank failed.  Survivors are typically parked in a
      collective their dead peer will never join; with ``--preempt_save
      on`` (the trainers' default) their SIGTERM handler only sets a
      flag that a parked main thread can never poll, so waiting longer
      buys nothing — SIGKILL promptly.  A gang-wide graceful save is
      impossible here anyway: the final save is itself a collective
      (checkpoint.save_train_state_sync) that the dead rank cannot
      join; recovery is the drilled restart-from-last-cadence-save path.
    * **graceful** (``grace=30.0``) — the supervisor itself received
      SIGTERM (host preemption/eviction).  Every rank is healthy: the
      SIGTERM fans out, each rank's PreemptionGuard finishes the
      in-flight window, the gang agrees on the stop boundary
      (parallel.any_process_flag), saves ONE final collective
      checkpoint, and exits 86 — the grace must cover a window plus the
      final save (~5 s for CelebA through the tunnel).

    SIGKILL is always safe: checkpoint writes are atomic
    (train/checkpoint.py), so a kill mid-save leaves the previous
    complete file, never a truncation."""
    for p in procs:
        if p.poll() is None:
            p.terminate()
    deadline = time.monotonic() + grace
    for p in procs:
        if p.poll() is not None:
            continue
        try:
            p.wait(timeout=max(0.0, deadline - time.monotonic()))
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()


def _reap_gang(procs) -> int:
    """Wait until every rank exits 0, or any rank exits nonzero.

    A rank finishing early with 0 while peers still run is normal (it
    had less tail work); the gang is only condemned by a nonzero exit —
    then the survivors are killed fast (they are parked in a collective
    that can never complete) and that first nonzero code is returned.

    Exception: the first nonzero being PREEMPT_EXIT_CODE (86) means a
    gang-synchronized graceful preemption — every rank agreed on the
    stop boundary, the collective final save already completed behind
    its barrier, and the peers are in the middle of their OWN graceful
    exits.  They get a grace window to finish exiting 86 on their own
    (killing them would only add noise); stragglers are then torn down
    and 86 propagates, so the supervisor treats the whole gang as
    preempted (give up by default — the host is going away;
    ``--restart_on_error`` opts into relaunch-with-resume for
    transient SIGTERMs)."""
    from eadgan_tpu.utils.preempt import PREEMPT_EXIT_CODE

    live = list(procs)
    while live:
        for p in list(live):
            rc = p.poll()
            if rc is None:
                continue
            live.remove(p)
            if rc != 0:
                if rc == PREEMPT_EXIT_CODE:
                    deadline = time.monotonic() + 30.0
                    for q in live:
                        try:
                            q.wait(
                                timeout=max(0.0, deadline - time.monotonic())
                            )
                        except subprocess.TimeoutExpired:
                            pass
                _kill_gang(live)
                return rc
        if live:
            time.sleep(0.25)
    return 0


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.add_argument(
        "--max_restarts", type=int, default=5,
        help="restart budget before giving up and propagating the exit code",
    )
    parser.add_argument(
        "--restart_on_error", action="store_true",
        help="restart on ANY nonzero exit, not only the watchdog stall code",
    )
    parser.add_argument(
        "--ranks", type=int, default=1,
        help="launch N replicas as one distributed gang (rank env + "
        "localhost coordinator injected); any rank's stall restarts ALL. "
        "NOTE: only rank identity is injected, not accelerator "
        "partitioning — the trainer must own its device split (CPU "
        "workers size their virtual mesh from the rank env, e.g. "
        "tools/multiprocess_drive.py --gang_worker; on a real TPU pod "
        "each host's libtpu env must already be partitioned by the "
        "launcher). N trainer CLIs sharing ONE chip will fight over it",
    )
    parser.add_argument("trainer", help="trainer CLI name (e.g. celeba, rp, mnist)")
    parser.add_argument(
        "args", nargs=argparse.REMAINDER,
        help="arguments passed through to the trainer",
    )
    opt = parser.parse_args(argv)

    # SIGTERM normally kills the process without unwinding, which would
    # orphan the gang; convert it to SystemExit so the kill-gang cleanup
    # below runs (SIGKILL remains unhandleable — ranks then need manual
    # cleanup, which the next life's fresh coordinator port tolerates).
    try:
        signal.signal(
            signal.SIGTERM, lambda *_: sys.exit(128 + signal.SIGTERM)
        )
    except ValueError:
        pass  # not the main thread (in-process test harness) — skip

    if opt.trainer.endswith(".py"):
        base_cmd = [sys.executable, opt.trainer]
    else:
        module = (
            opt.trainer if "." in opt.trainer else f"eadgan_tpu.cli.{opt.trainer}"
        )
        base_cmd = [sys.executable, "-m", module]
    child_args = list(opt.args)
    if child_args[:1] == ["--"]:
        child_args = child_args[1:]

    restarts = 0
    while True:
        cmd = base_cmd + child_args
        gang = f" x{opt.ranks} ranks" if opt.ranks > 1 else ""
        print(f"supervise: launching {' '.join(cmd)}{gang}", flush=True)
        procs = _launch_gang(cmd, opt.ranks)
        try:
            rc = _reap_gang(procs)
        except BaseException as exc:
            # The supervisor itself is dying (Ctrl-C, SIGTERM via
            # SystemExit, unexpected error).  Take the gang down with
            # us: orphaned ranks would keep training and then
            # double-run against the next supervised launch.  A
            # supervisor-level SIGTERM is host preemption: fan it out
            # with the GRACEFUL ladder so every rank finishes its
            # window, joins the collective final save, and exits 86
            # (see _kill_gang); any other death tears down fast.
            preempted = (
                isinstance(exc, SystemExit)
                and exc.code == 128 + signal.SIGTERM
            )
            _kill_gang(procs, grace=30.0 if preempted else 2.0)
            raise
        if rc == 0:
            print(f"supervise: trainer finished cleanly after {restarts} restart(s)")
            return
        stalled = rc == STALL_EXIT_CODE
        if (stalled or opt.restart_on_error) and restarts < opt.max_restarts:
            restarts += 1
            print(
                f"supervise: child exited {rc} "
                f"({'watchdog stall' if stalled else 'error'}); "
                f"restart {restarts}/{opt.max_restarts} with --resume auto",
                flush=True,
            )
            child_args = with_resume_auto(child_args)
            continue
        print(f"supervise: giving up after exit {rc} ({restarts} restart(s) used)")
        sys.exit(rc)


if __name__ == "__main__":
    main()
