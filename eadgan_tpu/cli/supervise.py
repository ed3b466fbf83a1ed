"""Supervised trainer launcher: automatic stall recovery for long runs.

    python -m eadgan_tpu.cli.supervise [--max_restarts N] [--restart_on_error] \
        <trainer> [trainer args...]

``<trainer>`` is a trainer CLI name (``celeba``, ``rp``, ``mnist``,
``pxy``, ``rp_color``, ...; a dotted name is used as a module path
verbatim).  The child runs as a subprocess; when it exits with the
watchdog's ``STALL_EXIT_CODE`` (see ``eadgan_tpu/utils/watchdog.py`` —
pass ``--watchdog SECONDS`` to the trainer to arm it), the supervisor
relaunches it with ``--resume auto`` appended, restoring the newest
checkpoint.  This automates the recovery that the 600k-step CelebA soak
needed by hand when a tunnel RPC hung mid-run
(evidence/soak_r3/celeba_600k/summary.json).

``--restart_on_error`` widens the restart condition to any nonzero exit
(e.g. an OOM or a killed tunnel), still bounded by ``--max_restarts``.

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
import subprocess
import sys

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
    parser.add_argument("trainer", help="trainer CLI name (e.g. celeba, rp, mnist)")
    parser.add_argument(
        "args", nargs=argparse.REMAINDER,
        help="arguments passed through to the trainer",
    )
    opt = parser.parse_args(argv)

    module = (
        opt.trainer if "." in opt.trainer else f"eadgan_tpu.cli.{opt.trainer}"
    )
    child_args = list(opt.args)
    if child_args[:1] == ["--"]:
        child_args = child_args[1:]

    restarts = 0
    while True:
        cmd = [sys.executable, "-m", module, *child_args]
        print(f"supervise: launching {' '.join(cmd)}", flush=True)
        rc = subprocess.run(cmd).returncode
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
