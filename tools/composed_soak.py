#!/usr/bin/env python
"""Composed-subsystem integration soak (round-4 VERDICT item 5): ONE
supervised multi-process run that hits every robustness subsystem in
sequence, then must land on the exact uninterrupted trajectory.

    python tools/composed_soak.py [--steps 5000] [--ckpt_every 250] \
        [--out COMPOSED_SOAK.json]

One ``cli.supervise --ranks 2 --restart_on_error`` gang (2 processes x
4 virtual CPU devices, dSprites DP pipeline, ``--keep 3`` retention)
trains ``--steps`` steps through three injected faults, each exercising
a different subsystem, all recovered by the SAME supervisor process:

1. **stall** — rank 1's host thread wedges at ``--hang_step`` (the
   observed hung-tunnel-RPC failure): its watchdog exits 87, the
   supervisor kills the parked survivor fast and relaunches the gang
   with ``--resume auto`` (utils/watchdog.py + cli/supervise.py).
2. **truncated save** — the write of the ``--kill_save_step`` cadence
   checkpoint is replaced by a truncated file and the writer hard-exits
   87 (the legacy non-atomic-writer crash, train/checkpoint.py fault
   hook): the relaunch's ``restore_latest`` must WARN, skip the corrupt
   newest, and fall back to the previous complete save.
3. **preemption** — SIGTERM to a single rank at ``--preempt_step``:
   the gang agrees on one stop boundary (parallel.any_process_flag),
   writes a collective final checkpoint, exits 86 gang-wide; under
   ``--restart_on_error`` the supervisor relaunches with zero lost
   steps (utils/preempt.py + the engine stop contract).

Retention (``--keep 3``) prunes train states throughout — including
across lives and the corrupt-fallback timeline (prune anchors on the
just-written step, train/checkpoint.py::prune_saved).

Pass condition: the faulted run's per-step metrics equal an
uninterrupted reference gang's for EVERY step of the schedule (resume
is bit-exact, the data schedule is a pure function of the step index),
and at most ``--keep`` + 1 train-state files remain on disk.

The reference implementation would have survived none of these: its
checkpoints are save-only and nothing ever resumes them
(/root/reference/dSprites/rp.py:507-509, SURVEY.md section 5).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVE = os.path.join(REPO, "tools", "multiprocess_drive.py")


def read_rows(path):
    rows = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                rows[r.pop("step")] = r  # later lives win
    return rows


def launch(workdir, log_path, opt, env_extra=None, restart_on_error=False):
    env = dict(
        os.environ, PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}"
    )
    env.update(env_extra or {})
    cmd = [
        sys.executable, "-m", "eadgan_tpu.cli.supervise",
        "--ranks", "2", "--max_restarts", "5",
    ] + (["--restart_on_error"] if restart_on_error else []) + [
        DRIVE, "--",
        "--gang_worker", "--steps", str(opt.steps),
        "--ckpt_every", str(opt.ckpt_every), "--ckpt_dir", workdir,
        "--watchdog", str(opt.watchdog), "--pipeline", "dsprites",
        "--devices_per_proc", "4", "--keep", str(opt.keep),
    ]
    log = open(log_path, "w")
    return subprocess.Popen(cmd, env=env, stdout=log, stderr=subprocess.STDOUT), log


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--ckpt_every", type=int, default=250)
    p.add_argument("--keep", type=int, default=3)
    p.add_argument("--hang_step", type=int, default=1200)
    p.add_argument(
        "--kill_save_step", type=int, default=2400,
        help="arm the truncated-save fault from this step (fires at the "
        "next cadence save >= it)",
    )
    p.add_argument("--preempt_step", type=int, default=3800)
    p.add_argument("--watchdog", type=float, default=90.0)
    p.add_argument("--timeout", type=int, default=14400)
    p.add_argument("--out", default="COMPOSED_SOAK.json")
    p.add_argument("--workdir", default="/tmp/eadgan_composed_soak")
    opt = p.parse_args()

    assert opt.hang_step < opt.kill_save_step < opt.preempt_step < opt.steps
    t_start = time.time()

    # ---- reference: uninterrupted gang ------------------------------
    refdir = os.path.join(opt.workdir, "reference")
    shutil.rmtree(refdir, ignore_errors=True)
    os.makedirs(refdir)
    proc, log = launch(refdir, os.path.join(refdir, "run.log"), opt)
    rc_ref = proc.wait(timeout=opt.timeout)
    log.close()
    ref_rows = read_rows(os.path.join(refdir, "metrics.jsonl"))
    print(f"[soak] reference: rc={rc_ref}, rows={len(ref_rows)}", flush=True)

    # ---- faulted: stall + truncated save + preemption, one supervisor
    fltdir = os.path.join(opt.workdir, "faulted")
    shutil.rmtree(fltdir, ignore_errors=True)
    os.makedirs(fltdir)
    env_extra = {
        "EADGAN_FAULT_HANG_STEP": str(opt.hang_step),
        "EADGAN_FAULT_HANG_RANK": "1",
        "EADGAN_FAULT_HANG_MARKER": os.path.join(fltdir, "hang_fired"),
        "EADGAN_FAULT_KILL_SAVE_STEP": str(opt.kill_save_step),
        "EADGAN_FAULT_KILL_SAVE_MARKER": os.path.join(fltdir, "killsave_fired"),
    }
    proc, log = launch(
        fltdir, os.path.join(fltdir, "run.log"), opt,
        env_extra=env_extra, restart_on_error=True,
    )
    # deliver the preemption notice to rank 0 once its log shows progress
    # past --preempt_step (pidfiles are re-written each life)
    sig_sent = False
    metrics_path = os.path.join(fltdir, "metrics.jsonl")
    deadline = time.time() + opt.timeout
    while proc.poll() is None and time.time() < deadline:
        if not sig_sent:
            rows = read_rows(metrics_path)
            if rows and max(rows) >= opt.preempt_step:
                pid = int(open(os.path.join(fltdir, "rank_0.pid")).read())
                print(f"[soak] step {max(rows)}: SIGTERM -> rank 0 "
                      f"(pid {pid})", flush=True)
                os.kill(pid, signal.SIGTERM)
                sig_sent = True
        time.sleep(1.0)
    if proc.poll() is None:
        proc.kill()
        proc.wait()
        raise SystemExit("[soak] faulted run timed out")
    rc_flt = proc.returncode
    log.close()
    text = open(os.path.join(fltdir, "run.log")).read()
    flt_rows = read_rows(metrics_path)

    # ---- verdicts ----------------------------------------------------
    states = sorted(
        int(m.group(1))
        for f in os.listdir(fltdir)
        for m in [re.match(r"train_state_(\d+)\.ckpt$", f)]
        if m
    )
    max_diff, compared = 0.0, 0
    for s, r in flt_rows.items():
        if s in ref_rows:
            for k, v in r.items():
                max_diff = max(max_diff, abs(v - ref_rows[s][k]))
                compared += 1
    checks = {
        "reference_clean": rc_ref == 0 and len(ref_rows) == opt.steps,
        "hang_fired": os.path.exists(env_extra["EADGAN_FAULT_HANG_MARKER"]),
        "watchdog_stall_recovered": "watchdog_stall" in text
        or "exited 87" in text,
        "killsave_fired": os.path.exists(
            env_extra["EADGAN_FAULT_KILL_SAVE_MARKER"]
        ),
        "corrupt_fallback_warned": "failed to load" in text
        and "falling back" in text,
        "preempt_sent": sig_sent,
        "gang_preempt_both_ranks": text.count("preempted, saved final") == 2,
        "preempt_relaunched": "restart" in text and "exited 86" in text,
        "three_recoveries": len(re.findall(r"restart \d+/5", text)) >= 3,
        "final_rc_zero": rc_flt == 0,
        "all_steps_logged": len(flt_rows) == opt.steps,
        "steps_match_uninterrupted": compared > 0 and max_diff <= 1e-6,
        "retention_enforced": 0 < len(states) <= opt.keep,
    }
    ok = all(checks.values())
    report = {
        "what": (
            "composed integration soak: one cli.supervise --ranks 2 "
            "--restart_on_error gang trains the full schedule through "
            "an injected single-rank stall (watchdog 87 -> gang "
            "relaunch), an injected truncated cadence save (corrupt-"
            "tolerant restore fallback), and a single-rank SIGTERM "
            "preemption (gang-synchronized collective save, exit 86, "
            "relaunch) — with --keep retention pruning throughout — and "
            "must reproduce the uninterrupted gang's per-step metrics "
            "exactly"
        ),
        "topology": "2 processes x 4 virtual CPU devices, Gloo, dSprites DP",
        "steps": opt.steps,
        "ckpt_every": opt.ckpt_every,
        "keep": opt.keep,
        "fault_schedule": {
            "hang_step_rank1": opt.hang_step,
            "kill_save_armed_from": opt.kill_save_step,
            "preempt_sigterm_rank0_at": opt.preempt_step,
        },
        "reference_rc": rc_ref,
        "faulted_rc": rc_flt,
        "restarts_logged": len(re.findall(r"restart \d+/5", text)),
        "train_states_remaining": states,
        "metric_rows_compared": compared,
        "max_abs_metric_diff_vs_uninterrupted": max_diff,
        "wall_s": round(time.time() - t_start, 1),
        "checks": checks,
        "all_pass": bool(ok),
    }
    with open(opt.out, "w") as f:
        json.dump(report, f, indent=2)
    for k, v in checks.items():
        print(f"  {'PASS' if v else 'FAIL'} {k}")
    print(f"wrote {opt.out}; all_pass={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
