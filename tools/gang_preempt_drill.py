#!/usr/bin/env python
"""Gang preemption drill: graceful SIGTERM shutdown of a supervised
multi-process training gang (VERDICT r4 item 2).

    python tools/gang_preempt_drill.py [--steps 60] [--ckpt_every 25] \
        [--signal_at 8] [--out MULTIHOST_GANG_PREEMPT.json]

Four scenarios — {DP, cross-process ZeRO} x {SIGTERM to the supervisor,
SIGTERM to a single rank} — each against an uninterrupted reference run
of the same gang (2 processes x 4 virtual CPU devices, Gloo
coordinator, the ``cli.supervise --ranks 2`` launcher owning the gang):

* **supervisor target** (host eviction): the supervisor converts its
  SIGTERM to a graceful fan-out (``_kill_gang`` 30 s ladder); every
  rank's PreemptionGuard flags, the gang agrees on ONE stop boundary
  through the per-step ``parallel.any_process_flag`` consensus, writes
  ONE collective final checkpoint (``save_on_coordinator``: allgather
  for ZeRO moment shards + barrier), and exits 86; the supervisor
  exits 143.
* **single-rank target** (per-VM preemption notice): only rank 1 is
  signaled; the stop consensus propagates the flag, so the WHOLE gang
  saves at the same boundary and exits 86 — ``_reap_gang`` recognizes
  the 86, waits for the peers' own graceful exits instead of killing
  them, and the supervisor propagates 86 (give-up by default: the host
  is going away; ``--restart_on_error`` would opt into
  relaunch-with-resume).

Each scenario then runs a resume life (``--resume auto``) to the full
schedule and requires every step's metrics to match the uninterrupted
reference run exactly — the preemption save must lose zero steps and
perturb nothing.

What the reference would do here: die, losing everything since the
last manual save, with no resume path at all
(/root/reference/dSprites/rp.py:507-509 saves only at 500k multiples
and nothing ever loads them for training).

Writes ``--out`` plus per-scenario logs under ``--evidence_dir``.
"""

from __future__ import annotations

import argparse
import json
import os
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
                    continue  # torn tail line
                rows[r.pop("step")] = r  # later lives win on overlap
    return rows


def launch_gang(workdir, log_path, opt, pipeline, resume=False):
    env = dict(
        os.environ, PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}"
    )
    cmd = [
        sys.executable, "-m", "eadgan_tpu.cli.supervise",
        "--ranks", "2", "--max_restarts", "2",
        DRIVE, "--",
        "--gang_worker", "--steps", str(opt.steps),
        "--ckpt_every", str(opt.ckpt_every), "--ckpt_dir", workdir,
        "--watchdog", str(opt.watchdog), "--pipeline", pipeline,
        "--devices_per_proc", "4",
    ] + (["--resume", "auto"] if resume else [])
    log = open(log_path, "w")
    return subprocess.Popen(cmd, env=env, stdout=log, stderr=subprocess.STDOUT), log


def wait_for_step(workdir, step, timeout):
    deadline = time.time() + timeout
    path = os.path.join(workdir, "metrics.jsonl")
    while time.time() < deadline:
        rows = read_rows(path)
        if rows and max(rows) >= step:
            return max(rows)
        time.sleep(0.5)
    raise SystemExit(f"[drill] step {step} never reached in {workdir}")


def run_scenario(opt, pipeline, target):
    """One faulted run + resume life; returns the scenario record."""
    name = f"{pipeline}_{target}"
    workdir = os.path.join(opt.evidence_dir, name)
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    log1 = os.path.join(workdir, "life1.log")

    proc, log = launch_gang(workdir, log1, opt, pipeline)
    try:
        seen = wait_for_step(workdir, opt.signal_at, opt.timeout)
        if target == "supervisor":
            victim_pid, victim = proc.pid, "supervisor"
        else:
            victim_pid = int(
                open(os.path.join(workdir, "rank_1.pid")).read().strip()
            )
            victim = "rank 1"
        print(
            f"[{name}] step {seen} reached; SIGTERM -> {victim} "
            f"(pid {victim_pid})",
            flush=True,
        )
        os.kill(victim_pid, signal.SIGTERM)
        rc1 = proc.wait(timeout=opt.timeout)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
        log.close()

    text1 = open(log1).read()
    import re

    saves = re.findall(
        r"gang_worker rank (\d+): preempted, saved final train state at "
        r"step (\d+), exiting 86",
        text1,
    )
    save_steps = sorted({int(s) for _, s in saves})
    final = save_steps[0] if len(save_steps) == 1 else -1
    ckpt = os.path.join(workdir, f"train_state_{final}.ckpt")

    # resume life: --resume auto to the full schedule
    log2 = os.path.join(workdir, "life2.log")
    proc2, log2f = launch_gang(workdir, log2, opt, pipeline, resume=True)
    try:
        rc2 = proc2.wait(timeout=opt.timeout)
    finally:
        if proc2.poll() is None:
            proc2.kill()
            proc2.wait()
        log2f.close()
    text2 = open(log2).read()
    rows = read_rows(os.path.join(workdir, "metrics.jsonl"))

    checks = {
        # both ranks reported the SAME stop boundary: the consensus held
        "both_ranks_saved_same_step": len(saves) == 2 and len(save_steps) == 1,
        "save_past_signal_step": final >= opt.signal_at,
        # the graceful save is NOT a cadence save (first cadence is later)
        "save_off_cadence": 0 < final and final % opt.ckpt_every != 0,
        "final_ckpt_exists": os.path.exists(ckpt),
        "supervisor_rc": rc1
        == (128 + signal.SIGTERM if target == "supervisor" else 86),
        "gave_up_not_restarted": "restart 1/" not in text1,
        "resume_restored_exact_step": (
            text2.count(f"resumed from step {final}") == 2
        ),
        "resume_clean_exit": rc2 == 0,
        "resume_ran_to_schedule_end": max(rows, default=0) == opt.steps,
        "all_steps_logged": len(rows) == opt.steps,
    }
    return {
        "pipeline": pipeline,
        "target": target,
        "signal_observed_at": seen,
        "final_save_step": final,
        "rank_save_steps": saves,
        "life1_rc": rc1,
        "life2_rc": rc2,
        "rows": rows,
        "checks": checks,
        "workdir": workdir,
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--ckpt_every", type=int, default=25)
    p.add_argument(
        "--signal_at", type=int, default=8,
        help="deliver SIGTERM once the gang's JSONL shows this step "
        "(before the first cadence save, so the graceful save is "
        "provably the only checkpoint)",
    )
    p.add_argument("--watchdog", type=float, default=60.0)
    p.add_argument("--timeout", type=int, default=1800)
    p.add_argument("--out", default="MULTIHOST_GANG_PREEMPT.json")
    p.add_argument("--evidence_dir", default="/tmp/eadgan_gang_preempt")
    p.add_argument(
        "--pipelines", default="dsprites,dsprites_zero",
        help="comma-separated gang_worker pipelines to drill",
    )
    opt = p.parse_args()

    pipelines = [s for s in opt.pipelines.split(",") if s]
    scenarios = {}
    references = {}
    ok = True

    for pipeline in pipelines:
        # uninterrupted reference gang run (metric-parity denominator)
        refdir = os.path.join(opt.evidence_dir, f"{pipeline}_reference")
        shutil.rmtree(refdir, ignore_errors=True)
        os.makedirs(refdir)
        proc, log = launch_gang(
            refdir, os.path.join(refdir, "run.log"), opt, pipeline
        )
        rc = proc.wait(timeout=opt.timeout)
        log.close()
        ref_rows = read_rows(os.path.join(refdir, "metrics.jsonl"))
        references[pipeline] = {"rc": rc, "rows": ref_rows}
        if rc != 0 or len(ref_rows) != opt.steps:
            print(f"[drill] reference {pipeline} failed rc={rc}")
            ok = False
            continue

        for target in ("supervisor", "rank"):
            rec = run_scenario(opt, pipeline, target)
            # every step of the preempted+resumed timeline must match the
            # uninterrupted gang exactly: zero lost steps, zero drift
            max_diff, compared = 0.0, 0
            for s, r in rec["rows"].items():
                if s not in ref_rows:
                    continue
                for k, v in r.items():
                    max_diff = max(max_diff, abs(v - ref_rows[s][k]))
                    compared += 1
            rec["checks"]["steps_match_uninterrupted"] = (
                compared > 0 and max_diff <= 1e-6
            )
            rec["metric_rows_compared"] = compared
            rec["max_abs_metric_diff_vs_uninterrupted"] = max_diff
            rec.pop("rows")
            scenarios[f"{pipeline}_{target}"] = rec
            passed = all(rec["checks"].values())
            ok &= passed
            print(f"[drill] {pipeline}/{target}: "
                  f"{'PASS' if passed else 'FAIL'} {rec['checks']}")
        references[pipeline].pop("rows")

    report = {
        "what": (
            "gang preemption drill: SIGTERM to the supervisor (host "
            "eviction, graceful fan-out) and to a single rank "
            "(per-VM notice, stop-consensus propagation) of a "
            "cli.supervise --ranks 2 gang; every rank stops at the SAME "
            "boundary, one collective final checkpoint is written "
            "(allgather for cross-process ZeRO moments + barrier), all "
            "ranks exit 86, and --resume auto replays to the exact "
            "uninterrupted trajectory with zero lost steps"
        ),
        "topology": "2 processes x 4 virtual CPU devices, Gloo coordinator",
        "steps": opt.steps,
        "ckpt_every": opt.ckpt_every,
        "signal_at": opt.signal_at,
        "references": references,
        "scenarios": scenarios,
        "all_pass": bool(ok),
    }
    with open(opt.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {opt.out}; all_pass={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
