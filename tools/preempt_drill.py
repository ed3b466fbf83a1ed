"""Graceful-preemption drill: SIGTERM a real training run mid-schedule
and verify the zero-lost-steps recovery chain end to end.

    python tools/preempt_drill.py [--sigterm_after 900] [--tail 300] \
        [--out PREEMPT_DRILL.json] [--workdir /tmp/eadgan_preempt_drill]

Life 1 is ``cli.celeba`` in the production chained configuration (the
same config as the retention drill, so all window programs are compile-
cache hits on the chip).  Once the JSONL log shows the target step, the
drill sends ONE SIGTERM — exactly what a Cloud TPU preemption notice
delivers — and verifies:

  * the trainer finishes the in-flight window, logs the graceful
    shutdown, and exits PREEMPT_EXIT_CODE (86), NOT a raw signal death;
  * a final ``celeba_train_state_<S>.ckpt`` exists at a window-boundary
    step S that is NOT on the save cadence (the save the legacy
    die-on-SIGTERM disposition could never have produced);
  * life 2 (``--resume auto``) restores exactly step S — zero lost
    steps, vs. replaying from the last cadence save — and finishes its
    ``--tail`` steps cleanly with zero non-finite metrics.

Writes a one-file JSON report plus the raw logs into ``--workdir``;
evidence/drill_r5_preempt/ holds a committed run from the real chip.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CADENCE_MULT = 15  # celeba saves train states every sample_interval * 15


def read_rows(path):
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass  # torn tail line mid-write
    return rows


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/eadgan_preempt_drill")
    p.add_argument("--out", default="PREEMPT_DRILL.json")
    p.add_argument("--sample_interval", type=int, default=40)
    p.add_argument(
        "--sigterm_after", type=int, default=900,
        help="send SIGTERM once the JSONL shows this step (pick it "
        "between save-cadence multiples so the final save is provably "
        "not a cadence save)",
    )
    p.add_argument(
        "--tail", type=int, default=300,
        help="steps life 2 trains after the resume (incremental "
        "--max_steps semantics)",
    )
    p.add_argument("--synth_n", type=int, default=8192)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--timeout", type=int, default=3600)
    opt = p.parse_args()

    cadence = opt.sample_interval * CADENCE_MULT
    if opt.sigterm_after % cadence == 0:
        raise SystemExit(
            f"--sigterm_after {opt.sigterm_after} sits ON the save "
            f"cadence ({cadence}); the drill could not distinguish the "
            "preemption save from a cadence save"
        )

    shutil.rmtree(opt.workdir, ignore_errors=True)
    os.makedirs(opt.workdir)
    env = dict(
        os.environ,
        PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}",
        EADGAN_SYNTH_N=str(opt.synth_n),
    )
    jsonl1 = os.path.join(opt.workdir, "life1.jsonl")
    base_cmd = [
        sys.executable, "-m", "eadgan_tpu.cli.celeba",
        "--data_dir", opt.workdir, "--no_download",
        "--ckpt_dir", opt.workdir,
        "--out_dir", os.path.join(opt.workdir, "images"),
        "--batch_size", str(opt.batch_size),
        "--sample_interval", str(opt.sample_interval),
        "--watchdog", "900",
    ]

    # ---- life 1: train, then deliver the preemption notice ----------
    log1_path = os.path.join(opt.workdir, "life1.log")
    with open(log1_path, "w") as log1:
        proc = subprocess.Popen(
            base_cmd + ["--jsonl", jsonl1], env=env,
            stdout=log1, stderr=subprocess.STDOUT,
        )
        deadline = time.time() + opt.timeout
        sent = False
        while proc.poll() is None and time.time() < deadline:
            rows = read_rows(jsonl1)
            if not sent and rows and rows[-1]["step"] >= opt.sigterm_after:
                print(
                    f"[drill] step {rows[-1]['step']} reached; sending "
                    "SIGTERM (the preemption notice)",
                    flush=True,
                )
                proc.send_signal(signal.SIGTERM)
                sent = True
            time.sleep(1.0)
        if proc.poll() is None:
            proc.kill()
            proc.wait()
            raise SystemExit("[drill] life 1 timed out")
    rc1 = proc.returncode
    log1_text = open(log1_path).read()
    m = re.search(
        r"graceful shutdown: saving final train state at step (\d+)",
        log1_text,
    )
    final_step = int(m.group(1)) if m else -1
    ckpt = os.path.join(opt.workdir, f"celeba_train_state_{final_step}.ckpt")
    rows1 = read_rows(jsonl1)

    # ---- life 2: --resume auto, finish a bounded tail ----------------
    jsonl2 = os.path.join(opt.workdir, "life2.jsonl")
    log2_path = os.path.join(opt.workdir, "life2.log")
    with open(log2_path, "w") as log2:
        proc2 = subprocess.run(
            base_cmd
            + ["--jsonl", jsonl2, "--resume", "auto",
               "--max_steps", str(opt.tail)],
            env=env, stdout=log2, stderr=subprocess.STDOUT,
            timeout=opt.timeout,
        )
    log2_text = open(log2_path).read()
    rows2 = read_rows(jsonl2)
    finite2 = all(
        math.isfinite(v)
        for r in rows2
        for k, v in r.items()
        if isinstance(v, float)
    )

    last_cadence = (final_step // cadence) * cadence if final_step >= 0 else -1
    checks = {
        "life1_exit_86": rc1 == 86,
        "graceful_save_logged": final_step >= 0,
        "save_step_past_sigterm_target": final_step >= opt.sigterm_after,
        "save_not_on_cadence": final_step % cadence != 0 if final_step >= 0 else False,
        "final_ckpt_exists": os.path.exists(ckpt),
        "life2_restored_exact_step": (
            f"restoring {ckpt}" in log2_text
        ),
        "life2_first_row_is_final_step": bool(rows2)
        and rows2[0]["step"] == final_step,
        "life2_clean_exit": proc2.returncode == 0,
        "life2_ran_full_tail": bool(rows2)
        and rows2[-1]["step"] == final_step + opt.tail - 1,
        "life2_all_finite": bool(rows2) and finite2,
    }
    ok = all(checks.values())
    report = {
        "what": (
            "graceful preemption drill: SIGTERM (the Cloud TPU "
            "preemption notice) delivered to cli.celeba mid-schedule; "
            "the trainer finishes the in-flight window, saves a final "
            "atomic train state at the exact current step, exits 86; "
            "--resume auto continues with zero lost steps"
        ),
        "config": (
            f"cli.celeba, chain 32 (default), bf16, batch "
            f"{opt.batch_size}, sample_interval {opt.sample_interval}, "
            f"state cadence {cadence}, synthetic CelebA "
            f"(EADGAN_SYNTH_N={opt.synth_n})"
        ),
        "sigterm_target_step": opt.sigterm_after,
        "final_save_step": final_step,
        "last_cadence_save_step": last_cadence,
        "steps_rescued_vs_cadence_resume": (
            final_step - last_cadence if final_step >= 0 else None
        ),
        "life1_rc": rc1,
        "life1_last_logged_step": rows1[-1]["step"] if rows1 else None,
        "life2_rc": proc2.returncode,
        "life2_rows": len(rows2),
        "checks": checks,
        "all_pass": ok,
        "workdir": opt.workdir,
    }
    with open(opt.out, "w") as f:
        json.dump(report, f, indent=2)
    for k, v in checks.items():
        print(f"  {'PASS' if v else 'FAIL'} {k}")
    print(f"wrote {opt.out}; all_pass={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
