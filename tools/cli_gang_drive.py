#!/usr/bin/env python
"""Production-CLI gang drive: `cli.supervise --ranks 2 pxy` forms a real
2-process global mesh and must be numerically invisible vs the same
trainer single-process on the same 8 devices.

    python tools/cli_gang_drive.py [--steps 48] [--out MULTIHOST_CLI.json]

Round-5 capability: the trainer CLIs call ``cli.common.
init_multiprocess`` (a no-op outside a gang), so the SAME command a
user runs single-process joins a supervised gang when launched under
``cli.supervise --ranks N`` — rank env in, ``jax.distributed`` wired,
batches global (every rank computes the identical host batch from
``--seed`` and contributes its addressable slice via the ordinary
``shard_batch``/``shard_window`` placement), side effects and JSONL on
the coordinator only, preemption gang-synchronized.

This drive runs ``cli.pxy --data_parallel`` (synthetic dSprites, chain
default) both ways and asserts:

* the gang exits 0 with exactly the requested steps logged ONCE (no
  duplicate writes from rank 1);
* per-step metrics match the single-process 8-device run at the
  tests/test_parallel.py DP bar (rtol 2e-4) over the FIRST 8 steps —
  the depth the established multiprocess drives compare at — and stay
  within 1e-2 over the full run.  Gloo's ring reduction sums in a
  different order than XLA's local allreduce (~1e-7/step), and that
  rounding noise compounds through training dynamics (measured profile:
  bit-identical at step 0-1, ~1e-7 at step 8, ~1.6e-3 by step 47); a
  structural batching/sharding bug shows up as an EARLY mismatch, which
  the strict window catches;
* exactly one set of grid/checkpoint artifacts exists.

The misconfiguration guards are probed too: multi-process without
``--data_parallel`` and with ``--zero_opt`` must fail fast with the
documented messages.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def env_for(n_local: int):
    return dict(
        os.environ,
        EADGAN_PLATFORM="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n_local}",
        PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}",
    )


def trainer_args(workdir, opt, jsonl):
    return [
        "--data_parallel", "--data_dir", workdir, "--no_download",
        "--ckpt_dir", workdir, "--out_dir", os.path.join(workdir, "images"),
        "--batch_size", str(opt.batch_size), "--max_steps", str(opt.steps),
        "--sample_interval", str(opt.sample_interval),
        "--seed", str(opt.seed), "--jsonl", jsonl,
    ]


def read_rows(path):
    rows = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                rows.setdefault(r.pop("step"), []).append(
                    {k: v for k, v in r.items() if k != "t"}
                )
    return rows


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=48)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--sample_interval", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--timeout", type=int, default=1800)
    p.add_argument("--out", default="MULTIHOST_CLI.json")
    p.add_argument("--workdir", default="/tmp/eadgan_cli_gang")
    opt = p.parse_args()

    t0 = time.time()
    results = {}

    # ---- gang: supervise --ranks 2, each rank 4 virtual devices ------
    gangdir = os.path.join(opt.workdir, "gang")
    shutil.rmtree(gangdir, ignore_errors=True)
    os.makedirs(gangdir)
    gang_jsonl = os.path.join(gangdir, "metrics.jsonl")
    cmd = [
        sys.executable, "-m", "eadgan_tpu.cli.supervise", "--ranks", "2",
        "pxy", "--",
    ] + trainer_args(gangdir, opt, gang_jsonl)
    proc = subprocess.run(
        cmd, env=env_for(4), capture_output=True, text=True,
        timeout=opt.timeout,
    )
    open(os.path.join(gangdir, "run.log"), "w").write(
        proc.stdout + proc.stderr
    )
    gang_rows = read_rows(gang_jsonl)
    results["gang_rc"] = proc.returncode

    # ---- single-process, same 8 devices, same seed -------------------
    soledir = os.path.join(opt.workdir, "single")
    shutil.rmtree(soledir, ignore_errors=True)
    os.makedirs(soledir)
    solo_jsonl = os.path.join(soledir, "metrics.jsonl")
    proc2 = subprocess.run(
        [sys.executable, "-m", "eadgan_tpu.cli.pxy"]
        + trainer_args(soledir, opt, solo_jsonl),
        env=env_for(8), capture_output=True, text=True, timeout=opt.timeout,
    )
    open(os.path.join(soledir, "run.log"), "w").write(
        proc2.stdout + proc2.stderr
    )
    solo_rows = read_rows(solo_jsonl)
    results["single_rc"] = proc2.returncode

    # ---- guard probes -------------------------------------------------
    def guard_probe(extra, needle):
        cmd = [
            sys.executable, "-m", "eadgan_tpu.cli.supervise", "--ranks", "2",
            "pxy", "--", "--data_dir", gangdir, "--no_download",
            "--max_steps", "1",
        ] + extra
        pr = subprocess.run(
            cmd, env=env_for(2), capture_output=True, text=True, timeout=600
        )
        return pr.returncode != 0 and needle in (pr.stdout + pr.stderr)

    guards = {
        "rejects_missing_data_parallel": guard_probe(
            [], "pass --data_parallel"
        ),
        "rejects_zero_opt": guard_probe(
            ["--data_parallel", "--zero_opt", "--chain", "4"],
            "not supported in multi-process CLI runs",
        ),
    }

    # ---- verdicts -----------------------------------------------------
    max_rel, max_rel_early, compared = 0.0, 0.0, 0
    for s, gr in gang_rows.items():
        if s not in solo_rows:
            continue
        for k, v in gr[0].items():
            ref = solo_rows[s][0][k]
            rel = abs(v - ref) / max(abs(v), abs(ref), 1e-8)
            max_rel = max(max_rel, rel)
            if s < 8:
                max_rel_early = max(max_rel_early, rel)
            compared += 1
    checks = {
        "gang_clean_exit": proc.returncode == 0,
        "single_clean_exit": proc2.returncode == 0,
        "steps_logged_once": (
            len(gang_rows) == opt.steps
            and all(len(v) == 1 for v in gang_rows.values())
        ),
        "early_steps_match_single_process": compared >= opt.steps
        and max_rel_early <= 2e-4,
        "full_run_drift_bounded": max_rel <= 1e-2,
        "one_grid_set": os.path.isdir(os.path.join(gangdir, "images")),
        **guards,
    }
    ok = all(checks.values())
    report = {
        "what": (
            "production-CLI gang drive: the SAME cli.pxy command joins a "
            "cli.supervise --ranks 2 gang (init_multiprocess bootstrap, "
            "2 procs x 4 virtual devices, one global 8-device mesh) and "
            "matches the single-process 8-device run per step; "
            "misconfiguration guards fail fast"
        ),
        "steps": opt.steps,
        "metric_rows_compared": compared,
        "max_rel_diff_first_8_steps": max_rel_early,
        "max_rel_diff_full_run": max_rel,
        "drift_note": (
            "Gloo ring reduction vs XLA local allreduce sums in a "
            "different order; ~1e-7/step rounding noise compounds "
            "through 48 training steps — early-window strictness is the "
            "structural check, the full-run bound caps the drift"
        ),
        "wall_s": round(time.time() - t0, 1),
        "checks": checks,
        "all_pass": bool(ok),
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
