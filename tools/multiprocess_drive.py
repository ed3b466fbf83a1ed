#!/usr/bin/env python
"""True multi-process DCN-path exercise (SURVEY.md §2.3 north star).

Launches TWO OS processes, each owning 4 virtual CPU devices, joined
into one 8-device mesh by ``jax.distributed.initialize`` with a
localhost coordinator — the exact bootstrap a multi-host TPU slice uses
(DCN collectives ride Gloo here, ICI there; the jax program is
identical).  Each process feeds only its half of the global batch via
:func:`eadgan_tpu.parallel.host_batch_slice` +
:func:`eadgan_tpu.parallel.global_batch_from_host`, then runs the full
DP dSprites GAN step for ``--steps`` steps.

The launcher also runs the same program single-process on 8 local
devices and asserts every per-step metric matches across the two
topologies (the multi-process path must be numerically invisible).

Usage:
    python tools/multiprocess_drive.py [--steps 2] [--out MULTIHOST.json]
    python tools/multiprocess_drive.py --worker --process_id N \
        --num_processes 2 --port P --out FILE     (internal)
    python tools/multiprocess_drive.py --gang_drill [--steps 40] \
        [--hang_step 25] [--out MULTIHOST_GANG.json]

``--gang_drill`` is the multi-process stall-recovery drill (VERDICT r3
item 2): a 2-process x 4-device DP gang trains under
``cli.supervise --ranks 2`` with periodic coordinator checkpoints; a
single rank is wedged mid-run by fault injection (the observed
hung-tunnel-RPC failure), its watchdog exits 87, the supervisor kills
the surviving rank (parked forever in a Gloo collective) and relaunches
the WHOLE gang with ``--resume auto``; life 2 restores the last
complete checkpoint and finishes.  The drill asserts the recovered
run's per-step metrics match an uninterrupted gang run exactly.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEVICES_PER_PROC = int(os.environ.get("EADGAN_MP_DEVICES_PER_PROC", "4"))


def _init_jax(n_local_devices: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_local_devices}"
        ).strip()
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    # NO persistent compile cache here: XLA:CPU AOT entries are compiled
    # with machine features (+prefer-no-scatter/gather) the host's
    # feature detection doesn't report, so every load warns "could lead
    # to SIGILL" and falls back — pure noise + the documented crash risk
    # (same reason cli/common.py gates its cache to accelerators).
    return jax


def _build_dsprites():
    import jax
    import jax.numpy as jnp

    from eadgan_tpu.models import (
        SpritesDiscriminator,
        SpritesEncoder,
        SpritesEncoderPxy,
        SpritesGenerator,
    )
    from eadgan_tpu.parallel import default_mesh, replicate
    from eadgan_tpu.train.config import SpritesGanConfig
    from eadgan_tpu.train.gan_dsprites import (
        init_sprites_gan_state,
        make_sprites_gan_step,
    )

    config = SpritesGanConfig()
    g, d, e, pxy = (
        SpritesGenerator(),
        SpritesDiscriminator(),
        SpritesEncoder(),
        SpritesEncoderPxy(),
    )
    pxy_vars = pxy.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
    state = init_sprites_gan_state(
        g, d, e, pxy, pxy_vars, config, jax.random.PRNGKey(0)
    )
    step = make_sprites_gan_step(g, d, e, pxy, config)

    mesh = default_mesh()  # spans all 8 global devices in every topology
    place = lambda s: replicate(mesh, s)  # noqa: E731
    return state, step, place, (16, 64, 64, 1)


def _build_celeba2d():
    """CelebA step on the (data=4, model=2) mesh: output-channel-sharded
    large kernels, so the TP all-gather/reduce-scatter collectives cross
    the PROCESS boundary in multi-process topologies (VERDICT r2 #3)."""
    import jax

    from eadgan_tpu.models import CelebaDiscriminator, CelebaGenerator
    from eadgan_tpu.parallel import default_mesh, replicate, shard_model_params
    from eadgan_tpu.train.config import CelebaConfig
    from eadgan_tpu.train.gan_celeba import (
        init_celeba_gan_state,
        make_celeba_gan_step,
    )

    config = CelebaConfig(batch_size=16)
    g, d = CelebaGenerator(), CelebaDiscriminator()
    state = init_celeba_gan_state(g, d, config, jax.random.PRNGKey(0))
    step = make_celeba_gan_step(g, d, config)
    mesh = default_mesh(model_parallel=2)

    def place(s):
        s = replicate(mesh, s)
        return s.replace(
            g=s.g.replace(params=shard_model_params(mesh, s.g.params)),
            d=s.d.replace(params=shard_model_params(mesh, s.d.params)),
        )

    return state, step, place, (16, 64, 64, 3)


def _build_dsprites_zero():
    """dSprites DP step with ZeRO-1 optimizer sharding (parallel/zero.py):
    the Adam moment slices live on different PROCESSES here, so the
    reduce-scatter of the moment update and the all-gather that rebuilds
    replicated params both cross the process boundary."""
    from eadgan_tpu.parallel import default_mesh, zero_place

    state, step, place, shape = _build_dsprites()
    mesh = default_mesh()
    return state, step, (lambda s: zero_place(mesh, place(s))), shape


_PIPELINES = {
    "dsprites": _build_dsprites,
    "celeba2d": _build_celeba2d,
    "dsprites_zero": _build_dsprites_zero,
}


def run_steps(
    n_steps: int,
    pipeline: str = "dsprites",
    ckpt_path: str = "",
    resume: bool = False,
    post_steps: int = 0,
) -> dict:
    """Build the pipeline's step on the global 8-device mesh, feed this
    process's batch shard, run ``n_steps``; returns per-step metrics
    (replicated scalars — identical on every process).

    Checkpoint semantics exercise (SURVEY.md §5 rebuild goal):
    ``ckpt_path`` + ``resume=False`` saves the state after ``n_steps``
    via :func:`eadgan_tpu.parallel.save_on_coordinator` (process 0
    writes, barrier), then runs ``post_steps`` more.  ``resume=True``
    instead restores that file — under WHATEVER process count this run
    has, which may differ from the writer's — and runs the same
    ``post_steps``; the ``post`` metric rows must match the writer's.
    """
    import jax
    import numpy as np

    from eadgan_tpu.parallel import (
        default_mesh,
        global_batch_from_host,
        host_batch_slice,
        save_on_coordinator,
    )
    from eadgan_tpu.train.checkpoint import restore_pytree

    state, step, place, batch_shape = _PIPELINES[pipeline]()
    mesh = default_mesh(model_parallel=2 if pipeline == "celeba2d" else 1)

    if resume:
        # every process reads the same replicated-state file and
        # re-places it on its local slice of the mesh
        state = restore_pytree(ckpt_path, jax.device_get(state))
    state = place(state)

    batch = np.random.default_rng(42).uniform(0, 1, batch_shape).astype(np.float32)
    if pipeline == "celeba2d":
        batch = batch * 2.0 - 1.0  # [-1, 1] like the real ingest

    # Compile is process-LOCAL and (on a contended CPU) can stagger ranks
    # by minutes; Gloo's collective context init times out 30s after the
    # first rank dispatches.  AOT-compile the step (tracing/compiling runs
    # no collectives), then line every rank up on an RPC-only barrier so
    # the first collective dispatches near-simultaneously everywhere.
    # The output state's shardings are pinned to the input placement
    # (XLA otherwise returns e.g. BN vectors model-sharded after the TP
    # backward, and the executable rejects them as next-call inputs).
    from eadgan_tpu.parallel import host_barrier

    state_sh = jax.tree.map(lambda x: x.sharding, state)

    @jax.jit
    def step_pinned(st, img):
        st2, m = step(st, img)
        st2 = jax.tree.map(
            lambda x, s: jax.lax.with_sharding_constraint(x, s), st2, state_sh
        )
        return st2, m

    local0 = batch[host_batch_slice(batch.shape[0])]
    compiled = step_pinned.lower(
        state, global_batch_from_host(mesh, local0)
    ).compile()
    host_barrier("eadgan_mp_warm")

    def one_step(i, st):
        full = batch if i % 2 == 0 else batch[::-1]  # vary data across steps
        local = full[host_batch_slice(full.shape[0])]
        img = global_batch_from_host(mesh, local)
        st, metrics = compiled(st, img)
        return st, {k: float(v) for k, v in sorted(metrics.items())}

    history, post = [], []
    if not resume:
        for i in range(n_steps):
            state, m = one_step(i, state)
            history.append(m)
        if ckpt_path:
            save_on_coordinator(ckpt_path, state)
    for i in range(n_steps, n_steps + post_steps):
        state, m = one_step(i, state)
        post.append(m)
    return {
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "pipeline": pipeline,
        "resumed": resume,
        "steps": history,
        "post": post,
    }


def worker(opt) -> None:
    _init_jax(opt.devices_per_proc)
    from eadgan_tpu.parallel import initialize

    initialize(
        coordinator_address=f"localhost:{opt.port}",
        num_processes=opt.num_processes,
        process_id=opt.process_id,
    )
    result = run_steps(
        opt.steps, pipeline=opt.pipeline, ckpt_path=opt.ckpt,
        resume=opt.resume, post_steps=opt.post_steps,
    )
    if opt.out and opt.process_id == 0:
        with open(opt.out, "w") as f:
            json.dump(result, f, indent=2)
    last = (result["post"] or result["steps"])[-1]
    print(f"worker {opt.process_id}: {json.dumps(last)}", flush=True)


def gang_worker(opt) -> None:
    """One rank of a supervised distributed run (``cli.supervise
    --ranks N`` is the launcher): rank identity comes from the
    ``EADGAN_MP_*`` env the supervisor injects, progress is guarded by a
    per-rank stall watchdog whose heartbeat lands only after the step's
    metrics were FETCHED (proven device-side progress), and the train
    state checkpoints every ``--ckpt_every`` steps through
    ``save_on_coordinator``.  ``--resume auto`` (what the supervisor
    appends on restart) restores the newest *loadable* checkpoint on
    every rank.

    Fault injection for the drill: ``EADGAN_FAULT_HANG_RANK`` +
    ``EADGAN_FAULT_HANG_STEP`` wedge exactly one rank's host thread
    forever (the observed hung-RPC failure mode), transient across lives
    via ``EADGAN_FAULT_HANG_MARKER`` — the same contract as the
    single-process drill hook in train/engine.py.
    """
    _init_jax(opt.devices_per_proc)
    from eadgan_tpu.parallel import initialize

    initialize()  # rank identity from the EADGAN_MP_* env (supervise --ranks)

    import jax
    import numpy as np

    from eadgan_tpu.parallel import (
        any_process_flag,
        default_mesh,
        global_batch_from_host,
        host_barrier,
        host_batch_slice,
        is_coordinator,
        save_on_coordinator,
    )
    from eadgan_tpu.train.checkpoint import restore_latest
    from eadgan_tpu.utils.preempt import PREEMPT_EXIT_CODE, PreemptionGuard
    from eadgan_tpu.utils.watchdog import Watchdog

    # Graceful gang preemption (drilled by tools/gang_preempt_drill.py):
    # SIGTERM to any subset of ranks — or to the supervisor, which fans
    # it out — sets the local flag; the per-step any_process_flag
    # consensus below stops EVERY rank at the same step boundary, one
    # collective final save runs, and all ranks exit 86.  The pidfile
    # lets the drill target an individual rank.
    guard = PreemptionGuard().install()
    with open(
        os.path.join(opt.ckpt_dir, f"rank_{os.environ.get('EADGAN_MP_PROCESS_ID', '0')}.pid"),
        "w",
    ) as f:
        f.write(str(os.getpid()))

    state, step, place, batch_shape = _PIPELINES[opt.pipeline]()
    mesh = default_mesh()

    if opt.resume == "auto":
        # every rank restores the same newest *loadable* file (the
        # corrupt-tolerant fallback of train/checkpoint.py) and
        # re-places it on its local mesh slice
        state, restored = restore_latest(
            opt.ckpt_dir, "train_state", jax.device_get(state)
        )
        if restored >= 0:
            print(
                f"gang_worker rank {jax.process_index()}: resumed from "
                f"step {restored}", flush=True,
            )
    state = place(state)
    start = int(jax.device_get(state.step))

    batch = np.random.default_rng(42).uniform(0, 1, batch_shape).astype(np.float32)
    state_sh = jax.tree.map(lambda x: x.sharding, state)

    @jax.jit
    def step_pinned(st, img):
        st2, m = step(st, img)
        st2 = jax.tree.map(
            lambda x, s: jax.lax.with_sharding_constraint(x, s), st2, state_sh
        )
        return st2, m

    local0 = batch[host_batch_slice(batch.shape[0])]
    compiled = step_pinned.lower(
        state, global_batch_from_host(mesh, local0)
    ).compile()
    host_barrier("eadgan_gang_warm")

    wd = Watchdog(opt.watchdog).start() if opt.watchdog else None
    hang_step = int(os.environ.get("EADGAN_FAULT_HANG_STEP", 0) or 0)
    hang_rank = int(os.environ.get("EADGAN_FAULT_HANG_RANK", 0) or 0)
    marker = os.environ.get("EADGAN_FAULT_HANG_MARKER", "")
    if hang_step and marker and os.path.exists(marker):
        hang_step = 0  # transient fault: the restarted life skips it

    jsonl = open(os.path.join(opt.ckpt_dir, "metrics.jsonl"), "a") if (
        is_coordinator()
    ) else None
    preempted_at = None
    try:
        for i in range(start, opt.steps):
            full = batch if i % 2 == 0 else batch[::-1]  # deterministic per step
            local = full[host_batch_slice(full.shape[0])]
            state, metrics = compiled(state, global_batch_from_host(mesh, local))
            m = {k: float(v) for k, v in sorted(metrics.items())}  # forces fetch
            done = i + 1
            if jsonl is not None:
                jsonl.write(json.dumps({"step": done, **m}) + "\n")
                jsonl.flush()
            if wd is not None:
                wd.beat(done)  # metrics fetched above: proven device progress
            if hang_step and done >= hang_step and jax.process_index() == hang_rank:
                if marker:
                    open(marker, "w").close()
                print(
                    f"gang_worker rank {hang_rank}: fault injection, "
                    f"hanging at step {done}", flush=True,
                )
                while True:
                    time.sleep(3600)
            if opt.ckpt_every and done % opt.ckpt_every == 0 and done < opt.steps:
                save_on_coordinator(
                    os.path.join(opt.ckpt_dir, f"train_state_{done}.ckpt"), state
                )
                if opt.keep and is_coordinator():
                    from eadgan_tpu.train.checkpoint import prune_saved

                    prune_saved(
                        opt.ckpt_dir, "train_state", opt.keep,
                        current_step=done,
                    )
            # Stop consensus, one collective per step: symmetric across
            # ranks, so a flag raised on ANY rank stops the whole gang
            # at THIS boundary (engine.run_epochs polls the same
            # primitive per window; here the loop is per-step).
            if any_process_flag(guard.requested.is_set()):
                guard.requested.set()
                save_on_coordinator(
                    os.path.join(opt.ckpt_dir, f"train_state_{done}.ckpt"),
                    state,
                )
                if opt.keep and is_coordinator():
                    from eadgan_tpu.train.checkpoint import prune_saved

                    prune_saved(
                        opt.ckpt_dir, "train_state", opt.keep,
                        current_step=done,
                    )
                print(
                    f"gang_worker rank {jax.process_index()}: preempted, "
                    f"saved final train state at step {done}, exiting "
                    f"{PREEMPT_EXIT_CODE}",
                    flush=True,
                )
                preempted_at = done
                break
    finally:
        if jsonl is not None:
            jsonl.close()
    if wd is not None:
        wd.stop()
    if preempted_at is not None and preempted_at < opt.steps:
        # cut short (same verdict cli.common.exit_if_preempted applies):
        # a signal landing on the final step leaves the run COMPLETE
        sys.exit(PREEMPT_EXIT_CODE)
    print(
        f"gang_worker rank {jax.process_index()}: done at step {opt.steps}",
        flush=True,
    )


def gang_drill(opt) -> int:
    """Run the supervised-gang stall-recovery drill and verify it.

    Phase 1 (reference): an uninterrupted ``--ranks N`` gang run.
    Phase 2 (faulted): the same run with rank 1 wedged at
    ``--hang_step``; the supervisor must restart the whole gang once and
    life 2 must finish.  Every step the faulted run logged must match
    the reference run's same-step metrics exactly (resume is bit-exact
    and the data schedule is a pure function of the step index).
    """
    if not 0 < opt.hang_step < opt.steps:
        raise SystemExit(
            f"--hang_step {opt.hang_step} must fall inside the run "
            f"(--steps {opt.steps}), or the fault never fires and the "
            "drill silently tests nothing — use e.g. --steps 40 --hang_step 25"
        )
    env_base = dict(
        os.environ, PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}"
    )
    me = os.path.abspath(__file__)
    phases = {}
    ok = True
    for phase in ("reference", "faulted"):
        workdir = f"/tmp/eadgan_gang_{phase}"
        shutil.rmtree(workdir, ignore_errors=True)
        os.makedirs(workdir)
        env = dict(env_base)
        if phase == "faulted":
            env.update(
                EADGAN_FAULT_HANG_STEP=str(opt.hang_step),
                EADGAN_FAULT_HANG_RANK="1",
                EADGAN_FAULT_HANG_MARKER=os.path.join(workdir, "fault_fired"),
            )
        cmd = [
            sys.executable, "-m", "eadgan_tpu.cli.supervise",
            "--ranks", str(opt.num_processes), "--max_restarts", "2",
            me, "--",
            "--gang_worker", "--steps", str(opt.steps),
            "--ckpt_every", str(opt.ckpt_every), "--ckpt_dir", workdir,
            "--watchdog", str(opt.watchdog), "--pipeline", opt.pipeline,
            "--devices_per_proc", str(opt.devices_per_proc),
        ]
        print(f"[gang_drill] {phase}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        proc = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=3600
        )
        wall = round(time.time() - t0, 1)
        log = proc.stdout + proc.stderr
        with open(os.path.join(workdir, "supervise.log"), "w") as f:
            f.write(log)
        rows = {}
        metrics_path = os.path.join(workdir, "metrics.jsonl")
        if os.path.exists(metrics_path):
            with open(metrics_path) as f:
                for line in f:
                    r = json.loads(line)
                    rows[r.pop("step")] = r  # later lives win on overlap
        phases[phase] = {
            "returncode": proc.returncode,
            "wall_s": wall,
            "rows": rows,
            "restarts": log.count("restart 1/"),
            "log_dir": workdir,
        }
        if proc.returncode != 0:
            print(f"[gang_drill] {phase} FAILED rc={proc.returncode}\n{log[-4000:]}")
            ok = False

    ref, flt = phases["reference"], phases["faulted"]
    checks = {
        "reference_clean": ref["returncode"] == 0 and ref["restarts"] == 0,
        "fault_fired": os.path.exists("/tmp/eadgan_gang_faulted/fault_fired"),
        "gang_restarted_once": flt["restarts"] >= 1,
        "recovered_to_completion": flt["returncode"] == 0
        and max(flt["rows"], default=0) == opt.steps,
        "watchdog_stall_in_log": "watchdog_stall" in open(
            "/tmp/eadgan_gang_faulted/supervise.log"
        ).read(),
    }
    # every step both runs logged must match: resume restores bit-exact
    # state and the batch schedule is a pure function of the step index
    max_diff, compared = 0.0, 0
    for s, r in flt["rows"].items():
        if s not in ref["rows"]:
            continue
        for k, v in r.items():
            max_diff = max(max_diff, abs(v - ref["rows"][s][k]))
            compared += 1
    checks["steps_match_uninterrupted"] = compared > 0 and max_diff <= 1e-6
    ok &= all(checks.values())

    report = {
        "what": (
            "multi-process stall recovery: cli.supervise --ranks "
            f"{opt.num_processes} owns the gang; rank 1 wedged at step "
            f"{opt.hang_step}; watchdog exit 87 on any rank kills all "
            "ranks and relaunches the gang with --resume auto"
        ),
        "topology": f"{opt.num_processes} processes x {opt.devices_per_proc} "
        "devices, Gloo coordinator (fresh port per life)",
        "pipeline": opt.pipeline,
        "steps": opt.steps,
        "ckpt_every": opt.ckpt_every,
        "hang_step": opt.hang_step,
        "watchdog_s": opt.watchdog,
        "checks": checks,
        "metric_rows_compared": compared,
        "max_abs_metric_diff_vs_uninterrupted": max_diff,
        "reference_wall_s": ref["wall_s"],
        "faulted_wall_s": flt["wall_s"],
        "all_pass": bool(ok),
    }
    with open(opt.out, "w") as f:
        json.dump(report, f, indent=2)
    for k, v in checks.items():
        print(f"  {'PASS' if v else 'FAIL'} {k}")
    print(f"wrote {opt.out}; all_pass={ok}")
    return 0 if ok else 1


def baseline(opt) -> None:
    _init_jax(8)
    # ckpt_path="": the baseline must NOT write opt.ckpt — the resume
    # phase has to restore the file the multi-process workers wrote, and
    # a baseline-written copy (numerically identical state) would mask a
    # silently-skipped worker-side save_on_coordinator.
    result = run_steps(
        opt.steps, pipeline=opt.pipeline, ckpt_path="",
        resume=False, post_steps=opt.post_steps,
    )
    with open(opt.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"baseline: {json.dumps(result['steps'][-1])}", flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_workers(opt, env, me, *, num_processes, devices_per_proc, out,
                   resume=False):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [
                sys.executable, me, "--worker",
                "--process_id", str(i),
                "--num_processes", str(num_processes),
                "--devices_per_proc", str(devices_per_proc),
                "--port", str(port),
                "--steps", str(opt.steps),
                "--post_steps", str(opt.post_steps),
                "--pipeline", opt.pipeline,
                "--ckpt", opt.ckpt,
                "--out", out,
            ]
            + (["--resume"] if resume else []),
            env=env,
        )
        for i in range(num_processes)
    ]
    return [p.wait(timeout=1800) for p in procs]


def _compare(rows, ok, tag, base_steps, multi_steps, rtol):
    for s, (mb, mm) in enumerate(zip(base_steps, multi_steps)):
        for k in mb:
            diff = abs(mb[k] - mm[k])
            tol = max(1e-5, rtol * abs(mb[k]))
            rows.append(
                {"phase": tag, "step": s, "metric": k, "single": mb[k],
                 "multi": mm[k], "abs_diff": diff, "pass": diff <= tol}
            )
            ok &= diff <= tol
    return ok


def launch(opt) -> int:
    env = dict(os.environ, PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    me = os.path.abspath(__file__)
    base_out = "/tmp/eadgan_mp_baseline.json"
    mp_out = "/tmp/eadgan_mp_proc0.json"
    resume_out = "/tmp/eadgan_mp_resume.json"
    if opt.ckpt and os.path.exists(opt.ckpt):
        os.remove(opt.ckpt)

    print(f"[{opt.pipeline}] single-process 8-device baseline ...", flush=True)
    subprocess.run(
        [sys.executable, me, "--baseline", "--steps", str(opt.steps),
         "--post_steps", str(opt.post_steps), "--pipeline", opt.pipeline,
         "--out", base_out],
        env=env,
        check=True,
        timeout=1800,
    )

    n, dpp = opt.num_processes, opt.devices_per_proc
    print(f"[{opt.pipeline}] launching {n} processes x {dpp} devices ...", flush=True)
    rcs = _spawn_workers(
        opt, env, me, num_processes=n, devices_per_proc=dpp, out=mp_out
    )
    if any(rcs):
        print(f"FAIL: worker exit codes {rcs}")
        return 1

    with open(base_out) as f:
        base = json.load(f)
    with open(mp_out) as f:
        multi = json.load(f)

    assert multi["process_count"] == n, multi
    assert multi["global_devices"] == 8, multi
    assert multi["local_devices"] == dpp, multi

    # TP (celeba2d) legitimately reorders the sharded contractions, and
    # that noise amplifies chaotically through the GAN trajectory
    # (measured rel drift ~4e-3 by step 3-4 — same bars as
    # tests/test_parallel.py's trajectory check); the DP pipeline must be
    # bit-tight at every step.
    dp = opt.pipeline in ("dsprites", "dsprites_zero")
    rtol, rtol_post = (2e-4, 2e-4) if dp else (1e-3, 1e-2)
    rows = []
    ok = _compare(rows, True, "train", base["steps"], multi["steps"], rtol)

    resume_report = None
    if opt.ckpt and opt.post_steps:
        # multi-process run SAVED at step `steps` (process 0 wrote it,
        # barrier in save_on_coordinator); now restore under a DIFFERENT
        # process count and drive the same post-ckpt schedule
        rn, rdpp = opt.resume_processes, 8 // opt.resume_processes
        print(
            f"[{opt.pipeline}] resume {opt.ckpt} under {rn} processes x "
            f"{rdpp} devices (writer had {n}) ...",
            flush=True,
        )
        rcs = _spawn_workers(
            opt, env, me, num_processes=rn, devices_per_proc=rdpp,
            out=resume_out, resume=True,
        )
        if any(rcs):
            print(f"FAIL: resume worker exit codes {rcs}")
            return 1
        with open(resume_out) as f:
            res = json.load(f)
        assert res["process_count"] == rn and res["resumed"], res
        ok = _compare(rows, ok, "post-ckpt(writer)", base["post"], multi["post"], rtol_post)
        ok = _compare(rows, ok, "post-ckpt(resume)", base["post"], res["post"], rtol_post)
        # the resume drift must match the writer-continuation drift in
        # magnitude — a broken restore diverges like a fresh init (O(1)),
        # not like reduction-order noise
        ok = _compare(rows, ok, "resume-vs-writer", multi["post"], res["post"], rtol_post)
        resume_report = {
            "writer_topology": f"{n} x {dpp}",
            "resume_topology": f"{rn} x {rdpp}",
            "ckpt": opt.ckpt,
        }

    report = {
        "pipeline": opt.pipeline,
        "topology": f"{n} processes x {dpp} devices, Gloo coordinator",
        "baseline_topology": "1 process x 8 devices",
        "steps": opt.steps,
        "post_steps": opt.post_steps,
        "checkpoint": resume_report,
        "comparison": rows,
        "all_pass": ok,
    }
    with open(opt.out, "w") as f:
        json.dump(report, f, indent=2)
    for r in rows:
        print(
            f"  {'PASS' if r['pass'] else 'FAIL'} {r['phase']} step{r['step']} "
            f"{r['metric']}: single={r['single']:.6f} multi={r['multi']:.6f}"
        )
    print(f"wrote {opt.out}; all_pass={ok}")
    return 0 if ok else 1


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--worker", action="store_true")
    parser.add_argument("--baseline", action="store_true")
    parser.add_argument("--process_id", type=int, default=0)
    parser.add_argument("--num_processes", type=int, default=2)
    parser.add_argument("--devices_per_proc", type=int, default=DEVICES_PER_PROC)
    parser.add_argument("--port", type=int, default=0)
    parser.add_argument("--steps", type=int, default=2)
    parser.add_argument(
        "--pipeline", choices=sorted(_PIPELINES), default="dsprites",
        help="dsprites = DP mesh; celeba2d = (data=4, model=2) TP mesh",
    )
    parser.add_argument(
        "--ckpt", default="",
        help="exercise checkpoint semantics: save after --steps "
        "(coordinator writes), resume under --resume_processes",
    )
    parser.add_argument(
        "--post_steps", type=int, default=0,
        help="steps to run after the checkpoint point (compared across "
        "writer continuation and resumed run)",
    )
    parser.add_argument(
        "--resume_processes", type=int, default=4,
        help="process count for the resume phase (devices_per_proc = 8/N)",
    )
    parser.add_argument(
        "--resume", nargs="?", const="1", default="",
        help="(internal) truthy for the worker resume phase; 'auto' in "
        "gang mode restores the newest loadable checkpoint (what "
        "cli.supervise appends on restart)",
    )
    parser.add_argument("--out", default=os.path.join(REPO, "MULTIHOST_MP.json"))
    # gang mode (supervised multi-process stall recovery)
    parser.add_argument("--gang_worker", action="store_true")
    parser.add_argument("--gang_drill", action="store_true")
    parser.add_argument("--ckpt_dir", default="/tmp/eadgan_gang")
    parser.add_argument(
        "--ckpt_every", type=int, default=10,
        help="gang mode: coordinator checkpoint interval (steps)",
    )
    parser.add_argument(
        "--watchdog", type=float, default=15.0,
        help="gang mode: per-rank stall watchdog timeout (seconds); keep "
        "it below Gloo's ~30s collective timeout so the drill proves the "
        "87 path rather than a collective error",
    )
    parser.add_argument(
        "--hang_step", type=int, default=25,
        help="gang drill: step at which rank 1 wedges",
    )
    parser.add_argument(
        "--keep", type=int, default=0,
        help="gang mode: --keep_states retention for train_state_*.ckpt "
        "(coordinator prunes after each cadence save; 0 = keep all)",
    )
    opt = parser.parse_args(argv)
    if opt.gang_worker:
        gang_worker(opt)
        return 0
    if opt.gang_drill:
        return gang_drill(opt)
    if opt.worker:
        worker(opt)
        return 0
    if opt.baseline:
        baseline(opt)
        return 0
    return launch(opt)


if __name__ == "__main__":
    sys.exit(main())
