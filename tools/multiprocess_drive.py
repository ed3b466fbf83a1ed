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
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

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
    # share one compile cache across the baseline and both workers: the
    # SPMD program over the 8-device mesh is identical in all three
    jax.config.update("jax_compilation_cache_dir", "/tmp/eadgan_mp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def run_steps(n_steps: int) -> dict:
    """Build the dSprites DP step on the global 8-device mesh, feed this
    process's batch shard, run ``n_steps``; returns per-step metrics
    (replicated scalars — identical on every process)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eadgan_tpu.models import (
        SpritesDiscriminator,
        SpritesEncoder,
        SpritesEncoderPxy,
        SpritesGenerator,
    )
    from eadgan_tpu.parallel import (
        default_mesh,
        global_batch_from_host,
        host_batch_slice,
        replicate,
    )
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
    state = replicate(mesh, state)

    batch = np.random.default_rng(42).uniform(0, 1, (16, 64, 64, 1)).astype(np.float32)
    history = []
    for i in range(n_steps):
        full = batch if i % 2 == 0 else batch[::-1]  # vary data across steps
        local = full[host_batch_slice(full.shape[0])]
        img = global_batch_from_host(mesh, local)
        state, metrics = step(state, img)
        history.append({k: float(v) for k, v in sorted(metrics.items())})
    return {
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "steps": history,
    }


def worker(opt) -> None:
    _init_jax(DEVICES_PER_PROC)
    from eadgan_tpu.parallel import initialize

    initialize(
        coordinator_address=f"localhost:{opt.port}",
        num_processes=opt.num_processes,
        process_id=opt.process_id,
    )
    result = run_steps(opt.steps)
    if opt.out and opt.process_id == 0:
        with open(opt.out, "w") as f:
            json.dump(result, f, indent=2)
    print(f"worker {opt.process_id}: {json.dumps(result['steps'][-1])}", flush=True)


def baseline(opt) -> None:
    _init_jax(DEVICES_PER_PROC * opt.num_processes)
    result = run_steps(opt.steps)
    with open(opt.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"baseline: {json.dumps(result['steps'][-1])}", flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch(opt) -> int:
    env = dict(os.environ, PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    me = os.path.abspath(__file__)
    port = _free_port()
    base_out = "/tmp/eadgan_mp_baseline.json"
    mp_out = "/tmp/eadgan_mp_proc0.json"

    print("running single-process 8-device baseline ...", flush=True)
    subprocess.run(
        [sys.executable, me, "--baseline", "--steps", str(opt.steps), "--out", base_out],
        env=env,
        check=True,
        timeout=1800,
    )

    print(f"launching {opt.num_processes} processes x {DEVICES_PER_PROC} devices ...", flush=True)
    procs = [
        subprocess.Popen(
            [
                sys.executable, me, "--worker",
                "--process_id", str(i),
                "--num_processes", str(opt.num_processes),
                "--port", str(port),
                "--steps", str(opt.steps),
                "--out", mp_out,
            ],
            env=env,
        )
        for i in range(opt.num_processes)
    ]
    rcs = [p.wait(timeout=1800) for p in procs]
    if any(rcs):
        print(f"FAIL: worker exit codes {rcs}")
        return 1

    with open(base_out) as f:
        base = json.load(f)
    with open(mp_out) as f:
        multi = json.load(f)

    assert multi["process_count"] == opt.num_processes, multi
    assert multi["global_devices"] == 8, multi
    assert multi["local_devices"] == DEVICES_PER_PROC, multi

    ok = True
    rows = []
    for s, (mb, mm) in enumerate(zip(base["steps"], multi["steps"])):
        for k in mb:
            diff = abs(mb[k] - mm[k])
            tol = max(1e-5, 2e-4 * abs(mb[k]))
            rows.append(
                {"step": s, "metric": k, "single": mb[k], "multi": mm[k],
                 "abs_diff": diff, "pass": diff <= tol}
            )
            ok &= diff <= tol
    report = {
        "topology": f"{opt.num_processes} processes x {DEVICES_PER_PROC} devices, Gloo coordinator",
        "baseline_topology": "1 process x 8 devices",
        "steps": opt.steps,
        "comparison": rows,
        "all_pass": ok,
    }
    with open(opt.out, "w") as f:
        json.dump(report, f, indent=2)
    for r in rows:
        print(
            f"  {'PASS' if r['pass'] else 'FAIL'} step{r['step']} {r['metric']}: "
            f"single={r['single']:.6f} multi={r['multi']:.6f}"
        )
    print(f"wrote {opt.out}; all_pass={ok}")
    return 0 if ok else 1


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--worker", action="store_true")
    parser.add_argument("--baseline", action="store_true")
    parser.add_argument("--process_id", type=int, default=0)
    parser.add_argument("--num_processes", type=int, default=2)
    parser.add_argument("--port", type=int, default=0)
    parser.add_argument("--steps", type=int, default=2)
    parser.add_argument("--out", default=os.path.join(REPO, "MULTIHOST_MP.json"))
    opt = parser.parse_args(argv)
    if opt.worker:
        worker(opt)
        return 0
    if opt.baseline:
        baseline(opt)
        return 0
    return launch(opt)


if __name__ == "__main__":
    sys.exit(main())
