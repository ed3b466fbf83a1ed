"""True multi-process (DCN-path) coverage: two OS processes, 4 virtual
CPU devices each, joined by ``jax.distributed.initialize`` over a
localhost coordinator — the exact bootstrap of a multi-host TPU slice
(parallel/multihost.py).

This test keeps the *bootstrap + sharded-collective* path fast enough
for the suite: each worker assembles its half of a global batch with
``host_batch_slice`` + ``global_batch_from_host`` and runs a jitted
global mean+matmul.  The full DP dSprites GAN step under the same
topology is exercised by ``tools/multiprocess_drive.py`` (committed
artifact: MULTIHOST_MP.json — every per-step metric equal to the
single-process 8-device run).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import json, os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from eadgan_tpu.parallel import (
        default_mesh, global_batch_from_host, host_batch_slice, initialize,
    )
    initialize(coordinator_address=f"localhost:{{port}}", num_processes=2,
               process_id=pid)
    assert jax.process_count() == 2
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    import numpy as np, jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = default_mesh()
    full = np.arange(16 * 8, dtype=np.float32).reshape(16, 8)
    local = full[host_batch_slice(16)]
    g = global_batch_from_host(mesh, local)
    assert g.shape == (16, 8)

    w = np.ones((8, 4), np.float32)
    out = jax.jit(
        lambda x, w: jnp.mean(x @ w),
        out_shardings=NamedSharding(mesh, P()),
    )(g, w)
    print("RESULT", json.dumps({{"pid": pid, "mean": float(out)}}), flush=True)
    """
)


def test_two_process_gloo_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    env = dict(os.environ, PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    assert all(p.returncode == 0 for p in procs), outs

    expected = float((__import__("numpy").arange(16 * 8).reshape(16, 8) @
                      __import__("numpy").ones((8, 4))).mean())
    for (stdout, _), p in zip(outs, procs):
        line = next(l for l in stdout.splitlines() if l.startswith("RESULT "))
        got = json.loads(line[len("RESULT "):])
        assert abs(got["mean"] - expected) < 1e-3, got


# --- gang-synchronized preemption stop (round-5 engine stop contract) ----
#
# A SIGTERM delivered to ONE rank must stop BOTH ranks at the SAME loop
# boundary (parallel.any_process_flag consensus — a rank stopping alone
# would park its peer in a collective forever), write ONE collective
# final checkpoint (checkpoint.save_train_state_sync: coordinator write
# behind a barrier), and exit 86 on every rank.  The full production
# chain (cli.supervise gang + GAN pipelines + ZeRO) is drilled by
# tools/gang_preempt_drill.py (MULTIHOST_GANG_PREEMPT.json); this test
# keeps the consensus + collective-save primitives covered in-suite
# without a GAN compile.

PREEMPT_WORKER = textwrap.dedent(
    """
    import json, os, sys, time
    pid, port, ckpt_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from eadgan_tpu.parallel import any_process_flag, initialize
    from eadgan_tpu.train.checkpoint import save_train_state_sync
    from eadgan_tpu.utils.preempt import PREEMPT_EXIT_CODE, PreemptionGuard

    initialize(coordinator_address=f"localhost:{{port}}", num_processes=2,
               process_id=pid)
    guard = PreemptionGuard().install()
    print("READY", os.getpid(), flush=True)

    import jax.numpy as jnp
    state = {{"w": jnp.zeros((4,)), "step": jnp.zeros((), jnp.int32)}}
    step = jax.jit(lambda s: {{"w": s["w"] + 1.0, "step": s["step"] + 1}})
    for i in range(1, 401):
        state = step(state)
        time.sleep(0.02)  # pace so the signal lands mid-run
        if any_process_flag(guard.requested.is_set()):
            guard.requested.set()
            save_train_state_sync(ckpt_dir, "mp_toy", i, jax.device_get(state))
            print(f"SYNC_STOP {{i}}", flush=True)
            sys.exit(PREEMPT_EXIT_CODE)
    print("NEVER_STOPPED", flush=True)
    """
)


def test_gang_stop_consensus_and_collective_save(tmp_path):
    import signal
    import time

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "preempt_worker.py"
    script.write_text(PREEMPT_WORKER.format(repo=REPO))
    env = dict(os.environ, PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    try:
        # wait for rank 1's READY line, then preempt ONLY rank 1
        ready = procs[1].stdout.readline()
        assert ready.startswith("READY"), ready
        time.sleep(1.5)
        procs[1].send_signal(signal.SIGTERM)
        outs = [p.communicate(timeout=300) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()

    from eadgan_tpu.utils.preempt import PREEMPT_EXIT_CODE

    assert [p.returncode for p in procs] == [PREEMPT_EXIT_CODE] * 2, outs
    stops = []
    for stdout, _ in outs:
        line = next(l for l in stdout.splitlines() if l.startswith("SYNC_STOP"))
        stops.append(int(line.split()[1]))
    # the consensus: both ranks stopped at the SAME boundary
    assert stops[0] == stops[1], (stops, outs)
    # ONE collective checkpoint at that boundary (coordinator wrote it,
    # the barrier kept rank 1 alive until the write completed)
    assert os.path.exists(tmp_path / f"mp_toy_{stops[0]}.ckpt")
