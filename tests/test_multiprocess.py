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
