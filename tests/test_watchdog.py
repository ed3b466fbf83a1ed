"""Stall watchdog + supervised restart (utils/watchdog.py, cli/supervise.py).

The failure these protect against was observed live: the 600k-step
CelebA soak wedged once on a hung tunnel RPC and needed a manual
kill + ``--resume auto`` relaunch (evidence/soak_r3/celeba_600k/).
The reference has no counterpart — a crash loses the run (SURVEY.md
section 5, checkpoints are save-only).
"""

import json
import os
import subprocess
import sys
import textwrap
import time

import pytest

from eadgan_tpu.utils.watchdog import STALL_EXIT_CODE, Watchdog


@pytest.fixture(autouse=True)
def _restore_sigterm():
    """supervise.main() installs a process-wide SIGTERM handler; the
    in-process tests here must not leak it into the rest of the pytest
    run (a CI timeout's SIGTERM would then raise SystemExit inside an
    unrelated test instead of terminating)."""
    import signal

    before = signal.getsignal(signal.SIGTERM)
    yield
    signal.signal(signal.SIGTERM, before)


def _wait_for(predicate, timeout=5.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if predicate():
            return True
        time.sleep(0.01)
    return predicate()


def test_fires_without_beats():
    fired = []
    wd = Watchdog(0.15, first_timeout=0.15, on_stall=fired.append).start()
    try:
        assert _wait_for(lambda: fired)
        assert fired[0]["event"] == "watchdog_stall"
        assert fired[0]["exit_code"] == STALL_EXIT_CODE
        assert fired[0]["step"] is None  # never beat
    finally:
        wd.stop()


def test_beats_prevent_firing():
    fired = []
    wd = Watchdog(0.3, first_timeout=0.3, on_stall=fired.append).start()
    try:
        for step in range(12):
            wd.beat(step)
            time.sleep(0.05)  # 0.6 s total, each gap well under timeout
        assert not fired
    finally:
        wd.stop()
    time.sleep(0.2)
    assert not fired  # stop() disarms: no late firing either


def test_first_timeout_covers_the_compile_window():
    """Before the first beat the (larger) first_timeout applies — the
    first window includes the 30 s - 7 min remote train-step compile."""
    fired = []
    wd = Watchdog(0.1, first_timeout=0.8, on_stall=fired.append).start()
    try:
        time.sleep(0.35)  # >> timeout, << first_timeout: must not fire
        assert not fired
        wd.beat(1)
        assert _wait_for(lambda: fired)  # now the steady timeout governs
        assert fired[0]["step"] == 1
    finally:
        wd.stop()


def test_grace_survives_beats_until_released():
    """grace() models a known-expensive in-flight compile.  Dispatch is
    async through the tunnel, so heartbeats keep landing while the
    compile is pending — beats must NOT release the grace; only
    clear_grace() (the engine fetched the compiled window's metrics)
    or the grace's own expiry does."""
    fired = []
    wd = Watchdog(0.15, first_timeout=0.15, on_stall=fired.append).start()
    try:
        wd.beat(1)
        wd.grace(5.0)
        wd.beat(2)  # async dispatch returned; compile still in flight
        time.sleep(0.5)  # >> timeout, << grace: must not fire
        assert not fired
        wd.clear_grace()  # engine drained the compiled window's metrics
        assert _wait_for(lambda: fired)  # steady timeout governs again
        assert fired[0]["step"] == 2
    finally:
        wd.stop()


def test_grace_expires_on_its_own():
    """A grace that is never explicitly released still expires, so a
    real stall during it is detected (bounded delay, not a blind spot)."""
    fired = []
    wd = Watchdog(0.1, first_timeout=0.1, on_stall=fired.append).start()
    try:
        wd.beat(1)
        wd.grace(0.3)
        assert _wait_for(lambda: fired, timeout=2.0)
    finally:
        wd.stop()


def test_rejects_nonpositive_timeout():
    with pytest.raises(ValueError):
        Watchdog(0.0)


STUB_TRAINER = textwrap.dedent(
    """
    import argparse, json, os, time
    from eadgan_tpu.utils.watchdog import Watchdog

    p = argparse.ArgumentParser()
    p.add_argument("--resume", default="")
    p.add_argument("--state_dir", required=True)
    opt = p.parse_args()

    ckpt = os.path.join(opt.state_dir, "ckpt.json")
    step = 0
    if opt.resume == "auto" and os.path.exists(ckpt):
        with open(ckpt) as f:
            step = json.load(f)["step"]
        print(f"resumed from step {step}", flush=True)

    wd = Watchdog(0.4, first_timeout=2.0).start()
    for s in range(step, 8):
        time.sleep(0.02)  # the "train step"
        with open(ckpt, "w") as f:
            json.dump({"step": s + 1}, f)
        wd.beat(s + 1)
        if s + 1 == 4 and opt.resume != "auto":
            # injected wedge on the first life only: host thread parked
            # outside Python's reach, exactly like the soak's hung RPC
            time.sleep(3600)
    wd.stop()
    print("stub trainer finished", flush=True)
    """
)


def test_supervise_restarts_a_wedged_trainer(tmp_path, capsys, monkeypatch):
    """End to end: trainer wedges mid-run -> watchdog exits 87 ->
    supervise relaunches with --resume auto -> run completes from the
    checkpoint."""
    from eadgan_tpu.cli import supervise

    pkg = tmp_path / "wdstub"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "trainer.py").write_text(STUB_TRAINER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = os.environ.get("PYTHONPATH", "")
    monkeypatch.setenv(
        "PYTHONPATH", os.pathsep.join(filter(None, [str(tmp_path), repo, extra]))
    )

    supervise.main(
        ["--max_restarts", "2", "wdstub.trainer", "--state_dir", str(tmp_path)]
    )

    with open(tmp_path / "ckpt.json") as f:
        assert json.load(f)["step"] == 8
    out = capsys.readouterr().out
    assert "restart 1/2 with --resume auto" in out
    assert "finished cleanly after 1 restart(s)" in out


def test_supervise_gives_up_after_budget(tmp_path, monkeypatch):
    """A trainer that always stalls exhausts --max_restarts and the
    stall code propagates."""
    pkg = tmp_path / "wdstub2"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "trainer.py").write_text(
        textwrap.dedent(
            """
            import sys, time
            from eadgan_tpu.utils.watchdog import Watchdog
            Watchdog(0.3, first_timeout=0.3).start()
            time.sleep(3600)
            """
        )
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = os.environ.get("PYTHONPATH", "")
    env = dict(
        os.environ,
        PYTHONPATH=os.pathsep.join(filter(None, [str(tmp_path), repo, extra])),
    )
    proc = subprocess.run(
        [
            sys.executable, "-m", "eadgan_tpu.cli.supervise",
            "--max_restarts", "1", "wdstub2.trainer",
        ],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == STALL_EXIT_CODE
    assert "restart 1/1" in proc.stdout
    assert "giving up" in proc.stdout


def test_stalled_process_exits_with_code_and_stacks(tmp_path):
    """The default on_stall action: diagnostics on stderr + hard exit
    with STALL_EXIT_CODE (what cli.supervise keys on)."""
    script = tmp_path / "wedge.py"
    script.write_text(
        textwrap.dedent(
            """
            import time
            from eadgan_tpu.utils.watchdog import Watchdog
            wd = Watchdog(0.3, first_timeout=0.3, diag_path="stall_diag.txt").start()
            wd.beat(7)
            time.sleep(3600)
            """
        )
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = os.environ.get("PYTHONPATH", "")
    env = dict(
        os.environ, PYTHONPATH=os.pathsep.join(filter(None, [repo, extra]))
    )
    proc = subprocess.run(
        [sys.executable, str(script)],
        env=env, cwd=tmp_path, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == STALL_EXIT_CODE
    assert "watchdog_stall" in proc.stderr
    assert "Thread" in proc.stderr or "Current thread" in proc.stderr
    diag = (tmp_path / "stall_diag.txt").read_text()
    record = json.loads(diag.splitlines()[0])
    assert record["step"] == 7
    # the wedged main-thread stack is captured (faulthandler file:line form)
    assert "wedge.py" in diag and "line 6" in diag


# --- gang supervision (cli.supervise --ranks N) --------------------------

GANG_STUB = textwrap.dedent(
    """
    # Gang-member stub: records the rank environment the supervisor
    # injected, then follows the scripted failure mode.  No jax import —
    # this tests the supervisor's group semantics, not the collectives
    # (those are drilled by tools/multiprocess_drive.py --gang_drill).
    import argparse, json, os, sys, time

    p = argparse.ArgumentParser()
    p.add_argument("--state_dir", required=True)
    p.add_argument("--resume", default="")
    p.add_argument("--mode", default="stall_rank1")
    opt = p.parse_args()
    rank = os.environ["EADGAN_MP_PROCESS_ID"]
    record = {
        "resume": opt.resume,
        "coord": os.environ["EADGAN_MP_COORDINATOR"],
        "nprocs": os.environ["EADGAN_MP_NUM_PROCESSES"],
    }
    with open(os.path.join(opt.state_dir, f"rank{rank}.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\\n")
    marker = os.path.join(opt.state_dir, "stalled_once")
    first_life = not os.path.exists(marker)
    if opt.mode == "stall_rank1" and rank == "1" and first_life:
        open(marker, "w").close()
        sys.exit(87)
    if opt.mode == "peer_hangs" and first_life:
        if rank == "0":
            # this rank's watchdog "fires": exit 87 after a beat
            time.sleep(0.3)
            open(marker, "w").close()
            sys.exit(87)
        # the peer is parked inside a collective that will never
        # complete: it must be KILLED by the supervisor, not waited on
        time.sleep(3600)
    print(f"rank {rank} done", flush=True)
    """
)


def _write_gang_stub(tmp_path):
    script = tmp_path / "gang_stub.py"
    script.write_text(GANG_STUB)
    return str(script)


def test_supervise_gang_restarts_all_ranks(tmp_path, capsys):
    """One rank exits 87 -> the supervisor relaunches the WHOLE gang
    with --resume auto and a fresh coordinator port."""
    from eadgan_tpu.cli import supervise

    script = _write_gang_stub(tmp_path)
    supervise.main(
        ["--ranks", "2", "--max_restarts", "2", script,
         "--", "--state_dir", str(tmp_path)]
    )
    lives = {}
    for rank in (0, 1):
        with open(tmp_path / f"rank{rank}.jsonl") as f:
            lives[rank] = [json.loads(l) for l in f]
    # every rank ran twice: the healthy rank was restarted too
    assert len(lives[0]) == 2 and len(lives[1]) == 2
    for rank in (0, 1):
        assert lives[rank][0]["resume"] == ""
        assert lives[rank][1]["resume"] == "auto"
        assert lives[rank][0]["nprocs"] == "2"
    # a Gloo coordinator cannot be rejoined: life 2 must get a new port
    assert lives[0][0]["coord"] != lives[0][1]["coord"]
    assert lives[0][1]["coord"] == lives[1][1]["coord"]
    out = capsys.readouterr().out
    assert "restart 1/2 with --resume auto" in out
    assert "finished cleanly after 1 restart(s)" in out


def test_supervise_gang_kills_wedged_survivor(tmp_path, capsys):
    """A rank that never exits on its own (parked in a collective) is
    killed when a peer exits 87, and the gang restart completes — the
    whole point of group supervision: no rank is ever waited on
    forever."""
    from eadgan_tpu.cli import supervise

    script = _write_gang_stub(tmp_path)
    t0 = time.monotonic()
    supervise.main(
        ["--ranks", "2", "--max_restarts", "1", script,
         "--", "--state_dir", str(tmp_path), "--mode", "peer_hangs"]
    )
    # far below the hung rank's 3600 s sleep: SIGTERM did the job
    assert time.monotonic() - t0 < 60
    out = capsys.readouterr().out
    assert "finished cleanly after 1 restart(s)" in out


def test_supervise_gang_propagates_real_errors(tmp_path):
    """A non-stall failure (rc != 87) without --restart_on_error kills
    the gang and propagates the code instead of restarting."""
    script = tmp_path / "boom.py"
    script.write_text(
        textwrap.dedent(
            """
            import os, sys, time
            if os.environ["EADGAN_MP_PROCESS_ID"] == "0":
                sys.exit(3)
            time.sleep(3600)
            """
        )
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = os.environ.get("PYTHONPATH", "")
    env = dict(
        os.environ, PYTHONPATH=os.pathsep.join(filter(None, [repo, extra]))
    )
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "-m", "eadgan_tpu.cli.supervise",
         "--ranks", "2", str(script)],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 3
    assert time.monotonic() - t0 < 60
    assert "giving up after exit 3" in proc.stdout


def test_initialize_env_fallback(monkeypatch):
    """parallel.initialize() fills omitted args from the EADGAN_MP_*
    env triple the gang supervisor injects."""
    import jax

    from eadgan_tpu.parallel import multihost

    captured = {}
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: captured.update(kw)
    )
    monkeypatch.setenv("EADGAN_MP_COORDINATOR", "localhost:5555")
    monkeypatch.setenv("EADGAN_MP_NUM_PROCESSES", "4")
    monkeypatch.setenv("EADGAN_MP_PROCESS_ID", "2")
    multihost.initialize()
    assert captured == {
        "coordinator_address": "localhost:5555",
        "num_processes": 4,
        "process_id": 2,
    }
    # explicit args still win over the environment
    captured.clear()
    multihost.initialize(process_id=0)
    assert captured["process_id"] == 0
    # num_processes <= 1 stays a hard no-op even with a coordinator env
    captured.clear()
    monkeypatch.setenv("EADGAN_MP_NUM_PROCESSES", "1")
    multihost.initialize()
    assert captured == {}


def test_supervise_sigterm_kills_gang(tmp_path):
    """SIGTERM to the supervisor takes the whole gang down with it —
    orphaned ranks would keep training and double-run against the next
    supervised launch."""
    script = tmp_path / "sleeper.py"
    script.write_text(
        textwrap.dedent(
            """
            import os, time
            rank = os.environ["EADGAN_MP_PROCESS_ID"]
            with open(os.path.join(%r, f"pid{rank}"), "w") as f:
                f.write(str(os.getpid()))
            time.sleep(3600)
            """
            % str(tmp_path)
        )
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = os.environ.get("PYTHONPATH", "")
    env = dict(
        os.environ, PYTHONPATH=os.pathsep.join(filter(None, [repo, extra]))
    )
    sup = subprocess.Popen(
        [sys.executable, "-m", "eadgan_tpu.cli.supervise",
         "--ranks", "2", str(script)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    deadline = time.monotonic() + 60
    pids = []
    while time.monotonic() < deadline and len(pids) < 2:
        pids = [
            int((tmp_path / f"pid{r}").read_text())
            for r in (0, 1)
            if (tmp_path / f"pid{r}").exists()
        ]
        time.sleep(0.1)
    assert len(pids) == 2, "gang never launched"
    sup.send_signal(subprocess.signal.SIGTERM)
    sup.wait(timeout=60)
    assert sup.returncode == 128 + subprocess.signal.SIGTERM
    # both ranks must be gone (SIGTERM path, well under the 3600 s sleep)
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        alive = []
        for pid in pids:
            try:
                os.kill(pid, 0)
                alive.append(pid)
            except ProcessLookupError:
                pass
        if not alive:
            break
        time.sleep(0.2)
    assert not alive, f"orphaned gang ranks survive the supervisor: {alive}"


def test_launch_gang_kills_partial_gang_on_spawn_failure(monkeypatch):
    """A Popen failure mid-gang (fork ENOMEM, a signal between spawns)
    must not orphan the ranks already launched — they would keep
    training and double-run against the next supervised launch."""
    import subprocess as sp

    from eadgan_tpu.cli import supervise

    launched = []
    real_popen = sp.Popen

    def flaky_popen(cmd, env=None, **kw):
        if len(launched) == 2:
            raise OSError("spawn failed (injected)")
        p = real_popen([sys.executable, "-c", "import time; time.sleep(3600)"])
        launched.append(p)
        return p

    monkeypatch.setattr(supervise.subprocess, "Popen", flaky_popen)
    with pytest.raises(OSError, match="injected"):
        supervise._launch_gang(["whatever"], ranks=4)
    assert len(launched) == 2
    for p in launched:
        assert _wait_for(lambda p=p: p.poll() is not None, timeout=15.0), (
            "orphaned rank survived the failed gang launch"
        )
