"""Graceful preemption shutdown (utils/preempt.py + the engines'
stop_event/on_shutdown contract + the trainer CLI wiring).

Cloud TPU preemption delivers SIGTERM with a short grace window; the
reference loses everything since the last manual save and could not
resume even that (SURVEY.md section 5).  Here SIGTERM must finish the
in-flight window, write ONE final atomic train-state checkpoint at the
exact current step, and exit with PREEMPT_EXIT_CODE (86) so
``--resume auto`` continues with zero lost steps.  The real-chip drill
lives in evidence/drill_r5_preempt/; the multi-process gang drill in
evidence/drill_r5_gang_preempt/ (MULTIHOST_GANG_PREEMPT.json).
"""

import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import struct

from eadgan_tpu.train.engine import run_epochs
from eadgan_tpu.utils.preempt import PREEMPT_EXIT_CODE, PreemptionGuard

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _restore_sigterm():
    """Guard installs a process-wide SIGTERM handler; never leak it into
    the rest of the pytest run (same discipline as test_watchdog)."""
    before = signal.getsignal(signal.SIGTERM)
    yield
    signal.signal(signal.SIGTERM, before)


# ---------------------------------------------------------------- guard


def test_guard_sets_event_on_sigterm_and_uninstalls(capfd):
    # capfd, not capsys: the handler writes with async-signal-safe
    # os.write(2, ...) — a raw fd write that bypasses sys.stderr (a
    # print() there can hit CPython's reentrant-BufferedWriter error
    # when the signal interrupts another stderr write, ADVICE r4)
    guard = PreemptionGuard().install()
    assert not guard.requested.is_set()
    os.kill(os.getpid(), signal.SIGTERM)
    # CPython delivers between bytecodes; give it one
    deadline = time.monotonic() + 5
    while not guard.requested.is_set() and time.monotonic() < deadline:
        time.sleep(0.01)
    assert guard.requested.is_set()
    assert "preemption: caught signal" in capfd.readouterr().err
    guard.uninstall()
    assert guard._installed == {}


def test_guard_install_is_idempotent_and_restores_original():
    before = signal.getsignal(signal.SIGTERM)
    guard = PreemptionGuard().install().install()
    guard.uninstall()
    assert signal.getsignal(signal.SIGTERM) is before


def test_second_sigterm_escalates_to_immediate_death(tmp_path):
    """The escalation path: one SIGTERM sets the flag, a second restores
    SIG_DFL and re-delivers — the process dies by signal instead of
    finishing its save (operators and kill ladders are never held
    hostage by a slow final write)."""
    script = tmp_path / "hostage.py"
    script.write_text(
        textwrap.dedent(
            """
            import os, sys, time
            from eadgan_tpu.utils.preempt import PreemptionGuard
            g = PreemptionGuard().install()
            print("armed", flush=True)
            while True:
                time.sleep(0.05)
                if g.requested.is_set():
                    print("flagged", flush=True)  # keeps looping: a "slow save"
            """
        )
    )
    env = dict(
        os.environ,
        PYTHONPATH=os.pathsep.join(
            filter(None, [REPO, os.environ.get("PYTHONPATH", "")])
        ),
    )
    proc = subprocess.Popen(
        [sys.executable, str(script)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        assert "armed" in proc.stdout.readline()
        proc.send_signal(signal.SIGTERM)
        assert "flagged" in proc.stdout.readline()  # first: flag only
        proc.send_signal(signal.SIGTERM)  # second: immediate death
        proc.wait(timeout=30)
        assert proc.returncode == -signal.SIGTERM
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


# ------------------------------------------------- engine stop contract
#
# A toy one-parameter train state drives the REAL engines (both the
# per-dispatch and the lax.scan chained path) without any conv compiles,
# so these stay in the fast tier.


class ToyState(struct.PyTreeNode):
    w: jnp.ndarray
    step: jnp.ndarray


def _toy_setup():
    state = ToyState(w=jnp.zeros((4,)), step=jnp.zeros((), jnp.int32))

    def step_body(state, batch):
        new = state.replace(
            w=state.w + jnp.mean(batch), step=state.step + 1
        )
        return new, {"loss": jnp.mean(batch)}

    data = np.arange(64 * 4, dtype=np.float32).reshape(64, 4)
    return state, step_body, data


@pytest.mark.parametrize("chain", [1, 4])
def test_engine_stops_at_boundary_and_fires_on_shutdown(chain, monkeypatch):
    """stop_event set mid-run -> the engine finishes the in-flight
    dispatch, returns at that boundary, and on_shutdown fires exactly
    once with the state's own step counter."""
    import threading

    # on_batch sets the stop flag; run events inline so the trigger step
    # is deterministic (the async EventWorker would race the window loop)
    monkeypatch.setenv("EADGAN_SYNC_EVENTS", "1")
    state, step_body, data = _toy_setup()
    stop = threading.Event()
    seen, shutdowns = [], []

    def on_batch(batches_done, state, metrics, batch):
        seen.append(batches_done)
        if batches_done >= 5:
            stop.set()  # what the SIGTERM handler does, mid-run

    out = run_epochs(
        n_epochs=4,
        data=data,
        labels=None,
        batch_size=8,
        state=state,
        step_fn=jax.jit(step_body),
        on_batch=on_batch,
        chain=chain,
        chain_periods=(2,) if chain > 1 else (),
        step_body=step_body if chain > 1 else None,
        stop_event=stop,
        on_shutdown=lambda s, st: shutdowns.append((s, st)),
    )
    final = int(jax.device_get(out.step))
    assert shutdowns, "on_shutdown never fired"
    assert len(shutdowns) == 1
    s, st = shutdowns[0]
    assert s == final == int(jax.device_get(st.step))
    # stopped early (4 epochs x 8 batches = 32 steps available), at or
    # just past the trigger (the in-flight window finishes first)
    assert 6 <= final <= 6 + chain
    # the last on_batch event the engine delivered was <= the boundary
    assert max(seen) <= final - 1


def test_engine_without_stop_event_runs_full_schedule():
    state, step_body, data = _toy_setup()
    shutdowns = []
    out = run_epochs(
        n_epochs=2,
        data=data,
        labels=None,
        batch_size=8,
        state=state,
        step_fn=jax.jit(step_body),
        on_batch=lambda *a: None,
        stop_event=None,
        on_shutdown=lambda s, st: shutdowns.append(s),
    )
    assert int(jax.device_get(out.step)) == 16
    assert not shutdowns  # never preempted -> never called


def test_engine_stop_event_already_set_saves_after_first_dispatch():
    """A signal landing before the loop starts still trains one dispatch
    (the event is observed at the first boundary) and saves — never an
    empty/unsaved exit."""
    import threading

    state, step_body, data = _toy_setup()
    stop = threading.Event()
    stop.set()
    shutdowns = []
    out = run_epochs(
        n_epochs=2,
        data=data,
        labels=None,
        batch_size=8,
        state=state,
        step_fn=jax.jit(step_body),
        on_batch=lambda *a: None,
        stop_event=stop,
        on_shutdown=lambda s, st: shutdowns.append(s),
    )
    assert shutdowns == [int(jax.device_get(out.step))]
    assert int(jax.device_get(out.step)) >= 1


# ----------------------------------------------- cut_short verdict


@pytest.mark.parametrize("chain", [1, 4])
def test_cut_short_true_when_stop_loses_work(chain, monkeypatch):
    """A stop observed mid-schedule sets stop_event.cut_short=True —
    exit_if_preempted must exit 86 (work remains)."""
    import threading

    monkeypatch.setenv("EADGAN_SYNC_EVENTS", "1")
    state, step_body, data = _toy_setup()
    stop = threading.Event()

    def on_batch(batches_done, state, metrics, batch):
        if batches_done >= 2:
            stop.set()

    run_epochs(
        n_epochs=4, data=data, labels=None, batch_size=8, state=state,
        step_fn=jax.jit(step_body), on_batch=on_batch, chain=chain,
        chain_periods=(1,) if chain > 1 else (),
        step_body=step_body if chain > 1 else None,
        stop_event=stop, on_shutdown=lambda s, st: None,
    )
    assert stop.cut_short is True


@pytest.mark.parametrize("chain", [1, 4])
def test_cut_short_false_when_schedule_completed(chain, monkeypatch):
    """A SIGTERM landing during the FINAL dispatch must not condemn the
    run: the schedule finished, cut_short=False, and exit_if_preempted
    exits 0 — otherwise cli.supervise --restart_on_error would relaunch
    a finished run and (--max_steps being incremental) train N
    unrequested extra steps (ADVICE r4)."""
    import threading

    monkeypatch.setenv("EADGAN_SYNC_EVENTS", "1")
    state, step_body, data = _toy_setup()
    stop = threading.Event()
    max_steps = 6

    def on_batch(batches_done, state, metrics, batch):
        if batches_done >= max_steps - 1:
            stop.set()  # lands on the final step of the schedule

    out = run_epochs(
        n_epochs=4, data=data, labels=None, batch_size=8, state=state,
        step_fn=jax.jit(step_body), on_batch=on_batch, chain=chain,
        chain_periods=(1,) if chain > 1 else (),
        step_body=step_body if chain > 1 else None,
        max_steps=max_steps,
        stop_event=stop, on_shutdown=lambda s, st: None,
    )
    assert int(jax.device_get(out.step)) == max_steps
    assert stop.cut_short is False


def test_exit_if_preempted_gates_on_cut_short(capsys):
    from eadgan_tpu.cli.common import exit_if_preempted

    # flag never set: plain return
    exit_if_preempted(PreemptionGuard())

    # cut short mid-schedule: exit 86
    guard = PreemptionGuard()
    guard.requested.set()
    guard.requested.cut_short = True
    with pytest.raises(SystemExit) as e:
        exit_if_preempted(guard)
    assert e.value.code == PREEMPT_EXIT_CODE

    # signal landed on the final step: schedule complete, exit 0
    guard2 = PreemptionGuard()
    guard2.requested.set()
    guard2.requested.cut_short = False
    exit_if_preempted(guard2)  # returns instead of raising
    assert "COMPLETE" in capsys.readouterr().out

    # attribute absent = the engine never observed the stop (the signal
    # landed after run_epochs returned, schedule done): exit 0
    guard3 = PreemptionGuard()
    guard3.requested.set()
    exit_if_preempted(guard3)


def test_save_train_state_sync_single_process_identical(tmp_path):
    """save_train_state_sync (what on_shutdown uses — collective-safe
    in gangs) degenerates to the plain saver single-process."""
    from eadgan_tpu.train.checkpoint import (
        restore_pytree,
        save_train_state_sync,
        saved_steps,
    )

    state = ToyState(w=jnp.arange(4.0), step=jnp.asarray(7, jnp.int32))
    path = save_train_state_sync(str(tmp_path), "toy_train_state", 7, state)
    assert os.path.basename(path) == "toy_train_state_7.ckpt"
    assert saved_steps(str(tmp_path), "toy_train_state") == [7]
    back = restore_pytree(path, ToyState(w=jnp.zeros(4), step=jnp.zeros((), jnp.int32)))
    np.testing.assert_array_equal(np.asarray(back.w), np.arange(4.0))


# --------------------------------------------- end-to-end CLI semantics
#
# A stub trainer built from the REAL parts (PreemptionGuard +
# run_epochs + save_train_state + restore_latest) proves the full
# SIGTERM -> finish window -> atomic save -> exit 86 -> --resume auto
# chain in a subprocess, without a GAN compile.  The real-trainer drill
# on the TPU chip is evidence/drill_r5_preempt/.

STUB = textwrap.dedent(
    """
    import argparse, os, sys
    import jax, jax.numpy as jnp, numpy as np
    from flax import struct
    jax.config.update("jax_platforms", "cpu")

    from eadgan_tpu.cli.common import exit_if_preempted, maybe_resume, setup_preemption
    from eadgan_tpu.train.engine import run_epochs
    from eadgan_tpu.train.checkpoint import save_train_state

    class ToyState(struct.PyTreeNode):
        w: jnp.ndarray
        step: jnp.ndarray

    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--resume", default="")
    p.add_argument("--max_steps", type=int, default=0)
    p.add_argument("--preempt_save", default="on")
    p.add_argument("--keep_states", type=int, default=0)
    opt = p.parse_args()

    state = ToyState(w=jnp.zeros((4,)), step=jnp.zeros((), jnp.int32))
    state = maybe_resume(state, opt.resume, opt.ckpt_dir, "toy_train_state")

    def step_body(state, batch):
        return state.replace(
            w=state.w + jnp.mean(batch), step=state.step + 1
        ), {"loss": jnp.mean(batch)}

    def on_batch(batches_done, state, metrics, batch):
        import time
        time.sleep(0.01)  # pace the run so the signal lands mid-schedule
        if batches_done % 50 == 0:
            save_train_state(opt.ckpt_dir, "toy_train_state", batches_done,
                             state, keep=opt.keep_states)

    guard = setup_preemption(opt)
    data = np.arange(400 * 4, dtype=np.float32).reshape(400, 4)
    print("training", flush=True)
    out = run_epochs(
        n_epochs=1000000, data=data, labels=None, batch_size=8, state=state,
        step_fn=jax.jit(step_body), on_batch=on_batch, chain=4,
        chain_periods=(50,), step_body=step_body,
        max_steps=opt.max_steps,
        stop_event=guard.requested if guard else None,
        on_shutdown=lambda s, st: save_train_state(
            opt.ckpt_dir, "toy_train_state", s, st, keep=opt.keep_states),
    )
    exit_if_preempted(guard)
    print(f"finished at step {int(jax.device_get(out.step))}", flush=True)
    """
)


def test_cli_sigterm_saves_final_state_and_resumes(tmp_path):
    env = dict(
        os.environ,
        EADGAN_PLATFORM="cpu",
        PYTHONPATH=os.pathsep.join(
            filter(None, [REPO, os.environ.get("PYTHONPATH", "")])
        ),
    )
    script = tmp_path / "toy_trainer.py"
    script.write_text(STUB)

    proc = subprocess.Popen(
        [sys.executable, str(script), "--ckpt_dir", str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        assert "training" in proc.stdout.readline()
        time.sleep(1.5)  # mid-schedule (~0.01 s/step pacing)
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == PREEMPT_EXIT_CODE, (out, err)
    assert "graceful shutdown: saving final train state at step" in out
    assert "preemption save complete" in out

    from eadgan_tpu.train.checkpoint import saved_steps

    steps = saved_steps(str(tmp_path), "toy_train_state")
    assert steps, "no checkpoint written"
    final = steps[0]
    assert final >= 1

    # life 2: --resume auto continues from the EXACT preempted step
    proc2 = subprocess.run(
        [sys.executable, str(script), "--ckpt_dir", str(tmp_path),
         "--resume", "auto", "--max_steps", "8"],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert proc2.returncode == 0, (proc2.stdout, proc2.stderr)
    assert f"finished at step {final + 8}" in proc2.stdout


def test_preempt_save_off_restores_default_disposition(tmp_path):
    env = dict(
        os.environ,
        EADGAN_PLATFORM="cpu",
        PYTHONPATH=os.pathsep.join(
            filter(None, [REPO, os.environ.get("PYTHONPATH", "")])
        ),
    )
    script = tmp_path / "toy_trainer.py"
    script.write_text(STUB)
    proc = subprocess.Popen(
        [sys.executable, str(script), "--ckpt_dir", str(tmp_path),
         "--preempt_save", "off"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        assert "training" in proc.stdout.readline()
        time.sleep(0.5)
        proc.send_signal(signal.SIGTERM)
        proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == -signal.SIGTERM  # died raw, no save
    from eadgan_tpu.train.checkpoint import saved_steps

    # only cadence saves (possibly step 0) may exist; no final boundary
    # save beyond them is guaranteed — the key claim is the exit mode
    assert proc.returncode != PREEMPT_EXIT_CODE
