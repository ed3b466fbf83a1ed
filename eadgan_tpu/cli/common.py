"""Shared CLI plumbing: argparse defaults, resume handling, platform /
compile-cache setup.

The training engines themselves live in ``eadgan_tpu/train/engine.py``
(the documented library API); this module re-exports ``run_epochs`` and
``jit_generator_apply`` for the CLI entry points and keeps only the
process-level concerns a CLI owns: the EADGAN_PLATFORM escape hatch,
the persistent compile cache, flag definitions, and ``--resume``."""

from __future__ import annotations

import argparse
import os

import jax

# Honor EADGAN_PLATFORM=cpu|tpu before any backend initializes — the
# container's sitecustomize pins JAX_PLATFORMS, so tests and smoke runs
# need an in-process escape hatch.
if os.environ.get("EADGAN_PLATFORM"):
    try:
        jax.config.update("jax_platforms", os.environ["EADGAN_PLATFORM"])
    except Exception:
        pass

# Persistent compile cache: full-train-step compiles cost 30s-7min
# through the remote-compile tunnel; cache them across CLI invocations
# (same mechanism bench.py uses).  Accelerator platforms only — CPU
# AOT cache entries reload with machine-feature mismatch warnings and
# a documented SIGILL risk, for compiles that are cheap anyway.
def _cpu_forced() -> bool:
    """True when this process will run on CPU — either via the env escape
    hatch or an in-process jax.config override (pytest's conftest forces
    CPU that way and still imports this module)."""
    if os.environ.get("EADGAN_PLATFORM") == "cpu":
        return True
    try:
        return jax.config.jax_platforms == "cpu"
    except Exception:
        return False


if not _cpu_forced():
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("EADGAN_COMPILE_CACHE", "/tmp/eadgan_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

# Re-exported engine entry points (the platform/cache setup above must
# run BEFORE this import pulls in jax-using modules).
from eadgan_tpu.train.engine import jit_generator_apply, run_epochs  # noqa: E402,F401

__all__ = [
    "add_adam_args",
    "add_run_args",
    "init_multiprocess",
    "maybe_resume",
    "run_epochs",
    "jit_generator_apply",
    "setup_preemption",
    "exit_if_preempted",
]


def init_multiprocess(opt) -> None:
    """Join a multi-process gang when one is configured; no-op otherwise.

    ``cli.supervise --ranks N <trainer>`` injects the ``EADGAN_MP_*``
    rank triple (and a cluster scheduler can set the standard
    coordinator env instead) — ``parallel.initialize()`` reads either
    and wires ``jax.distributed``, after which the trainer's mesh spans
    every process's devices, batches placed by ``shard_batch`` /
    ``shard_window`` are global (each process contributes its
    addressable slice of the identical host batch — all ranks compute
    the same batches from the same ``--seed``), side effects run on the
    coordinator only (the engine gates ``on_batch``/logging), the
    graceful-preemption stop is gang-synchronized, and the final save
    is collective (train/engine.py multi-process stop contract).
    Drilled end-to-end: MULTIHOST_CLI.json.

    Two configurations are rejected loudly rather than misbehaving:

    * multi-process without ``--data_parallel`` — each rank would train
      an INDEPENDENT copy on its local devices while sharing checkpoint
      paths;
    * ``--zero_opt`` — the CLI's cadence checkpoints run coordinator-
      only (engine ``on_batch`` gating), and cross-process-sharded Adam
      moments are not addressable from one process; the library loop
      pattern (tools/multiprocess_drive.py --gang_worker: every rank
      calls ``parallel.save_on_coordinator``) covers that topology.
    """
    from eadgan_tpu.parallel import initialize

    initialize()
    import jax

    if jax.process_count() <= 1:
        return
    if not getattr(opt, "data_parallel", False):
        raise SystemExit(
            "multi-process run detected (jax.process_count() > 1): pass "
            "--data_parallel so ranks join one global mesh — without it "
            "every rank would train an independent model against the "
            "same checkpoint paths"
        )
    if getattr(opt, "zero_opt", False):
        raise SystemExit(
            "--zero_opt is not supported in multi-process CLI runs: "
            "cadence checkpoints write from the coordinator only, and "
            "cross-process ZeRO moment shards are not addressable from "
            "one process. Use the library loop pattern instead "
            "(tools/multiprocess_drive.py --gang_worker routes every "
            "save through parallel.save_on_coordinator)"
        )


def setup_preemption(opt):
    """Arm the graceful-preemption SIGTERM handler for a trainer CLI
    (``--preempt_save on``, the default).  Returns the guard, or None
    when disabled — pass ``stop_event=guard.requested if guard else
    None`` into :func:`run_epochs` together with an ``on_shutdown``
    final-save callback, and call :func:`exit_if_preempted` after the
    run (utils/preempt.py has the full design)."""
    if getattr(opt, "preempt_save", "on") != "on":
        return None
    from eadgan_tpu.utils.preempt import PreemptionGuard

    return PreemptionGuard().install()


def exit_if_preempted(guard) -> None:
    """After :func:`run_epochs` returns: if the run stopped on a
    preemption signal AND the schedule was actually cut short, exit
    with the distinct PREEMPT_EXIT_CODE (86) — exiting 0 would lie to
    supervisors and shell scripts; 87 would mean "relaunch me" to
    cli.supervise.

    The cut-short verdict comes from ``run_epochs`` (it sets
    ``stop_event.cut_short``): a SIGTERM that lands on the final step —
    or after the schedule already completed, in which case the engine
    never observed it and the attribute is absent — exits 0, so
    ``cli.supervise --restart_on_error`` does not relaunch a FINISHED
    run and train unrequested extra steps (the trainers' ``--max_steps``
    counts incrementally from the restored step)."""
    if guard is None or not guard.requested.is_set():
        return
    import sys

    from eadgan_tpu.utils.preempt import PREEMPT_EXIT_CODE

    if not getattr(guard.requested, "cut_short", False):
        print(
            "preemption signal landed at/after schedule completion: the "
            "run is COMPLETE, exiting 0 (no restart needed)",
            flush=True,
        )
        return

    print(
        f"preemption save complete: exiting {PREEMPT_EXIT_CODE} "
        "(continue later with --resume auto)",
        flush=True,
    )
    sys.exit(PREEMPT_EXIT_CODE)


def maybe_resume(state, resume: str, ckpt_dir: str, stem: str):
    """Handle --resume: a path restores that train state; the literal
    ``auto`` restores the newest *loadable* ``<stem>_%d.ckpt`` in
    ckpt_dir (no-op when none exist) — crash recovery without
    bookkeeping.  A newest file that fails to deserialize (truncated by
    a pre-atomic-writer crash, damaged on disk) is skipped with a
    warning rather than crashing the supervised restart loop
    (train/checkpoint.py::restore_latest)."""
    from eadgan_tpu.train.checkpoint import restore_latest, restore_pytree

    if not resume:
        return state
    if resume != "auto":
        return restore_pytree(resume, state)
    restored, step = restore_latest(ckpt_dir, stem, state)
    if step < 0:
        print(f"--resume auto: no loadable {stem}_*.ckpt in {ckpt_dir}, starting fresh")
        return state
    print(f"--resume auto: restoring {os.path.join(ckpt_dir, f'{stem}_{step}.ckpt')}")
    return restored


def resolve_compute_dtype(opt):
    """Resolve ``--compute`` to a model ``dtype``: ``jnp.bfloat16`` or
    ``None`` (full f32).  Unset, it defaults by backend — bf16 on TPU,
    f32 elsewhere — so production training runs the same bf16-compute +
    fast-warp configuration bench.py measures (the round-3 traced soak
    showed the f32+exact-warp CLI step at 19.25 ms vs the 16.4 ms
    benched step; the gap was this configuration, not engine overhead),
    while CPU test/golden runs stay exact.  Params are f32 either way
    (flax param_dtype default); BN statistics stay f32 inside the
    models.  bf16 also defaults the warp kernel to its fast MXU passes
    unless EADGAN_WARP_PRECISION is already set."""
    import jax
    import jax.numpy as jnp

    choice = opt.compute or (
        "bf16" if jax.default_backend() == "tpu" else "f32"
    )
    if choice == "bf16":
        os.environ.setdefault("EADGAN_WARP_PRECISION", "fast")
        return jnp.bfloat16
    return None


def add_adam_args(parser: argparse.ArgumentParser, lr: float) -> None:
    parser.add_argument("--lr", type=float, default=lr, help="adam: learning rate")
    parser.add_argument("--b1", type=float, default=0.5, help="adam: decay of first order momentum of gradient")
    parser.add_argument("--b2", type=float, default=0.999, help="adam: decay of first order momentum of gradient")


def add_run_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--n_cpu", type=int, default=8, help="number of cpu threads to use during batch generation")
    parser.add_argument("--data_dir", type=str, default=".", help="dataset directory")
    parser.add_argument("--out_dir", type=str, default="images", help="artifact directory")
    parser.add_argument("--ckpt_dir", type=str, default=".", help="checkpoint directory")
    parser.add_argument("--seed", type=int, default=0, help="PRNG seed")
    parser.add_argument("--max_steps", type=int, default=0, help="stop after N batches (0 = full schedule)")
    parser.add_argument("--jsonl", type=str, default="", help="metrics JSONL path")
    parser.add_argument("--resume", type=str, default="", help="train-state checkpoint to resume from")
    parser.add_argument("--profile_dir", type=str, default="", help="write a jax.profiler trace of the run here")
    parser.add_argument(
        "--no_download",
        action="store_true",
        help="never fetch missing dataset archives from the network",
    )
    parser.add_argument(
        "--compute",
        choices=["bf16", "f32"],
        default=None,
        help="model compute dtype (params always stay f32). Default: "
        "bf16 on TPU — bf16 MXU passes + the fast warp, the exact "
        "configuration bench.py measures — and f32 elsewhere (golden "
        "tests / CPU). 'f32' also selects the exact 'highest' warp. "
        "GAN trainers only: the pxy/approximator pretrainers always "
        "run f32 (their codes feed the exact 3x3 affine algebra, and "
        "bf16 code rounding would floor the aligner's convergence)",
    )
    parser.add_argument(
        "--chain",
        type=int,
        default=32,
        help="train steps fused into one device program per dispatch "
        "(lax.scan); amortizes the host<->device round trip. 1 = "
        "dispatch per step (debugging; --sample_interval 1 degenerates "
        "to the same)",
    )
    parser.add_argument(
        "--data_parallel",
        action="store_true",
        help="shard batches over all local devices (params replicated; "
        "XLA SPMD inserts the psum gradient reductions)",
    )
    parser.add_argument(
        "--zero_opt",
        action="store_true",
        help="with --data_parallel: shard the Adam moments over the "
        "data axis (ZeRO-1, parallel/zero.py) instead of replicating "
        "them — ~1/N the optimizer memory per device; params stay "
        "replicated. Requires the chained engine (--chain > 1)",
    )
    parser.add_argument(
        "--keep_states",
        type=int,
        default=0,
        help="retention for <stem>_train_state_*.ckpt files: keep only "
        "the N newest, pruning older ones after each save (0 = keep "
        "all). Use >= 2 so --resume auto retains a fallback when the "
        "newest file is damaged. Reference-contract model files "
        "(generator_*.pt, checkpoint_*.tar, ...) are never pruned",
    )
    parser.add_argument(
        "--preempt_save",
        choices=["on", "off"],
        default="on",
        help="graceful preemption shutdown: on SIGTERM (the Cloud TPU "
        "preemption/maintenance notice), finish the in-flight window, "
        "save a final train-state checkpoint at the exact current step, "
        "and exit 86 — --resume auto then continues with zero lost "
        "steps. A second SIGTERM terminates immediately (the atomic "
        "writer keeps that safe). 'off' restores the default "
        "die-on-SIGTERM disposition",
    )
    parser.add_argument(
        "--watchdog",
        type=float,
        default=0.0,
        help="stall watchdog: if no training progress for this many "
        "seconds (first window gets a compile allowance, see "
        "utils/watchdog.py), dump all thread stacks and exit 87 so "
        "cli.supervise can relaunch with --resume auto. 0 = off",
    )
