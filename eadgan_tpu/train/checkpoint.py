"""Checkpointing with actual resume (the reference only ever saves —
SURVEY.md section 5: no trainer has a load/resume path).

Two artifact kinds:

* **model files** following the reference filename contract
  (``generator_%d.pt``, ``encoder_%d.pt``, ``encoder_pxy_%d.pt``,
  ``encoder_pxy_color_%d.pt``, ``rpqmnxy_approximator.pt``,
  ``checkpoint_%d.tar`` — SURVEY.md 2.1), containing a single model's
  params+stats serialized with flax msgpack — consumed by the inference
  and eval entry points exactly where the reference loads state_dicts;
* **full train-state files** (``train_state_%d.ckpt``) carrying the
  entire pytree — params, all three Adam states, spectral-norm vectors,
  BatchNorm running stats, PRNG key, step — so training resumes
  bit-exactly mid-run.

Crash safety: writes are atomic (temp file + fsync + ``os.replace`` in
the same directory), because the stall watchdog hard-exits the process
at an arbitrary instant (``utils/watchdog.py``, ``os._exit(87)``) while
checkpoint serialization runs for seconds on the background EventWorker
— a kill landing mid-write must never leave a truncated file at the
final path that ``--resume auto`` would then select.  Restore is
belt-and-braces on top: :func:`restore_latest` falls back to the newest
*loadable* checkpoint when the newest file fails to deserialize
(pre-fix truncations, filesystem damage), so a supervised restart loop
(``cli/supervise.py``) can never wedge on a corrupt recovery point.
The reference's save path has neither property and no loader at all
(celebA/EAD-GAN_celebA.py:414-423 — plain ``torch.save``, save-only).
"""

from __future__ import annotations

import os
import re
import sys
from typing import Any, List, Optional, Tuple

from flax import serialization

__all__ = [
    "save_pytree",
    "restore_pytree",
    "save_model",
    "restore_model",
    "latest_step",
    "saved_steps",
    "restore_latest",
    "prune_saved",
    "save_train_state",
    "save_train_state_sync",
]


def _maybe_fault_kill_mid_write(path: str, data: bytes) -> None:
    """Fault-injection hook for the crash-recovery drill (alongside
    ``EADGAN_FAULT_HANG_STEP`` in the epoch engine): when
    ``EADGAN_FAULT_KILL_SAVE_STEP=N`` is set and a train-state file
    ``<stem>_M.ckpt`` with ``M >= N`` is being saved, write a *truncated*
    byte stream directly to the final path — reproducing what the legacy
    non-atomic writer left behind when the watchdog's ``os._exit(87)``
    landed mid-write — then hard-exit with the watchdog's stall code so
    ``cli.supervise`` relaunches.  The fault is one-shot like the hang
    fault: ``EADGAN_FAULT_KILL_SAVE_MARKER`` names a file created when it
    fires; a restart that finds it pre-existing skips the fault.
    Drill/test hook only; zero cost when the env var is unset.
    """
    step_env = os.environ.get("EADGAN_FAULT_KILL_SAVE_STEP", "")
    if not step_env:
        return
    m = re.search(r"_(\d+)\.ckpt$", path)
    if not m or int(m.group(1)) < int(step_env):
        return
    marker = os.environ.get("EADGAN_FAULT_KILL_SAVE_MARKER", "")
    if marker and os.path.exists(marker):
        return
    if marker:
        open(marker, "w").close()
    with open(path, "wb") as f:
        f.write(data[: max(1, len(data) // 2)])
        f.flush()
        os.fsync(f.fileno())
    print(
        f"fault injection: truncated mid-write of {path}, exiting 87",
        flush=True,
    )
    os._exit(87)  # == utils.watchdog.STALL_EXIT_CODE


def save_pytree(path: str, tree: Any) -> None:
    """Atomically serialize ``tree`` to ``path``.

    The bytes land in a same-directory temp file first, are fsynced, and
    only then renamed over the final path — readers (and ``--resume
    auto``) either see the previous complete file or the new complete
    file, never a truncation, no matter when the process dies.
    """
    directory = os.path.dirname(path) or "."
    os.makedirs(directory, exist_ok=True)
    data = serialization.to_bytes(tree)
    _maybe_fault_kill_mid_write(path, data)
    # Clean stale temp files for THIS final path first: the watchdog's
    # os._exit(87) skips ``finally``, so a stall-kill landing inside the
    # write loop below orphans a large ``<path>.tmp.<oldpid>`` that no
    # restarted life (new pid) would otherwise reuse or remove — and a
    # supervised run re-reaches the same step and re-saves the same
    # filename, so cleaning here bounds the litter to one tmp per path.
    for name in os.listdir(directory):
        if name.startswith(os.path.basename(path) + ".tmp."):
            try:
                os.unlink(os.path.join(directory, name))
            except OSError:
                pass
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    # fsync the directory so the rename itself survives power loss; not
    # load-bearing for the watchdog-kill case (the kernel survives), so
    # failures (e.g. filesystems without dir fds) are non-fatal.
    try:
        dfd = os.open(directory, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass


def restore_pytree(path: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (same pytree shape the
    saving code used)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_model(path: str, model_vars) -> None:
    """Save one model's {params, stats} under the reference's filename."""
    save_pytree(path, {"params": model_vars.params, "stats": model_vars.stats})


def restore_model(path: str, model_vars):
    """Restore into a ModelVars template (from ``init``)."""
    restored = restore_pytree(path, {"params": model_vars.params, "stats": model_vars.stats})
    return model_vars.replace(params=restored["params"], stats=restored["stats"])


def saved_steps(directory: str, prefix: str, suffix: str = ".ckpt") -> List[int]:
    """All saved steps for ``prefix_%d%suffix`` files, newest first."""
    steps = []
    if os.path.isdir(directory):
        for name in os.listdir(directory):
            if name.startswith(prefix + "_") and name.endswith(suffix):
                middle = name[len(prefix) + 1 : -len(suffix)]
                if middle.isdigit():
                    steps.append(int(middle))
    return sorted(steps, reverse=True)


def latest_step(directory: str, prefix: str, suffix: str = ".ckpt") -> int:
    """Find the newest saved step for ``prefix_%d%suffix`` files; -1 if none."""
    steps = saved_steps(directory, prefix, suffix)
    return steps[0] if steps else -1


def prune_saved(
    directory: str,
    prefix: str,
    keep: int,
    suffix: str = ".ckpt",
    current_step: Optional[int] = None,
) -> List[str]:
    """Delete all but the ``keep`` newest ``prefix_%d%suffix`` files.

    Retention for long supervised runs: a 600k-step CelebA schedule
    writes ten ~500 MiB ``celeba_train_state_%d.ckpt`` files at the
    default cadence and the 800k burn-in wrote more — without pruning,
    disk grows without bound (the reference never hits this because it
    has no train-state files at all; its ``checkpoint_%d.tar`` model
    contract is NOT pruned here).  ``keep < 1`` is a no-op (keep
    everything, the parity-preserving default).  Keep at least 2 so
    :func:`restore_latest` retains a fallback when the newest file is
    damaged.  Returns the removed paths (for logging/tests).  Missing
    files are tolerated (another life of a supervised gang may prune
    concurrently).

    ``current_step`` (what :func:`save_train_state` passes) anchors
    "newest" to the step just written, NOT to the largest number on
    disk: after a corrupt-newest fallback resume, a stale higher-step
    file from the abandoned timeline is garbage — ranked naively it
    would permanently occupy a retention slot and, at ``keep=1``, cause
    every just-written lower-step checkpoint to be deleted on the spot.
    With an anchor, files above ``current_step`` are pruned FIRST and
    the retained set is the ``keep`` newest at or below it.  Dead-pid
    ``*.tmp.*`` orphans for this prefix (a kill skipped ``finally``
    during a write, and the step was never re-reached) are swept in the
    same pass."""
    if keep < 1:
        return []
    steps = saved_steps(directory, prefix, suffix)
    if current_step is not None:
        retained = [s for s in steps if s <= current_step][:keep]
    else:
        retained = steps[:keep]
    removed = []
    for step in steps:
        if step in retained:
            continue
        path = os.path.join(directory, f"{prefix}_{step}{suffix}")
        try:
            os.unlink(path)
            removed.append(path)
        except OSError:
            pass
    # Orphan temp sweep: <prefix>_N<suffix>.tmp.<pid> whose pid is gone.
    pat = re.compile(
        re.escape(prefix) + r"_\d+" + re.escape(suffix) + r"\.tmp\.(\d+)$"
    )
    for name in os.listdir(directory) if os.path.isdir(directory) else []:
        m = pat.match(name)
        if not m:
            continue
        pid = int(m.group(1))
        try:
            os.kill(pid, 0)  # raises if the writer no longer exists
            continue  # a live process owns it — leave it alone
        except ProcessLookupError:
            pass
        except OSError:
            continue  # e.g. EPERM: some live process has that pid
        try:
            os.unlink(os.path.join(directory, name))
            removed.append(os.path.join(directory, name))
        except OSError:
            pass
    return removed


def save_train_state(
    ckpt_dir: str, stem: str, step: int, state: Any, keep: int = 0
) -> str:
    """Save the full train state as ``<stem>_<step>.ckpt`` (atomically,
    :func:`save_pytree`) and apply the ``keep``-newest retention policy
    (:func:`prune_saved`; ``keep=0`` keeps everything).  The trainers'
    ``--keep_states`` flag routes here."""
    path = os.path.join(ckpt_dir, f"{stem}_{step}.ckpt")
    save_pytree(path, state)
    prune_saved(ckpt_dir, stem, keep, current_step=step)
    return path


def save_train_state_sync(
    ckpt_dir: str, stem: str, step: int, state: Any, keep: int = 0
) -> str:
    """Multi-process-safe :func:`save_train_state`: EVERY process must
    call it (it is a collective when ``jax.process_count() > 1``).

    Leaves sharded across processes (ZeRO-1 moments, parallel/zero.py)
    are assembled with a symmetric ``process_allgather`` and the write
    happens on the coordinator behind a barrier that keeps the other
    ranks alive until the file is complete
    (``parallel.save_on_coordinator``).  This is what a graceful-
    preemption ``on_shutdown`` callback should use: the engine fires it
    on every rank (train/engine.py's multi-process stop contract), so
    the collective is dispatched symmetrically.  Single-process it is
    identical to :func:`save_train_state`.  Cadence saves issued from
    ``on_batch`` must keep using :func:`save_train_state` instead — the
    engine no-ops ``on_batch`` on non-coordinator ranks, so a
    collective there would deadlock."""
    import jax

    if jax.process_count() <= 1:
        return save_train_state(ckpt_dir, stem, step, state, keep=keep)
    from eadgan_tpu.parallel import is_coordinator, save_on_coordinator

    path = os.path.join(ckpt_dir, f"{stem}_{step}.ckpt")
    save_on_coordinator(path, state)
    if is_coordinator():
        prune_saved(ckpt_dir, stem, keep, current_step=step)
    return path


def restore_latest(
    directory: str, prefix: str, template: Any, suffix: str = ".ckpt"
) -> Tuple[Any, int]:
    """Restore the newest *loadable* ``prefix_%d%suffix`` checkpoint.

    Files that fail to deserialize — e.g. truncated by a crash that
    predates the atomic writer, or damaged on disk — are skipped with a
    warning and the next-newest is tried, so a supervised restart never
    crash-loops on a corrupt newest file.  Returns ``(state, step)``;
    ``(template, -1)`` when no loadable checkpoint exists.
    """
    for step in saved_steps(directory, prefix, suffix):
        path = os.path.join(directory, f"{prefix}_{step}{suffix}")
        try:
            return restore_pytree(path, template), step
        except Exception as exc:  # noqa: BLE001 — any deserialization failure
            print(
                f"warning: checkpoint {path} failed to load ({exc!r}); "
                "falling back to the previous checkpoint",
                file=sys.stderr,
                flush=True,
            )
    return template, -1
