"""Shared CLI plumbing: argparse defaults, epoch engine, model apply
wrappers."""

from __future__ import annotations

import argparse
import os
from typing import Callable, Iterable, Optional

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
if os.environ.get("EADGAN_PLATFORM", "tpu") != "cpu":
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("EADGAN_COMPILE_CACHE", "/tmp/eadgan_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

import numpy as np

from eadgan_tpu.data import Prefetcher, epoch_batches
from eadgan_tpu.utils import MetricLogger

__all__ = [
    "add_adam_args",
    "add_run_args",
    "maybe_resume",
    "run_epochs",
    "jit_generator_apply",
]


def maybe_resume(state, resume: str, ckpt_dir: str, stem: str):
    """Handle --resume: a path restores that train state; the literal
    ``auto`` restores the newest ``<stem>_%d.ckpt`` in ckpt_dir (no-op
    when none exist) — crash recovery without bookkeeping."""
    from eadgan_tpu.train.checkpoint import latest_step, restore_pytree
    import os

    if not resume:
        return state
    if resume != "auto":
        return restore_pytree(resume, state)
    step = latest_step(ckpt_dir, stem)
    if step < 0:
        print(f"--resume auto: no {stem}_*.ckpt in {ckpt_dir}, starting fresh")
        return state
    path = os.path.join(ckpt_dir, f"{stem}_{step}.ckpt")
    print(f"--resume auto: restoring {path}")
    return restore_pytree(path, state)


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
        "--data_parallel",
        action="store_true",
        help="shard batches over all local devices (params replicated; "
        "XLA SPMD inserts the psum gradient reductions)",
    )


def run_epochs(
    *,
    n_epochs: int,
    data: np.ndarray,
    labels: Optional[np.ndarray],
    batch_size: int,
    state,
    step_fn: Callable,
    on_batch: Callable,
    seed: int = 0,
    max_steps: int = 0,
    logger: Optional[MetricLogger] = None,
    metric_keys: Optional[Iterable[str]] = None,
    scale: float = 1.0,
    shift: float = 0.0,
    random_flip: bool = False,
    data_parallel: bool = False,
    profile_dir: str = "",
):
    """The reference's epoch/batch double loop with device prefetching.

    ``on_batch(batches_done, state, metrics, batch)`` handles sampling /
    checkpoint side effects; ``step_fn(state, *batch) -> (state, metrics)``.

    uint8 ``data`` stays uint8 in host RAM; per-batch gather + float
    conversion + ``* scale + shift`` normalization run fused in the
    native batcher (eadgan_tpu/data/native.py) inside the prefetch
    thread — the full-dataset float copy (12 GB for dSprites) is never
    materialized.
    """
    from eadgan_tpu.utils import trace

    try:
        with trace(profile_dir or None):
            return _run_epochs_inner(
                n_epochs=n_epochs, data=data, labels=labels, batch_size=batch_size,
                state=state, step_fn=step_fn, on_batch=on_batch, seed=seed,
                max_steps=max_steps, logger=logger, metric_keys=metric_keys,
                scale=scale, shift=shift, random_flip=random_flip,
                data_parallel=data_parallel,
            )
    finally:
        if logger is not None:
            logger.close()  # flush buffered JSONL records


def _run_epochs_inner(
    *, n_epochs, data, labels, batch_size, state, step_fn, on_batch,
    seed, max_steps, logger, metric_keys, scale, shift, random_flip,
    data_parallel,
):
    host_rng = np.random.default_rng(seed)
    # Dedicated stream for per-batch flip draws: ``place`` runs in the
    # prefetch thread, so it must not share ``host_rng`` with the
    # epoch-permutation draws on the main thread.
    flip_rng = np.random.default_rng([seed, 0x464C4950])
    n_batches = data.shape[0] // batch_size
    start_step = int(jax.device_get(state.step))
    batches_done = start_step

    device_put = jax.device_put
    if data_parallel:
        from eadgan_tpu.parallel import default_mesh, replicate, shard_batch

        mesh = default_mesh()
        state = replicate(mesh, state)
        device_put = lambda b: shard_batch(mesh, b)  # noqa: E731

    use_native = data.dtype == np.uint8 and labels is None
    if random_flip and not use_native:
        raise ValueError("random_flip requires the uint8 label-free ingest path")
    if use_native:
        from eadgan_tpu.data.native import gather_normalize, gather_normalize_flip

        if random_flip:

            def place(idx):
                # re-drawn every batch fetch (reference torchvision
                # RandomHorizontalFlip, celebA/EAD-GAN_celebA.py:199)
                mask = flip_rng.random(len(idx)) < 0.5
                return device_put(
                    gather_normalize_flip(data, idx, mask, scale, shift)
                )

        else:

            def place(idx):
                return device_put(gather_normalize(data, idx, scale, shift))

    for epoch in range(start_step // max(n_batches, 1), n_epochs):
        if use_native:
            perm = host_rng.permutation(data.shape[0])
            end = data.shape[0] - (data.shape[0] % batch_size)
            batches = (perm[s : s + batch_size] for s in range(0, end, batch_size))
            iterator = Prefetcher(batches, place=place)
        else:
            iterator = Prefetcher(
                epoch_batches(data, batch_size, host_rng, labels=labels),
                place=device_put,
            )
        try:
            for batch in iterator:
                if not isinstance(batch, tuple):
                    batch = (batch,)
                state, metrics = step_fn(state, *batch)
                if logger is not None:
                    shown = (
                        {k: metrics[k] for k in metric_keys} if metric_keys else metrics
                    )
                    logger.log(
                        batches_done,
                        shown,
                        epoch=epoch,
                        n_epochs=n_epochs,
                        batch=batches_done % n_batches,
                        n_batches=n_batches,
                    )
                on_batch(batches_done, state, metrics, batch)
                batches_done += 1
                if max_steps and batches_done - start_step >= max_steps:
                    return state
        finally:
            iterator.close()
    return state


def jit_generator_apply(model, get_vars: Callable):
    """Jitted generator forward for sampling; ``get_vars()`` returns the
    current ModelVars so samples always reflect the latest params."""

    @jax.jit
    def fwd(variables, *inputs):
        out, _ = model.apply(variables, *inputs, mutable=["batch_stats"])
        return out

    def apply(*inputs):
        mv = get_vars()
        return np.asarray(fwd(mv.as_variables(), *[np.asarray(x) for x in inputs]))

    return apply
