"""Training engines: the epoch/batch drivers every trainer (CLI or
custom loop) runs its jitted step under.

Two engines share one entry point, :func:`run_epochs` — the library-API
seam behind ``python -m eadgan_tpu.cli.<trainer>``:

* the **per-dispatch engine** (``chain=1``): one jitted step per device
  dispatch, host-side prefetching — the reference's epoch/batch double
  loop (e.g. /root/reference/dSprites/rp.py:362-509) with the per-step
  host matrix building moved in-graph;
* the **chained engine** (``chain>1`` + ``step_body``): up to K steps
  fused into ONE ``lax.scan`` program per dispatch (train/chain.py),
  amortizing the host<->device round trip that dominates through the
  remote-execution tunnel; event side effects (sample grids, checkpoint
  writes) run on a background EventWorker against a donation-safe
  device snapshot.

This module is pure library code — no argparse, no import-time platform
or compile-cache side effects (those live in ``cli/common.py``, which
re-exports :func:`run_epochs` for the CLI layer).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from eadgan_tpu.data import Prefetcher, epoch_batches
from eadgan_tpu.utils import MetricLogger

__all__ = ["run_epochs", "jit_generator_apply"]


class _GangStopView:
    """Synchronized view of a stop flag for multi-process runs.

    ``is_set()`` cross-process ORs the wrapped event's local flag
    (``parallel.any_process_flag`` — itself a collective, so every rank
    must call it at the same boundaries, which the engines guarantee by
    polling exactly once per dispatch).  When the gang agrees to stop,
    the LOCAL event is set on every rank too, so downstream local
    consumers (``cli.common.exit_if_preempted``) see one gang-wide
    decision — every rank saves and exits 86, not just the signaled
    ones."""

    def __init__(self, event):
        self._event = event

    def is_set(self) -> bool:
        from eadgan_tpu.parallel import any_process_flag

        if any_process_flag(self._event.is_set()):
            self._event.set()
            return True
        return False

    def set(self) -> None:
        self._event.set()


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
    zero_opt: bool = False,
    profile_dir: str = "",
    chain: int = 1,
    chain_periods: tuple = (),
    step_body: Optional[Callable] = None,
    watchdog: float = 0.0,
    stop_event=None,
    on_shutdown: Optional[Callable] = None,
):
    """The reference's epoch/batch double loop with device prefetching.

    ``on_batch(batches_done, state, metrics, batch)`` handles sampling /
    checkpoint side effects; ``step_fn(state, *batch) -> (state, metrics)``.

    uint8 ``data`` stays uint8 in host RAM; per-batch gather + float
    conversion + ``* scale + shift`` normalization run fused in the
    native batcher (eadgan_tpu/data/native.py) inside the prefetch
    thread — the full-dataset float copy (12 GB for dSprites) is never
    materialized.

    ``chain > 1`` (with ``step_body``, the un-jitted step) switches to
    the in-graph multi-step engine (train/chain.py): up to ``chain``
    steps run as ONE ``lax.scan`` program per dispatch, amortizing the
    host<->device round trip that otherwise dominates through the
    remote-execution tunnel.  ``chain_periods`` are the side-effect
    intervals of ``on_batch`` (sample / checkpoint); windows are clamped
    so those step indices land exactly at window ends, where the true
    post-step state exists — behavior is step-for-step identical to the
    per-dispatch engine (tests/test_chain.py pins it).

    ``stop_event`` (a ``threading.Event``) requests a graceful early
    stop: the engine finishes the in-flight dispatch — under chaining,
    the whole window INCLUDING its event side effects — then returns at
    that boundary instead of continuing the schedule.  ``on_shutdown
    (step, state)`` then fires exactly once per process (after every
    queued background event write has flushed, so a checkpoint it
    writes is always the newest on disk — retention pruning anchors on
    the newest written step).  The trainer CLIs wire ``stop_event`` to a
    SIGTERM flag and ``on_shutdown`` to a final atomic train-state save:
    graceful TPU-preemption shutdown with zero lost steps
    (utils/preempt.py).

    Multi-process stop contract (``jax.process_count() > 1``): the stop
    decision is SYNCHRONIZED — each boundary check cross-process ORs the
    local flags (``parallel.any_process_flag``), so a SIGTERM delivered
    to ANY subset of ranks stops every rank at the SAME window boundary
    (a rank stopping alone would park its peers in a step collective
    forever).  When the gang stops, the local ``stop_event`` is set on
    every rank (so ``exit_if_preempted`` exits 86 gang-wide) and
    ``on_shutdown`` fires on EVERY process, not just the coordinator —
    a final save must route through a symmetric collective writer
    (``checkpoint.save_train_state_sync`` / ``parallel.
    save_on_coordinator``: ZeRO-sharded moments need a cross-process
    allgather, and its barrier keeps non-writing ranks alive until the
    coordinator's write completes).  Coordinator-gated plain writes
    would either lose the sharded moment leaves or deadlock the
    barrier.

    After the run, ``stop_event.cut_short`` is set to whether the stop
    actually cut the schedule short (True) or the signal landed on the
    final step of an already-complete schedule (False) —
    ``cli.common.exit_if_preempted`` exits 86 only when work remains.
    """
    from eadgan_tpu.utils import trace

    # Configuration errors surface BEFORE any side-effectful setup
    # (watchdog thread, logger) so failing fast leaks no resources and
    # loses no buffered records.
    if zero_opt and not (data_parallel and chain > 1 and step_body is not None):
        raise ValueError(
            "--zero_opt shards optimizer state over the data mesh axis: "
            "it requires --data_parallel and the chained engine "
            "(--chain > 1)"
        )

    # Multi-process contract: side effects (sample grids, checkpoints,
    # log lines) run on the coordinator only — metrics are replicated
    # scalars, the train state is replicated, so every other process
    # would write byte-identical duplicates (parallel/multihost.py
    # is_coordinator docstring; exercised by tools/multiprocess_drive.py
    # --ckpt).  Trainers that must write from a callback in multi-process
    # runs should route through parallel.save_on_coordinator.
    from eadgan_tpu.parallel import is_coordinator

    owned_logger = logger  # close the caller's logger even when gated off
    if not is_coordinator():
        on_batch = lambda *a, **k: None  # noqa: E731
        logger = None
    elif jax.process_count() > 1:
        # Coordinator-only callbacks CANNOT dispatch programs over the
        # global mesh — the other processes never join, and the
        # dispatch parks forever (a trainer's sample callback jits the
        # generator forward on the train state).  Hand callbacks a HOST
        # materialization of the (replicated) state instead: their jits
        # then compile process-local over the coordinator's own
        # devices.  device_get reads the local replica — no collective.
        _user_on_batch = on_batch

        def on_batch(step, state, metrics, batch):  # noqa: F811
            _user_on_batch(step, jax.device_get(state), metrics, batch)

    # Schedule extent, for the cut_short verdict below: did a graceful
    # stop actually lose work, or did the signal land on a schedule that
    # finished anyway?  (state.step is still the host/pre-replication
    # value here — the engines replicate internally.)
    n_batches_sched = data.shape[0] // batch_size
    start_step_sched = int(jax.device_get(state.step))
    total_sched = n_epochs * n_batches_sched
    planned_end = (
        min(total_sched, start_step_sched + max_steps)
        if max_steps
        else total_sched
    )

    # Gang-synchronized stop: with >1 process the engines poll a view
    # whose is_set() cross-process ORs the local flags at each boundary
    # — one collective per window (per step on the per-dispatch engine),
    # dispatched in lockstep because every rank runs the identical
    # schedule.  See the docstring's multi-process stop contract.
    local_stop = stop_event
    if stop_event is not None and jax.process_count() > 1:
        stop_event = _GangStopView(local_stop)

    # Stall watchdog (``--watchdog N``): a heartbeat lands after every
    # completed dispatch below; a daemon thread hard-exits the process
    # with STALL_EXIT_CODE if none lands for ``watchdog`` seconds —
    # recovery for hung tunnel RPCs that freeze the host thread outside
    # Python's reach (utils/watchdog.py; cli/supervise.py relaunches).
    wd = None
    beat = lambda step: None  # noqa: E731
    grace = lambda: None  # noqa: E731
    if watchdog:
        from eadgan_tpu.utils.watchdog import Watchdog

        wd = Watchdog(watchdog).start()
        beat = wd.beat
        grace = wd.grace
        clear_grace = wd.clear_grace
    else:
        clear_grace = lambda: None  # noqa: E731

    # Fault injection for watchdog/supervisor drills: hang forever right
    # after the given step completes, mimicking the observed wedged-RPC
    # failure (host thread parked, device idle).  The fault is TRANSIENT
    # like the real one: EADGAN_FAULT_HANG_MARKER names a file created
    # when the hang fires, and a process that finds it pre-existing (the
    # supervised restart) skips the fault.  Test/drill hook only.
    hang_at = int(os.environ.get("EADGAN_FAULT_HANG_STEP", 0) or 0)
    if hang_at:
        marker = os.environ.get("EADGAN_FAULT_HANG_MARKER", "")
        if marker and os.path.exists(marker):
            hang_at = 0
    if hang_at:
        inner_beat = beat

        def beat(step, _inner=inner_beat):  # noqa: F811
            if step >= hang_at:
                if marker:
                    open(marker, "w").close()
                print(f"fault injection: hanging at step {step}", flush=True)
                while True:
                    time.sleep(3600)
            _inner(step)

    try:
        with trace(profile_dir or None):
            if chain > 1 and step_body is not None:
                state = _run_epochs_chained(
                    n_epochs=n_epochs, data=data, labels=labels,
                    batch_size=batch_size, state=state, step_body=step_body,
                    on_batch=on_batch, seed=seed, max_steps=max_steps,
                    logger=logger, metric_keys=metric_keys, scale=scale,
                    shift=shift, random_flip=random_flip,
                    data_parallel=data_parallel, zero_opt=zero_opt,
                    chain=chain,
                    chain_periods=chain_periods, beat=beat, grace=grace,
                    clear_grace=clear_grace, verify_progress=wd is not None,
                    stop_event=stop_event,
                )
            else:
                state = _run_epochs_inner(
                    n_epochs=n_epochs, data=data, labels=labels,
                    batch_size=batch_size,
                    state=state, step_fn=step_fn, on_batch=on_batch, seed=seed,
                    max_steps=max_steps, logger=logger, metric_keys=metric_keys,
                    scale=scale, shift=shift, random_flip=random_flip,
                    data_parallel=data_parallel, beat=beat,
                    stop_event=stop_event,
                )
            # NOTE: stop_event.is_set() below is one more synchronized
            # collective in the multi-process case — every rank reaches
            # this exact check once, so dispatch stays symmetric.
            if stop_event is not None and stop_event.is_set():
                final_step = int(jax.device_get(state.step))
                if local_stop is not None:
                    # the verdict exit_if_preempted gates the 86 exit on:
                    # did the stop actually cut the schedule short?
                    local_stop.cut_short = final_step < planned_end
                if on_shutdown is not None:
                    # The chained engine's own finally has already
                    # flushed the EventWorker (queued cadence checkpoint
                    # writes), so this save is strictly the newest —
                    # retention pruning (train/checkpoint.py::
                    # prune_saved) anchors correctly.  The train state
                    # carries its own step counter; under chaining it
                    # equals the completed window's end.  Fires on EVERY
                    # process: a multi-process final save is a
                    # collective (see the docstring's stop contract).
                    if is_coordinator():
                        print(
                            "graceful shutdown: saving final train "
                            f"state at step {final_step}",
                            flush=True,
                        )
                    on_shutdown(final_step, state)
            return state
    finally:
        if wd is not None:
            wd.stop()
        if owned_logger is not None:
            owned_logger.close()  # flush buffered JSONL records


def _run_epochs_inner(
    *, n_epochs, data, labels, batch_size, state, step_fn, on_batch,
    seed, max_steps, logger, metric_keys, scale, shift, random_flip,
    data_parallel, beat=lambda step: None, stop_event=None,
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

    # Multi-process: global-mesh device_puts must come from the main
    # thread in rank-identical order (see the chained engine's
    # mp_sync_put note) — the prefetch thread then only gathers host
    # arrays and the loop below places them.
    mp_sync_put = jax.process_count() > 1
    thread_put = (lambda b: b) if mp_sync_put else device_put

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
                return thread_put(
                    gather_normalize_flip(data, idx, mask, scale, shift)
                )

        else:

            def place(idx):
                return thread_put(gather_normalize(data, idx, scale, shift))

    for epoch in range(start_step // max(n_batches, 1), n_epochs):
        if use_native:
            perm = host_rng.permutation(data.shape[0])
            end = data.shape[0] - (data.shape[0] % batch_size)
            batches = (perm[s : s + batch_size] for s in range(0, end, batch_size))
            iterator = Prefetcher(batches, place=place)
        else:
            iterator = Prefetcher(
                epoch_batches(data, batch_size, host_rng, labels=labels),
                place=thread_put,
            )
        try:
            for batch in iterator:
                if mp_sync_put:
                    batch = device_put(batch)
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
                beat(batches_done)
                if stop_event is not None and stop_event.is_set():
                    # graceful stop (preemption SIGTERM): this step's
                    # side effects ran; run_epochs fires on_shutdown
                    return state
                if max_steps and batches_done - start_step >= max_steps:
                    return state
        finally:
            iterator.close()
    return state


def _run_epochs_chained(
    *, n_epochs, data, labels, batch_size, state, step_body, on_batch,
    seed, max_steps, logger, metric_keys, scale, shift, random_flip,
    data_parallel, chain, chain_periods, zero_opt=False,
    beat=lambda step: None,
    grace=lambda: None, clear_grace=lambda: None, verify_progress=False,
    stop_event=None,
):
    """In-graph multi-step engine: windows of up to ``chain`` steps run
    as one ``lax.scan`` program (train/chain.py).

    RNG-stream parity with ``_run_epochs_inner``: the epoch permutation
    comes from the same ``host_rng`` draws, flip masks from the same
    dedicated ``flip_rng`` stream drawn once per batch in batch order,
    and the jitted body is the identical un-jitted step — so a chained
    run produces the same training trajectory as the per-dispatch run.

    uint8 data ships RAW (host gather only); normalize / channel axis /
    flips move in-graph into the scan body — 4x less tunnel traffic and
    one dispatch per window instead of per step.
    """
    from eadgan_tpu.train.chain import (
        LazyHostBatch,
        LazyLastMetrics,
        make_chained_step,
        normalize_prepare,
        plan_windows,
    )

    from eadgan_tpu.parallel import is_coordinator

    host_rng = np.random.default_rng(seed)
    flip_rng = np.random.default_rng([seed, 0x464C4950])
    n_batches = data.shape[0] // batch_size
    start_step = int(jax.device_get(state.step))
    stop = (start_step + max_steps) if max_steps else None
    eager_events = is_coordinator()

    device_put = jax.device_put
    if data_parallel:
        from eadgan_tpu.parallel import default_mesh, replicate, shard_window

        mesh = default_mesh()
        state = replicate(mesh, state)
        device_put = lambda w: shard_window(mesh, w)  # noqa: E731
        if zero_opt:
            # ZeRO-1: Adam moments sharded over the data axis, params
            # replicated; the output-state constraint pins that contract
            # through every scanned window (parallel/zero.py).
            from eadgan_tpu.parallel import (
                constrain_like,
                state_shardings,
                zero_place,
            )

            state = zero_place(mesh, state)
            step_body = constrain_like(step_body, state_shardings(state))

    use_native = data.dtype == np.uint8 and labels is None
    if random_flip and not use_native:
        raise ValueError("random_flip requires the uint8 label-free ingest path")

    # Device-resident dataset: uint8 archives that fit HBM (real dSprites
    # 2.9 GB, CelebA 2.4 GB vs 16 GB on v5e) are staged on device ONCE
    # and gathered in-graph — each window then ships only int32 indices
    # (+ flip masks) through the tunnel instead of megabytes of pixels.
    max_resident = int(os.environ.get("EADGAN_DEVICE_DATA_MAX", 4 << 30))
    resident_arrays = None
    if use_native and data.nbytes <= max_resident:
        prepare = normalize_prepare(
            scale, shift, flip=random_flip, add_channel=data.ndim == 3,
            gather=True,
        )
        resident_arrays = (data,)
    elif use_native:
        prepare = normalize_prepare(
            scale, shift, flip=random_flip, add_channel=data.ndim == 3,
        )
    elif data.nbytes <= max_resident:
        # pre-normalized (e.g. MNIST f32) data, with or without labels:
        # stage everything and gather in-graph too
        from eadgan_tpu.train.chain import gather_prepare

        prepare = gather_prepare()
        resident_arrays = (data,) if labels is None else (data, labels)
    else:
        prepare = None
    use_gather = resident_arrays is not None
    # Packed metrics: every window returns ONE (K, M) f32 array instead
    # of a dict of M arrays — one metric fetch RTT per window instead of
    # M, and no eager [-1] slice dispatches (those would enqueue behind
    # the NEXT window's scan and stall the host a full window per
    # iteration; see train/chain.py docstrings).  "auto" packs ALL
    # metrics the step emits, so on_batch sees the full dict exactly as
    # in the per-dispatch engine; ``metric_keys`` only filters what the
    # logger prints, matching _run_epochs_inner.
    chained = make_chained_step(
        step_body, prepare=prepare, donate=True, pack_keys="auto"
    )
    if use_gather:
        if data_parallel:
            from eadgan_tpu.parallel import replicate as _replicate

            consts = tuple(_replicate(mesh, a) for a in resident_arrays)
        else:
            consts = tuple(jax.device_put(a) for a in resident_arrays)
    else:
        consts = ()

    def host_batch(rows):
        """Single-step-path-identical host materialization of one batch
        for ``on_batch`` consumers (sample grids)."""
        if not use_native:
            b = data[rows].astype(np.float32) if data.dtype == np.uint8 else data[rows]
            return (b, labels[rows]) if labels is not None else (b,)
        from eadgan_tpu.data.native import gather_normalize, gather_normalize_flip

        if random_flip:
            return (gather_normalize_flip(data, rows[0], rows[1], scale, shift),)
        return (gather_normalize(data, rows, scale, shift),)

    # Event side effects (sample grids, checkpoint writes — ~5 s of
    # state fetch + serialization for a CelebA checkpoint through the
    # tunnel, measured in evidence/perf_r3) run on a background
    # EventWorker with a device-side SNAPSHOT of the train state: the
    # copy shares no buffers with the live state, so the next window's
    # donation proceeds immediately and the event work overlaps device
    # execution.  Under chaining, on_batch fires exactly at declared
    # ``chain_periods`` boundaries (the per-dispatch engine calls it
    # every step; every production callback self-gates on these same
    # periods, so the observable side effects are identical).  Callers
    # that declare NO periods keep the legacy inline per-window call.
    # EADGAN_SYNC_EVENTS=1 forces inline execution (debugging).
    worker = None
    async_events = (
        bool(chain_periods)
        and os.environ.get("EADGAN_SYNC_EVENTS", "") != "1"
    )
    if async_events and eager_events:
        from eadgan_tpu.train.chain import EventWorker

        worker = EventWorker()
    if jax.process_count() > 1:
        # The jitted device-side copy would be a global-mesh program the
        # peers never join (worker events run on the coordinator only) —
        # fetch the local replica to host instead.  Donation stays safe:
        # the host copy completes before the next window dispatches.
        snapshot = jax.device_get
    else:
        snapshot = jax.jit(lambda t: jax.tree_util.tree_map(jax.numpy.copy, t))

    batches_done = start_step
    epoch = start_step // max(n_batches, 1)
    seen_sizes = set()  # window sizes this process has compiled
    grace_end = None  # end step of an in-flight freshly-compiled window
    stopping = False  # graceful stop requested (stop_event observed)
    try:
        while epoch < n_epochs and (stop is None or batches_done < stop):
            perm = host_rng.permutation(data.shape[0])
            plan = list(
                plan_windows(batches_done, n_batches, chain, chain_periods, stop)
            )

            def windows():
                for s, k in plan:
                    o = (s - plan[0][0]) * batch_size
                    rows = perm[o : o + k * batch_size]
                    win_shape = (k, batch_size) + data.shape[1:]
                    last_rows = rows[-batch_size:]
                    if use_gather:
                        # indices only; pixels (and labels) gathered in-graph
                        # from the device-resident arrays
                        win = np.ascontiguousarray(
                            rows.reshape(k, batch_size), np.int32
                        )
                    elif use_native:
                        win = np.ascontiguousarray(data[rows]).reshape(win_shape)
                    if use_native:
                        if random_flip:
                            # one draw per batch, batch order — identical
                            # flip_rng stream to the per-dispatch engine
                            masks = np.stack(
                                [flip_rng.random(batch_size) < 0.5 for _ in range(k)]
                            )
                            yield (s, k, last_rows, masks[-1]), (win, masks)
                        else:
                            yield (s, k, last_rows, None), (win,)
                    elif use_gather:
                        yield (s, k, last_rows, None), (win,)
                    else:
                        img = data[rows].reshape(win_shape)
                        if labels is not None:
                            lab = labels[rows].reshape(k, batch_size)
                            yield (s, k, last_rows, None), (img, lab)
                        else:
                            yield (s, k, last_rows, None), (img,)

            # Multi-process: EVERY global-mesh operation (device_put of
            # windows, the chained dispatch, the stop-flag collective)
            # must be issued from the main thread in the same order on
            # every rank — a prefetch-thread device_put racing the main
            # thread's collectives reorders Gloo ops differently per
            # rank and aborts the job with a collective mismatch.  The
            # prefetch thread then only does host-side gather work.
            mp_sync_put = jax.process_count() > 1
            iterator = Prefetcher(
                windows(),
                place=(lambda item: item) if mp_sync_put else (
                    lambda item: (item[0], device_put(item[1]))
                ),
            )
            pending = None  # previous window's (start, k, stacked device metrics)

            def drain():
                nonlocal pending, grace_end
                if pending is None:
                    return
                ps, pk, stacked = pending
                pending = None
                if logger is None and verify_progress:
                    # Non-coordinator process with a watchdog armed:
                    # force the blocking metrics fetch so the heartbeat
                    # below proves DEVICE-side progress — without it,
                    # beats would come from purely async dispatches and
                    # a wedged device keeps "beating" until dispatch
                    # backpressure (ADVICE r3).
                    np.asarray(stacked)
                if logger is not None:
                    keys = tuple(chained.resolved_pack_keys)
                    rows = np.asarray(stacked)  # ONE (K, M) fetch
                    arrs = {m: rows[:, j] for j, m in enumerate(keys)}
                    shown = tuple(metric_keys) if metric_keys else keys
                    for i in range(pk):
                        logger.log(
                            ps + i, {m: arrs[m][i] for m in shown},
                            epoch=epoch, n_epochs=n_epochs,
                            batch=(ps + i) % n_batches, n_batches=n_batches,
                        )
                # With no logger (non-coordinator process) the blocking
                # fetch above is skipped — clear anyway: detection of a
                # real stall during an active grace is merely delayed to
                # the grace's own expiry, once per fresh window size.
                if grace_end is not None and ps + pk >= grace_end:
                    # the freshly-compiled window's metrics came back:
                    # its compile completed, steady timeout governs again
                    grace_end = None
                    clear_grace()

            # EADGAN_CHAIN_TRACE=<path>: append one JSONL record per window
            # with host-side phase timings (iter = prefetch wait + host gather,
            # disp = chained() dispatch call, drain = previous window's packed
            # metric fetch incl. any block on device completion, cb = logging +
            # on_batch side effects).  Zero-cost when unset; the perf account
            # in evidence/perf_r3 is built from these records.
            trace = None
            trace_path = os.environ.get("EADGAN_CHAIN_TRACE", "")
            if trace_path:
                import json as _json
                import time as _time

                trace = open(trace_path, "a")
            try:
                t_prev = None
                for (s, k, last_rows, last_mask), win_arrays in iterator:
                    if mp_sync_put:
                        win_arrays = device_put(win_arrays)
                    if k not in seen_sizes:
                        # Fresh window size = fresh XLA program: give the
                        # watchdog a compile allowance.  Dispatch is async
                        # through the tunnel, so the compile's host-visible
                        # block lands at the NEXT drain — the grace is
                        # released only when THIS window's metrics have
                        # been fetched (drain clears it at >= grace_end).
                        seen_sizes.add(k)
                        grace()
                        grace_end = s + k
                    if trace is not None:
                        t0 = _time.perf_counter()
                    state, stacked = chained(state, consts, *win_arrays)
                    if trace is not None:
                        t1 = _time.perf_counter()
                    # Convert the PREVIOUS window's metrics after dispatching
                    # this one — that device_get never stalls the pipeline.
                    drain()
                    if trace is not None:
                        t2 = _time.perf_counter()
                    pending = (s, k, stacked)
                    batches_done = s + k
                    # heartbeat after the previous window's metrics were
                    # fetched (drain above): proven device-side progress
                    beat(batches_done)
                    is_event = any(
                        (s + k - 1) % p == 0 for p in chain_periods if p
                    )
                    if is_event or not chain_periods:
                        # full emitted-metric dict view (resolved at the first
                        # trace above); no device work unless a callback reads it
                        last_metrics = LazyLastMetrics(
                            tuple(chained.resolved_pack_keys), stacked
                        )
                        if use_native and random_flip:
                            fetch = lambda lr=last_rows, lm=last_mask: host_batch((lr, lm))[0]  # noqa: E731
                        else:
                            fetch = lambda lr=last_rows: host_batch(lr)[0]  # noqa: E731
                        # Event windows materialize the host batch eagerly
                        # (sample callbacks may pass it whole into jitted
                        # functions); legacy no-period windows stay lazy.
                        # Non-coordinator processes had on_batch no-opped by
                        # run_epochs, so they never fetch.
                        if eager_events and is_event:
                            first = fetch()
                        else:
                            first = LazyHostBatch(fetch)
                        batch_for_cb = (first,) if labels is None else (
                            first, labels[last_rows]
                        )
                        if worker is not None and is_event:
                            import functools

                            worker.submit(functools.partial(
                                on_batch, s + k - 1, snapshot(state),
                                last_metrics, batch_for_cb,
                            ))
                        else:
                            on_batch(s + k - 1, state, last_metrics, batch_for_cb)
                    if trace is not None:
                        t3 = _time.perf_counter()
                        trace.write(_json.dumps({
                            "s": s, "k": k,
                            "iter": round(t0 - (t_prev if t_prev else t0), 6),
                            "disp": round(t1 - t0, 6),
                            "drain": round(t2 - t1, 6),
                            "cb": round(t3 - t2, 6),
                        }) + "\n")
                        t_prev = t3
                    if stop_event is not None and stop_event.is_set():
                        # Graceful stop (preemption SIGTERM): this
                        # window — including any event side effects it
                        # just queued — is complete; stop at its
                        # boundary.  The pending metrics drain below,
                        # the EventWorker flushes in the finally, and
                        # run_epochs fires on_shutdown with this state.
                        stopping = True
                        break
                drain()
            finally:
                iterator.close()
                if trace is not None:
                    trace.close()
            if stopping:
                break
            epoch += 1
    finally:
        if worker is not None:
            # all queued event side effects (checkpoint writes!) must
            # complete — and any failure surface — before returning
            worker.close()
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
