"""In-graph multi-step training: K train steps per device dispatch.

The dispatch-per-batch engine pays one host<->device round trip per
step; through the remote-execution tunnel that round trip (~80 ms)
dwarfs a 16.6 ms CelebA step, so the round-2 production soak delivered
~12 steps/s against a 7.7k img/s benched step rate.  This module chains
K steps into ONE XLA program with ``lax.scan`` — the hot path of the
reference training loops (dSprites/rp.py:362-509,
celebA/EAD-GAN_celebA.py:296-423) — so the round trip amortizes over K
steps and the CLIs deliver the benched rate.

Design notes (TPU/tunnel):

- The scanned body is the SAME un-jitted step body the single-step path
  jits (``make_*_step(..., jit=False)``): chained-vs-sequential equality
  is by construction, and tests pin it numerically.
- Batches ship as raw ``uint8`` windows (K, B, H, W[, C]) with the
  normalize / channel-axis / horizontal-flip work moved *in-graph* into
  a per-step ``prepare`` — 4x less tunnel traffic than f32 batches, and
  only one batch of f32 pixels is ever live (scan slices the window).
- The carried train state is donated: params + Adam moments update in
  place across the whole window.
- Logs/samples/checkpoints surface at window boundaries; the planner
  (``plan_windows``) clamps windows so every side-effect step index
  lands exactly at a window END, where the true post-step state exists.
"""

from __future__ import annotations

import functools
from typing import Callable, Iterator, Optional, Sequence, Tuple

import jax

__all__ = [
    "make_chained_step",
    "plan_windows",
    "normalize_prepare",
    "LazyLastMetrics",
    "EventWorker",
]


def make_chained_step(
    body: Callable,
    prepare: Optional[Callable] = None,
    donate: bool = True,
    pack_keys: Optional[Sequence[str]] = None,
):
    """Wrap an un-jitted step ``body(state, *batch) -> (state, metrics)``
    into a jitted ``chained(state, consts, *windows) ->
    (state, stacked_metrics)``.

    ``windows`` are arrays with a leading chain axis K; ``lax.scan``
    slices one per-step batch off each and (optionally) runs ``prepare``
    on the slices first (e.g. uint8 -> normalized f32).  ``consts`` is a
    pytree of loop-invariant device arrays ``prepare`` may read — the
    device-resident dataset for the in-graph-gather path — passed as an
    explicit (never donated) argument rather than a closure capture so
    XLA treats it as a parameter, not a multi-GB embedded constant.
    The returned metrics are stacked over K.  One jitted function serves
    every K — each distinct window length retraces once and lands in the
    persistent compile cache.

    ``pack_keys`` (an ordered metric-name sequence) switches the metric
    return from a dict of K-vectors to ONE ``(K, len(pack_keys))`` f32
    array.  Through the remote-execution tunnel every per-array fetch is
    a host round trip, so a 6-metric step pays 6 RTTs per window in dict
    form but exactly one in packed form — that difference is what
    throttled the round-2 soaks to ~60% of the benched step rate.

    ``pack_keys="auto"`` packs EVERY metric the body emits (sorted key
    order, resolved at trace time); the resolved order is exposed as
    ``chained.resolved_pack_keys`` after the first call.  This is what
    the production engine uses, so downstream ``on_batch`` consumers see
    the full metric dict — same contract as the per-dispatch engine —
    not just the keys the CLI chose to print.
    """
    import jax.numpy as jnp

    resolved: list = []

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def chained(state, consts, *windows):
        def f(carry, xs):
            batch = prepare(consts, *xs) if prepare is not None else xs
            if not isinstance(batch, tuple):
                batch = (batch,)
            new_state, metrics = body(carry, *batch)
            if pack_keys is not None:
                keys = tuple(sorted(metrics)) if pack_keys == "auto" else pack_keys
                if not resolved:
                    resolved.extend(keys)
                metrics = jnp.stack(
                    [jnp.asarray(metrics[k], jnp.float32) for k in keys]
                )
            return new_state, metrics

        return jax.lax.scan(f, state, windows)

    chained.resolved_pack_keys = resolved
    return chained


def normalize_prepare(
    scale: float,
    shift: float,
    flip: bool = False,
    add_channel: bool = False,
    gather: bool = False,
):
    """In-graph equivalent of the native host batcher's
    gather+normalize(+flip) (eadgan_tpu/data/native.py): uint8 pixels ->
    ``f32 * scale + shift``, optional trailing channel axis for 2-D
    rows, optional per-row horizontal mirror from a bool mask.

    ``gather=False``: the window carries raw uint8 pixel batches;
    ``consts`` is unused.  ``gather=True``: the whole uint8 dataset is
    DEVICE-RESIDENT (``consts = (dataset,)``, staged once — real
    dSprites is 2.9 GB, CelebA 2.4 GB, both fit v5e HBM) and the window
    carries only int32 row indices — per-window tunnel traffic drops
    from megabytes of pixels to kilobytes.

    Same f32 operations in the same order as the C++ path, so the
    chained and single-step engines agree numerically (pinned by
    tests/test_chain.py).
    """
    import jax.numpy as jnp

    def load(consts, x):
        if gather:
            (dataset,) = consts
            x = jnp.take(dataset, x, axis=0)
        return x

    if flip:

        def prep(consts, x, mask):
            x = load(consts, x)
            if add_channel:
                x = x[..., None]
            # mirror along the width axis where mask is set
            # (torchvision RandomHorizontalFlip parity, re-drawn per
            # batch on the host like the single-step path); flip while
            # still uint8 — element-identical to flipping the normalized
            # f32 (both are permutations of the same pointwise map) at a
            # quarter of the select's byte traffic
            flipped = x[:, :, ::-1, :]
            x = jnp.where(mask[:, None, None, None], flipped, x)
            img = x.astype(jnp.float32) * scale + shift
            return (img,)

    else:

        def prep(consts, x):
            img = load(consts, x).astype(jnp.float32) * scale + shift
            if add_channel:
                img = img[..., None]
            return (img,)

    return prep


def gather_prepare():
    """Prepare for fully device-resident datasets (e.g. MNIST's f32
    images + labels, 245 MB): ``consts`` holds the staged arrays, the
    window carries int32 row indices, and every per-step batch is an
    in-graph gather — per-window tunnel traffic is kilobytes."""
    import jax.numpy as jnp

    def prep(consts, idx):
        return tuple(jnp.take(c, idx, axis=0) for c in consts)

    return prep


def plan_windows(
    start: int,
    count: int,
    chain: int,
    periods: Sequence[int] = (),
    stop: Optional[int] = None,
) -> Iterator[Tuple[int, int]]:
    """Yield ``(global_start_index, k)`` windows covering step indices
    ``[start, start + count)``.

    Every index ``e`` with ``e % p == 0`` for any period ``p`` (the
    sample / checkpoint intervals whose side effects need the exact
    post-step state) is forced to be the LAST index of its window; ``k``
    never exceeds ``chain`` and never crosses ``stop`` (the absolute
    max-steps bound).  With all periods equal to 1 this degenerates to
    k=1 per window — the per-step debugging path.

    Emitted ``k`` are always POWERS OF TWO: each distinct window length
    is a separate XLA compile (a 30s-7min remote compile through the
    tunnel), so a ragged residual like 23 is paid as 16+4+2+1 windows —
    at most log2(chain)+1 programs ever exist per pipeline, all reused
    from the persistent cache across runs.  Shrinking a window never
    crosses an event index (k only decreases), so the event-at-window-end
    invariant is preserved.
    """
    if chain < 1:
        raise ValueError(f"chain must be >= 1, got {chain}")
    s = start
    end = start + count
    if stop is not None:
        end = min(end, stop)
    periods = [p for p in periods if p and p > 0]
    while s < end:
        k = min(chain, end - s)
        for p in periods:
            # smallest event index >= s under period p
            e = s if s % p == 0 else s + (p - s % p)
            if e < s + k:
                k = e - s + 1
        k = 1 << (k.bit_length() - 1)  # largest power of two <= k
        yield s, k
        s += k


class LazyLastMetrics:
    """Dict-like view of the LAST step's metrics in a packed ``(K, M)``
    device array.  Most windows never read per-step metrics (the console
    line comes from the logger's drained host copy), so fetching eagerly
    would cost one tunnel round trip per window — and slicing ``[-1]``
    eagerly would enqueue a tiny program BEHIND the next window's
    already-dispatched K-step scan, stalling the host a full window.
    First key access fetches the whole packed array once and caches it."""

    def __init__(self, keys: Sequence[str], packed):
        self._keys = tuple(keys)
        self._packed = packed
        self._row = None

    def _fetch(self):
        if self._row is None:
            import numpy as np

            self._row = np.asarray(self._packed)[-1]
        return self._row

    def __getitem__(self, key):
        if key not in self._keys:
            raise KeyError(key)  # dict parity with the per-dispatch engine
        return self._fetch()[self._keys.index(key)]

    def __contains__(self, key):
        return key in self._keys

    def __iter__(self):
        return iter(self._keys)

    def __len__(self):
        return len(self._keys)

    def get(self, key, default=None):
        return self._fetch()[self._keys.index(key)] if key in self._keys else default

    def keys(self):
        return self._keys

    def values(self):
        row = self._fetch()
        return [row[i] for i in range(len(self._keys))]

    def items(self):
        row = self._fetch()
        return [(k, row[i]) for i, k in enumerate(self._keys)]


class EventWorker:
    """Single ordered background thread for event-window side effects
    (sample grids, checkpoint writes).

    A CelebA checkpoint event serializes ~620 MB of device state through
    the tunnel plus grid renders — ~5 s measured (evidence/perf_r3) —
    and running it inline stalls the training pipeline that long.  The
    engine instead snapshots the train state on-device (donation-safe:
    the copy shares no buffers with the live state the next window
    consumes) and submits the callback here, so the fetch+serialize+PNG
    work overlaps the next windows' device execution.  The queue is
    bounded: if events outpace the worker, ``submit`` blocks — natural
    backpressure, never unbounded memory.  Exceptions re-raise on the
    next ``submit`` or at ``close`` so a failed checkpoint write cannot
    pass silently."""

    def __init__(self, maxsize: int = 2):
        import queue
        import threading

        self._q = queue.Queue(maxsize=maxsize)
        self._err = None
        self._t = threading.Thread(
            target=self._run, name="eadgan-event-worker", daemon=True
        )
        self._t.start()

    def _run(self):
        while True:
            fn = self._q.get()
            if fn is None:
                return
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 — surfaced on submit/close
                self._err = e

    def _check(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def submit(self, fn: Callable) -> None:
        self._check()
        self._q.put(fn)

    def close(self) -> None:
        self._q.put(None)
        self._t.join()
        self._check()


class LazyHostBatch:
    """Materialize a window's last host batch only if ``on_batch``
    actually touches it (the sample-grid callbacks slice ``batch[0]``
    every ``sample_interval`` steps; all other windows never pay the
    gather)."""

    def __init__(self, fn: Callable):
        self._fn = fn
        self._value = None

    def _get(self):
        if self._value is None:
            self._value = self._fn()
        return self._value

    def __getitem__(self, item):
        return self._get()[item]

    def __array__(self, dtype=None, copy=None):
        import numpy as np

        arr = np.asarray(self._get())
        return arr.astype(dtype) if dtype is not None else arr

    @property
    def shape(self):
        return self._get().shape

    @property
    def dtype(self):
        return self._get().dtype
