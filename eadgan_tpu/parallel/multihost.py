"""Multi-host scaling over DCN (SURVEY.md 2.3 north star).

On a multi-host TPU slice the recipe is unchanged from single-host —
the mesh simply spans all hosts' devices and XLA routes the data-axis
collectives over ICI within a slice and DCN across slices.  What
changes is process bootstrap and data feeding:

* every process calls :func:`initialize` before first jax use (a no-op
  outside a cluster);
* each host loads/feeds only its shard of the global batch
  (:func:`host_batch_slice`), and the per-host arrays are assembled
  into one global sharded array with
  ``jax.make_array_from_process_local_data``.

The single-process contract is covered by tests/test_parallel.py; real
multi-host runs only need the cluster environment jax's auto-detection
already understands, or explicit coordinator args.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from eadgan_tpu.parallel.mesh import batch_spec
from jax.sharding import NamedSharding

__all__ = [
    "any_process_flag",
    "initialize",
    "host_batch_slice",
    "global_batch_from_host",
    "host_barrier",
    "is_coordinator",
    "save_on_coordinator",
    "sync",
]

# Explicit coordinator markers only.  Scheduler variables like
# SLURM_JOB_ID or OMPI_COMM_WORLD_SIZE are deliberately NOT honored:
# they are set for single-process interactive allocations too, where
# jax's cluster auto-detection crashes on missing step variables —
# multi-process scheduler launches should pass coordinator_address (or
# set JAX_COORDINATOR_ADDRESS) explicitly.
_CLUSTER_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "EADGAN_MP_COORDINATOR",
)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` wrapper that is a true no-op when
    there is no cluster: no coordinator argument, no cluster environment,
    or an explicit ``num_processes <= 1``.

    The ``EADGAN_MP_*`` environment triple (``EADGAN_MP_COORDINATOR``,
    ``EADGAN_MP_NUM_PROCESSES``, ``EADGAN_MP_PROCESS_ID``) fills any
    argument the caller omits — it is how ``cli.supervise --ranks N``
    hands each gang member its identity without the child command
    needing rank flags of its own."""
    if coordinator_address is None:
        coordinator_address = os.environ.get("EADGAN_MP_COORDINATOR") or None
    if num_processes is None and os.environ.get("EADGAN_MP_NUM_PROCESSES"):
        num_processes = int(os.environ["EADGAN_MP_NUM_PROCESSES"])
    if process_id is None and os.environ.get("EADGAN_MP_PROCESS_ID"):
        process_id = int(os.environ["EADGAN_MP_PROCESS_ID"])
    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address is None and not any(
        os.environ.get(v) for v in _CLUSTER_ENV_VARS
    ):
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def host_batch_slice(global_batch: int) -> slice:
    """The half-open index range of the global batch this host feeds.

    Raises when the global batch does not divide evenly over processes —
    silent truncation would train at a smaller batch than configured.
    """
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {n}"
        )
    per_host = global_batch // n
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def global_batch_from_host(mesh: Mesh, host_local: np.ndarray):
    """Assemble one global data-sharded array from each host's local
    shard.

    Note: jax places each process's local data at the global indices its
    addressable devices span under the sharding; with the standard
    process-contiguous device order that matches
    :func:`host_batch_slice`.  For i.i.d. training batches any
    process-to-index permutation is harmless; when exact global ordering
    matters, derive the slice from
    ``sharding.addressable_devices_indices_map`` instead.
    """
    sharding = NamedSharding(mesh, batch_spec(host_local.ndim))
    return jax.make_array_from_process_local_data(sharding, host_local)


def is_coordinator() -> bool:
    """True on the process that owns host-side side effects.

    Multi-process checkpoint contract (SURVEY.md §5 rebuild goal): the
    train state is replicated over the mesh, so every process holds an
    identical host-readable copy — exactly ONE process (index 0) writes
    checkpoints, sample grids and log lines; the msgpack files it
    produces are therefore byte-identical to a single-process run's and
    can be restored under ANY process count (each process reads the same
    file and re-places it on its local mesh slice).  The orbax path
    (train/orbax_io.py) instead lets every process participate —
    ocp handles per-shard writes internally — so only the flax-msgpack
    path routes through this gate.
    """
    return jax.process_index() == 0


def sync(tag: str = "eadgan") -> None:
    """Cross-process barrier (no-op single-process): keeps non-writing
    processes alive until the coordinator finishes a checkpoint write,
    and orders restore-after-write across processes."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def save_on_coordinator(path: str, tree) -> None:
    """Write ``tree`` as flax msgpack from process 0 only, with a
    barrier so no process races past an incomplete file.  Single-process
    this degenerates to a plain save.

    Leaves sharded ACROSS processes (ZeRO-1 moments under ``--zero_opt``,
    parallel/zero.py — each process owns only its slice) are first
    assembled with a ``process_allgather`` collective; that gather runs
    on EVERY process (collectives must be dispatched symmetrically), so
    it happens before the coordinator gate.  Fully-addressable and
    replicated leaves (params, the TP-sharded kernels whose every global
    index has a process-local replica) skip the collective and fetch
    directly.  The written file is therefore byte-identical to a
    single-process save and restores under any process count."""
    from eadgan_tpu.train.checkpoint import save_pytree

    def fetch(x):
        if (
            hasattr(x, "sharding")
            and not x.is_fully_addressable
            and not x.is_fully_replicated
        ):
            from jax.experimental import multihost_utils

            return multihost_utils.process_allgather(x, tiled=True)
        return x

    host_tree = jax.tree.map(fetch, tree)
    if is_coordinator():
        save_pytree(path, jax.device_get(host_tree))
    sync("ckpt:" + path)


def any_process_flag(flag: bool) -> bool:
    """Cross-process OR of a host-side boolean — the stop-consensus
    primitive for gang-synchronized graceful preemption.

    Every process calls this at the same loop boundary with its LOCAL
    flag (e.g. "my SIGTERM handler fired"); all processes receive the
    same global answer, so a gang whose step program contains data-axis
    collectives agrees on ONE boundary to stop at — without agreement,
    a rank stopping early would park its peers in a collective that can
    never complete (the jax ``reached_preemption_sync_point`` pattern).
    The call is itself a collective (``process_allgather`` of one int32)
    and MUST be dispatched by every process the same number of times at
    the same points.  Single-process it degenerates to ``bool(flag)``
    with no device work.
    """
    if jax.process_count() <= 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    got = multihost_utils.process_allgather(
        np.asarray([1 if flag else 0], np.int32)
    )
    return bool(np.asarray(got).max() > 0)


def host_barrier(tag: str = "eadgan", timeout_s: int = 1800) -> None:
    """Coordination-service (RPC-only) barrier — unlike :func:`sync`, no
    device collective runs, so it is safe BEFORE the first collective
    program.  Used to line ranks up after their (process-local, possibly
    minutes-staggered) XLA compiles: Gloo's CPU collective context init
    times out after 30s, so the first collective must be dispatched by
    all ranks near-simultaneously.  No-op single-process."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is None:  # pragma: no cover - initialize() always sets it
        sync(tag)
        return
    client.wait_at_barrier(tag, timeout_in_ms=timeout_s * 1000)
