"""ZeRO-style optimizer-state sharding over the ``data`` axis.

The reference has no distributed story at all (SURVEY.md section 2.3);
data parallelism here normally replicates the full train state on every
device (parallel/mesh.py).  For the adversarial pipelines the optimizer
moments are the bulk of that state — the CelebA train state is ~494 MiB
of which the three Adam partitions are ~395 MiB (G and D params are
~99 MiB; opt_info duplicates G's and D's moments on top of opt_g/opt_d,
exactly like the reference's overlapping torch optimizers,
celebA/EAD-GAN_celebA.py:211-217) — so replication burns almost 8x the
moment memory on an 8-device slice for state that is only ever read and
written elementwise.

ZeRO-1 placement (Rajbhandari et al., 2019, adapted to the XLA SPMD
model): each Adam moment leaf is sharded over the ``data`` mesh axis on
its largest divisible dimension, while params, model stats, and the RNG
stay replicated.  On a 2D (data, model) mesh the placement COMPOSES
with tensor parallelism: moment leaves that already carry a ``model``
shard (``shard_model_params`` applied to the optimizer state) keep it,
and ``data`` lands on a different dimension — 1/(data*model) of the
moments per device (tests/test_parallel.py::test_zero_opt_2d_mesh).  No step code changes: gradients are already reduced
across ``data`` by the SPMD partitioner (psum), each device then updates
only its 1/N slice of the moments, and the partitioner inserts the
all-gather that rebuilds replicated params from the sharded updates —
the classic reduce-scatter/all-gather decomposition of a data-parallel
step, chosen by the compiler rather than hand-written collectives.

Because GSPMD *propagation* would otherwise happily shard the updated
params too (whatever placement is cheapest locally), the contract is
pinned explicitly: :func:`constrain_like` wraps the un-jitted step body
with a ``with_sharding_constraint`` on the output state, so moments stay
sharded and params stay replicated by construction — under a plain
``jax.jit`` and inside the chained engine's ``lax.scan`` alike.

Numerics: the update math is elementwise, so a ZeRO step matches
replicated DP the same way tensor parallelism does — losses at rtol
~2e-4; a first Adam step may flip the sign of near-zero-gradient
elements where the reduce-scattered gradient summation order differs
(see tests/test_parallel.py::test_celeba_step_2d_mesh for the measured
account of that noise class).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "zero_spec",
    "shard_opt_over_data",
    "zero_place",
    "state_shardings",
    "constrain_like",
]


def zero_spec(shape, n_shards: int, min_elems: int = 1024, base: P = P()) -> P:
    """PartitionSpec adding a ``data``-axis shard to ``base``.

    The largest dimension that is divisible by ``n_shards`` and not
    already claimed by ``base`` gets ``data``; ``base``'s own axes (a
    ``model`` shard from ``shard_model_params``, for a 2D mesh) are
    preserved — that is the ZeRO x tensor-parallel composition: moments
    sharded over BOTH axes, 1/(data*model) per device.  Returns ``base``
    unchanged when the leaf is small (bias vectors, scalars — sharding
    those buys nothing and costs a collective) or no free dimension
    divides."""
    base_t = tuple(base)
    base_t = base_t + (None,) * (len(shape) - len(base_t))
    base_p = P(*base_t) if any(a is not None for a in base_t) else P()
    size = 1
    for d in shape:
        size *= d
    if not shape or size < min_elems:
        return base_p
    used = {i for i, a in enumerate(base_t) if a is not None}
    candidates = [
        i for i in range(len(shape))
        if i not in used and shape[i] % n_shards == 0
    ]
    if not candidates:
        return base_p
    i = max(candidates, key=lambda i: shape[i])
    spec = list(base_t)
    spec[i] = "data"
    return P(*spec)


def _existing_spec(x) -> P:
    """The PartitionSpec a leaf is already placed with (e.g. a ``model``
    shard from ``shard_model_params``); empty for unplaced/replicated."""
    sharding = getattr(x, "sharding", None)
    if isinstance(sharding, NamedSharding):
        return sharding.spec
    return P()


def shard_opt_over_data(mesh: Mesh, opt_state, min_elems: int = 1024):
    """Place an optax optimizer state with every large leaf sharded over
    the ``data`` axis (ZeRO-1), COMPOSED with any sharding the leaves
    already carry (a ``model``-axis shard on a 2D mesh stays; ``data``
    lands on a different dimension).  Scalars (Adam's ``count``) and
    small leaves keep their existing placement."""
    n = mesh.shape["data"]

    def place(x):
        spec = zero_spec(
            getattr(x, "shape", ()), n, min_elems, base=_existing_spec(x)
        )
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, opt_state)


def zero_place(mesh: Mesh, state):
    """ZeRO-shard every optimizer field of an already-replicated train
    state (``opt`` / ``opt_g`` / ``opt_d`` / ``opt_info`` — any
    dataclass field named ``opt*``); params, stats, rng, step stay as
    placed."""
    updates = {
        name: shard_opt_over_data(mesh, getattr(state, name))
        for name in getattr(state, "__dataclass_fields__", {})
        if name.startswith("opt")
    }
    return state.replace(**updates) if updates else state


def state_shardings(state):
    """Harvest the per-leaf shardings of an already-placed train state —
    the explicit contract :func:`constrain_like` pins on step outputs."""
    return jax.tree.map(lambda x: x.sharding, state)


def constrain_like(body, shardings):
    """Wrap an un-jitted step body so its output state is constrained to
    ``shardings`` (from :func:`state_shardings`).

    Without this, GSPMD propagation picks the output placement itself
    and measurably shards the updated *params* over ``data`` as well —
    functional, but then every later use pays an all-gather the caller
    never asked for.  The wrapper composes with both engines: a plain
    ``jax.jit(wrapped)`` and ``train/chain.py``'s ``lax.scan`` (the
    constraint rides inside the scanned body, so the carried state keeps
    its placement across the whole window).
    """

    def wrapped(state, *batch):
        new_state, metrics = body(state, *batch)
        new_state = jax.lax.with_sharding_constraint(new_state, shardings)
        return new_state, metrics

    return wrapped
