"""Mesh construction and sharding placement.

Data parallelism: batches sharded over the ``data`` axis, parameters and
optimizer state replicated; the gradient mean over the global batch
becomes an XLA ``psum`` over ICI automatically under the SPMD
partitioner.  BatchNorm statistics are computed over the *global* batch
(the jnp.mean over a sharded axis reduces across devices), which matches
the reference's single-GPU semantics at global-batch parity.

Tensor parallelism (optional ``model`` axis): the CelebA-scale conv
kernels are sharded on their output-channel dimension; activations stay
batch-sharded and XLA inserts the all-gathers/reduce-scatters where the
channel-sharded weights meet them.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "default_mesh",
    "batch_spec",
    "shard_batch",
    "shard_window",
    "replicate",
    "shard_model_params",
]


def batch_spec(ndim: int) -> P:
    """PartitionSpec for a batch-leading array: leading dim sharded over
    ``data``, everything else replicated.  Single source of truth for
    both single-host placement and multi-host assembly."""
    return P("data", *([None] * (ndim - 1)))


def default_mesh(
    devices: Optional[Sequence[jax.Device]] = None, model_parallel: int = 1
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``model_parallel=1`` (the default) gives pure data parallelism; the
    mesh always carries both named axes so step code and sharding rules
    are identical for every configuration.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}"
        )
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, batch):
    """Place array(s) with the leading (batch) dim sharded over ``data``."""

    def place(x):
        return jax.device_put(x, NamedSharding(mesh, batch_spec(x.ndim)))

    return jax.tree.map(place, batch)


def shard_window(mesh: Mesh, window):
    """Place chained-step window array(s) (leading chain axis K, then the
    batch axis) with the BATCH axis sharded over ``data`` — each scanned
    step inside the chained program then sees the same per-device batch
    slice the single-step path's ``shard_batch`` produces."""

    def place(x):
        if x.ndim >= 2:
            spec = P(None, "data", *([None] * (x.ndim - 2)))
        else:
            spec = P(None)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, window)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params, optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_model_params(mesh: Mesh, params, min_channels: int = 256):
    """Shard large kernels over the ``model`` axis (output channels).

    Any kernel whose last dimension is >= ``min_channels`` and divisible
    by the model-axis size gets ``P(..., 'model')``; everything else is
    replicated.  With ``model_parallel=1`` this reduces to replication.
    """
    axis = mesh.shape["model"]

    def place(x):
        if (
            hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[-1] >= min_channels
            and x.shape[-1] % axis == 0
        ):
            spec = P(*([None] * (x.ndim - 1)), "model")
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)
