"""Distributed scaling (green-field — the reference is single-GPU only,
SURVEY.md 2.3).

All collectives route through this one module: a ``Mesh`` over the TPU
slice with a ``data`` axis (batch parallelism over ICI) and an optional
``model`` axis (output-channel sharding of the large CelebA kernels).
Train steps stay ordinary jitted functions — placing the batch with a
``NamedSharding`` over ``data`` and parameters replicated (or sharded
over ``model``) lets XLA's SPMD partitioner insert the psum/all-gather
collectives, per the standard scaling-book recipe.
"""

from eadgan_tpu.parallel.mesh import (
    batch_spec,
    default_mesh,
    replicate,
    shard_batch,
    shard_model_params,
    shard_window,
)
from eadgan_tpu.parallel.zero import (
    constrain_like,
    shard_opt_over_data,
    state_shardings,
    zero_place,
    zero_spec,
)
from eadgan_tpu.parallel.multihost import (
    any_process_flag,
    global_batch_from_host,
    host_barrier,
    is_coordinator,
    save_on_coordinator,
    sync,
    host_batch_slice,
    initialize,
)

__all__ = [
    "any_process_flag",
    "default_mesh",
    "batch_spec",
    "shard_batch",
    "shard_window",
    "replicate",
    "shard_model_params",
    "zero_spec",
    "shard_opt_over_data",
    "zero_place",
    "state_shardings",
    "constrain_like",
    "initialize",
    "host_batch_slice",
    "global_batch_from_host",
    "is_coordinator",
    "save_on_coordinator",
    "sync",
    "host_barrier",
]
