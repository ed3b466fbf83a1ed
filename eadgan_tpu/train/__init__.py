"""Training drivers (layer L5): jitted multi-phase train steps.

Each reference entry script's epoch/batch loop (SURVEY.md section 3)
becomes one jitted step function over an explicit train state:
parameters, the three Adam states over their (overlapping) parameter
partitions, spectral-norm power-iteration vectors, BatchNorm running
stats, and the PRNG key all live in the state, so a step is a pure
``(state, batch) -> (state, metrics)`` function the XLA compiler can
fuse end to end — including the affine matrix algebra the reference
rebuilds on the host every iteration.
"""

from eadgan_tpu.train.engine import jit_generator_apply, run_epochs
from eadgan_tpu.train.state import EncoderTrainState, GanTrainState, ModelVars, adam
from eadgan_tpu.train.config import (
    ApproximatorConfig,
    CelebaConfig,
    MnistConfig,
    PxyConfig,
    SpritesGanConfig,
)

__all__ = [
    "run_epochs",
    "jit_generator_apply",
    "ModelVars",
    "EncoderTrainState",
    "GanTrainState",
    "adam",
    "ApproximatorConfig",
    "PxyConfig",
    "SpritesGanConfig",
    "MnistConfig",
    "CelebaConfig",
]
