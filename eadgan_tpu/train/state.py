"""Train-state containers and model-apply helpers.

The reference holds training state implicitly in mutable torch modules
and three ``torch.optim.Adam`` instances over overlapping parameter
partitions (e.g. ``optimizer_info`` chains G+E, dSprites/rp.py:280-282,
or G+D for CelebA, celebA/EAD-GAN_celebA.py:215-217).  Here everything
is an explicit pytree: the info optimizer owns one Adam state over a
``{"g": ..., "e": ...}`` tree, so the overlapping-partition semantics
(G's Adam moments in opt_g are distinct from G's moments inside
opt_info, exactly like two torch optimizers over the same tensors) fall
out naturally.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["ModelVars", "GanTrainState", "EncoderTrainState", "adam", "apply_model"]


def adam(lr: float, b1: float = 0.5, b2: float = 0.999) -> optax.GradientTransformation:
    """torch.optim.Adam parity (betas=(0.5, 0.999) in every reference
    driver, eps 1e-8)."""
    return optax.adam(learning_rate=lr, b1=b1, b2=b2, eps=1e-8)


class ModelVars(struct.PyTreeNode):
    """One model's variables: trainable params plus non-differentiable
    state (spectral-norm u/sigma, BatchNorm running stats)."""

    params: Any
    stats: Any = struct.field(default_factory=dict)

    @classmethod
    def create(cls, variables) -> "ModelVars":
        return cls(
            params=variables["params"], stats=variables.get("batch_stats", {})
        )

    def as_variables(self):
        v = {"params": self.params}
        if self.stats:
            v["batch_stats"] = self.stats
        return v


def apply_model(model, mv: ModelVars, *args, train: bool = True, **kwargs):
    """Apply a flax module threading its batch_stats; returns
    (outputs, new_stats)."""
    if mv.stats:
        out, upd = model.apply(
            mv.as_variables(), *args, train=train, mutable=["batch_stats"], **kwargs
        )
        return out, upd["batch_stats"]
    out = model.apply(mv.as_variables(), *args, train=train, **kwargs)
    return out, mv.stats


class GanTrainState(struct.PyTreeNode):
    """Full adversarial-pipeline state.

    ``e`` is the separate encoder (absent for CelebA, where the
    discriminator's info head plays that role); ``pxy`` is the frozen
    alignment encoder (dSprites pipelines only).
    """

    step: jnp.ndarray
    rng: jax.Array
    g: ModelVars
    d: ModelVars
    opt_g: Any
    opt_d: Any
    opt_info: Any
    e: Optional[ModelVars] = None
    pxy: Optional[ModelVars] = None
    approx: Optional[ModelVars] = None  # frozen rpqmnxy approximator (MNIST)


class EncoderTrainState(struct.PyTreeNode):
    """Single-model pretraining state (pxy encoders, approximator MLP)."""

    step: jnp.ndarray
    rng: jax.Array
    model: ModelVars
    opt: Any
