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
"""

from __future__ import annotations

import os
from typing import Any

from flax import serialization

__all__ = ["save_pytree", "restore_pytree", "save_model", "restore_model", "latest_step"]


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


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


def latest_step(directory: str, prefix: str, suffix: str = ".ckpt") -> int:
    """Find the newest saved step for ``prefix_%d%suffix`` files; -1 if none."""
    best = -1
    if not os.path.isdir(directory):
        return best
    for name in os.listdir(directory):
        if name.startswith(prefix + "_") and name.endswith(suffix):
            middle = name[len(prefix) + 1 : -len(suffix)]
            if middle.isdigit():
                best = max(best, int(middle))
    return best
