"""Orbax-backed train-state checkpointing (production option).

The default checkpoint path (:mod:`eadgan_tpu.train.checkpoint`) writes
flax-msgpack files under the reference filename contract.  For
large-scale runs this module offers orbax's managed checkpointing on
top of the same train-state pytrees: atomic directory commits, retained
step history, and async saves that overlap serialization with the next
training steps.
"""

from __future__ import annotations

from typing import Any, Optional

__all__ = ["OrbaxCheckpointer"]


class OrbaxCheckpointer:
    """Thin wrapper over ``orbax.checkpoint.CheckpointManager`` for the
    framework's train states."""

    def __init__(self, directory: str, max_to_keep: int = 3, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, enable_async_checkpointing=async_save
        )
        import os

        self._manager = ocp.CheckpointManager(
            os.path.abspath(directory), options=options
        )

    def save(self, step: int, state: Any) -> None:
        """Queue an (optionally async) save of the full train state."""
        self._manager.save(step, args=self._ocp.args.StandardSave(state))

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``template`` (latest step when
        ``step`` is None)."""
        if step is None:
            step = self._manager.latest_step()
        if step is None:
            raise FileNotFoundError("no orbax checkpoints found")
        return self._manager.restore(
            step, args=self._ocp.args.StandardRestore(template)
        )

    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def wait(self) -> None:
        """Block until queued async saves are durable."""
        self._manager.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._manager.close()
