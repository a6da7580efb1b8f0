"""Checkpoint/resume via orbax (SURVEY.md §4.4, §6).

The reference saves TF1 ``Saver`` checkpoints periodically and restores the
latest; the rebuild saves the full ``TrainState`` (both param trees, both
optimizer states, the step counter) with orbax async checkpointing, keeps
the latest N, and resumes bit-exactly — restart-from-latest is also the
preemption-recovery story on TPU VMs.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over ``ocp.CheckpointManager`` for the GAN TrainState."""

    def __init__(self, directory: str, keep: int = 3, save_interval: int = 1):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, save_interval_steps=save_interval, create=True
        )
        self._mgr = ocp.CheckpointManager(self._dir, options=options)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        return self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_like`` (an abstract or
        concrete TrainState with the right shapes/shardings)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self._dir}")
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_like)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        """Block until async saves land (call before process exit)."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
