"""Checkpoint/resume via orbax (SURVEY.md §5.4 rebuild gap).

The reference saves parameters every epoch but has NO resume logic anywhere
(train_efm.py:289-290, mx.callback.do_checkpoint at mutli_gpu_v3.py:160-162);
checkpoints double as its serving/export format. Here: full train state
(params + optimizer state + BN stats + step) checkpoints with retention and
latest-step restore; the serving export format lives in serve/export.py.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    """Thin orbax CheckpointManager wrapper for TrainState pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(int(step), args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        """Restore into the structure of ``state_template`` (a concrete state
        built the same way as at save time)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, state_template
        )
        return self._mgr.restore(int(step), args=ocp.args.StandardRestore(abstract))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
