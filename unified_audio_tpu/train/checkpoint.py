"""Checkpoint save/resume via orbax (replaces Lightning ckpt handling,
UniSE model.py:162-168, 321-325, train.py:38).

Matches the reference's key API detail: UniSE checkpoints contain ONLY the LM
(sft) params — tokenizer/SSL weights are excluded (model.py:82-91) and loaded
separately.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory, max_to_keep: int = 5):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, params, opt_state=None,
             extra: Optional[Dict] = None, block: bool = True):
        """Save a checkpoint. With ``block=False`` the write runs on orbax's
        background thread and overlaps the next training steps (device
        arrays are snapshotted at call time); call :meth:`wait` — or any
        later ``save``/``restore`` — to join it."""
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        if extra:
            state["extra"] = extra
        self.manager.save(step, args=ocp.args.StandardSave(state))
        if block:
            self.manager.wait_until_finished()

    def wait(self):
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, step: Optional[int] = None, template=None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        if template is not None:
            return self.manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self.manager.restore(step)
