"""Checkpoint / resume for training — orbax-backed.

Behavioral spec (SURVEY.md section 5 "Checkpoint / resume"): the reference
resumes Lightning runs from a state-dict path (sam_train_sd21.py:12,24) and
saves accelerate `save_state` checkpoints every N steps in the TI/DreamBooth
scripts (tools/train_dreambooth_inpaint.py:266-268). Here: orbax
CheckpointManager over the TrainState pytree with retention + best-effort
async, plus save-every-N plumbing for the train loop.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Save/restore TrainState pytrees with step-based retention."""

    def __init__(self, directory: str, *, max_to_keep: int = 3,
                 save_interval_steps: int = 1000):
        self.directory = os.path.abspath(directory)
        self.save_interval_steps = save_interval_steps
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))

    def maybe_save(self, step: int, state) -> bool:
        """Save if `step` hits the interval. Returns True if saved."""
        if step % self.save_interval_steps != 0:
            return False
        self.save(step, state)
        return True

    def save(self, step: int, state) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like, step: Optional[int] = None):
        """Restore into the structure of `state_like` (same pytree)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like))

    def close(self):
        self._mgr.close()


def save_params(path: str, params) -> None:
    """One-shot param-tree save (inference checkpoints)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def load_params(path: str, params_like):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), params_like)
