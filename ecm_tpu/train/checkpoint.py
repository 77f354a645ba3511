"""Checkpoint / resume via orbax (replaces the reference's per-epoch
``torch.save({'epoch', 'state_dict', 'train_loss'}, 'checkpoint_%d.tar')`` +
``--loadmodel`` weights-only resume — SURVEY.md section 5).

Improvements over the reference (build-quality requirements, SURVEY.md
section 5): the FULL TrainState is saved (params + optimizer state + step +
batch_stats), saves are async and multi-host-safe, and a keep-N policy bounds
disk. ``restore_latest`` gives crash auto-resume (the reference's answer to
failure recovery is "rerun by hand").
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def make_manager(directory: str, keep: int = 5) -> ocp.CheckpointManager:
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep, create=True, enable_async_checkpointing=True
    )
    return ocp.CheckpointManager(directory, options=options)


def save(manager: ocp.CheckpointManager, step: int, state: Any) -> None:
    manager.save(step, args=ocp.args.StandardSave(state))


def restore_latest(manager: ocp.CheckpointManager, template: Any) -> tuple[Any, int]:
    """Restore the newest checkpoint into ``template``'s structure.

    Returns (state, step); (template, 0) if no checkpoint exists.
    """
    step = manager.latest_step()
    if step is None:
        return template, 0
    state = manager.restore(step, args=ocp.args.StandardRestore(template))
    return state, int(step)


def wait(manager: ocp.CheckpointManager) -> None:
    manager.wait_until_finished()
