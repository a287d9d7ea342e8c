"""Orbax checkpointing for training runs.

The reference's only persistence is scenario-level rosbags
(SURVEY.md §5 "Checkpoint / resume"); here a training run checkpoints the
full (TrainState, WorldState, rng) pytree with orbax — the standard JAX
checkpoint format, safe across pod restarts and sharding layouts.  The
lighter npz path for single WorldState snapshots lives in eval/recorder.py.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, tree: Any) -> None:
    """Write a pytree checkpoint (TrainState / WorldState / anything)."""
    _ckptr().save(os.path.abspath(path), tree, force=True)


def restore(path: str, like: Optional[Any] = None) -> Any:
    """Read a checkpoint; ``like`` restores into matching shardings/dtypes."""
    import orbax.checkpoint as ocp

    if like is None:
        return _ckptr().restore(os.path.abspath(path))
    return _ckptr().restore(
        os.path.abspath(path), restore_args=ocp.checkpoint_utils.construct_restore_args(like)
    )


def save_every(step: int, interval: int, path: str, tree: Any) -> bool:
    """Checkpoint when ``step`` crosses an interval boundary; returns True
    when a checkpoint was written (convenience for training loops)."""
    if interval <= 0 or step % interval:
        return False
    save(f"{path}-{step}", tree)
    return True
