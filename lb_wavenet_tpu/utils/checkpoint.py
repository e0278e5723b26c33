"""Checkpoint save/restore via orbax.

Reference parity: the reference used `tf.train.Saver` — periodic save during
training, restore both to resume training and to load params for generation
(SURVEY.md §2.1, §5). Build realization: orbax-checkpoint with async save,
atomic finalize, auto-resume from latest; checkpoints are sharding-agnostic
(restore targets whatever shardings the caller's template carries, so
restoring onto a different mesh works).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import orbax.checkpoint as ocp


def make_manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, enable_async_checkpointing=True
        ),
    )


def save(manager: ocp.CheckpointManager, state, step: int) -> None:
    manager.save(step, args=ocp.args.StandardSave(state))


def _abstract_like(state) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=getattr(x, "sharding", None)
        )
        if hasattr(x, "shape")
        else x,
        state,
    )


def restore_if_available(
    manager: ocp.CheckpointManager, state
) -> Tuple[Any, int]:
    """Restore latest checkpoint onto `state`'s shardings, or return as-is.

    Returns (state, start_step).
    """
    latest = manager.latest_step()
    if latest is None:
        return state, 0
    restored = manager.restore(
        latest, args=ocp.args.StandardRestore(_abstract_like(state))
    )
    return restored, latest


def restore_params(
    directory: str, state_template, prefer_ema: bool = False
) -> Any:
    """Generation path: load the latest training state, return params only.

    prefer_ema returns the EMA copy of the params (TrainConfig.ema_decay > 0
    runs carry one in the state); it is an error if the checkpoint has none.
    """
    manager = make_manager(directory)
    latest = manager.latest_step()
    if latest is None:
        raise FileNotFoundError(f"No checkpoint under {directory}")
    restored = manager.restore(
        latest, args=ocp.args.StandardRestore(_abstract_like(state_template))
    )
    get = (
        (lambda k: getattr(restored, k))
        if hasattr(restored, "params")
        else restored.__getitem__
    )
    if prefer_ema:
        ema = get("ema")
        if not ema:
            raise ValueError(
                f"Checkpoint under {directory} carries no EMA params "
                "(train with train.ema_decay > 0)"
            )
        return ema
    return get("params")
