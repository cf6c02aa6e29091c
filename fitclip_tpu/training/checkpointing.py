"""Checkpoint save/restore built on Orbax (the reference's PL ModelCheckpoint
-> SURVEY §5.4). State is a pytree (TrainState or bare params)."""

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, force: bool = True) -> None:
    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, state, force=force)
    checkpointer.wait_until_finished()


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    if template is not None:
        return checkpointer.restore(path, template)
    return checkpointer.restore(path)
