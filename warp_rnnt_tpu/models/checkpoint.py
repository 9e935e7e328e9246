"""Checkpoint/restore helpers for the model tier (orbax-backed).

The reference is a stateless loss op with no checkpointing (SURVEY §5);
training systems built on this framework need it, so the model tier ships
simple save/restore for (params, opt_state, step) pytrees.  Works with
sharded arrays on a mesh (orbax handles distributed save/restore).
"""

from __future__ import annotations

import pathlib
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_checkpoint(path, params, opt_state=None, step: int = 0):
    """Save a training state under `path` (created if needed)."""
    path = pathlib.Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    state = {"params": params, "step": step}
    if opt_state is not None:
        state["opt_state"] = opt_state
    ckptr.save(path / f"step_{step}", state, force=True)
    ckptr.wait_until_finished()
    return path / f"step_{step}"


def latest_step(path) -> Optional[int]:
    path = pathlib.Path(path)
    steps = [
        int(p.name.split("_", 1)[1])
        for p in path.glob("step_*")
        if p.name.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_checkpoint(path, template: Any, step: Optional[int] = None):
    """Restore a state saved by `save_checkpoint`.

    `template` is a pytree with the target structure/shardings (e.g. the
    freshly-initialized state); returns the restored pytree.
    """
    path = pathlib.Path(path).absolute()
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path / f"step_{step}", template)
