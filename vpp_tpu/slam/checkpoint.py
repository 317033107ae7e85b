"""Checkpoint / resume for SLAM + tracker state.

The reference has none (SURVEY §5.4 — all state is in-memory ctx structs);
a production TPU SLAM engine needs durable keyframe/map state. Any pytree
(BAProblem, PoseGraph, VideoExtruderState, HoughTrackerState, …) round-
trips through orbax; static dataclass fields survive because the trees are
flax/NamedTuple structures rebuilt by the caller's target.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_state(path: str, state: Any) -> None:
    """Durably write a pytree checkpoint (orbax)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_state(path: str, target: Any) -> Any:
    """Restore into the shape/dtype structure of ``target``."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)
