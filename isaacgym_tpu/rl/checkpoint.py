"""Checkpoint/resume via orbax (SURVEY.md §5.4).

The reference delegates to rl_games (periodic saves, ``cfg.checkpoint``
restore at /root/reference/train.py:107-108,213). Here the whole
``PPOTrainState`` — params, optimizer, normalizers, rng, epoch — is one
pytree; env state is equally checkpointable by the caller since it is a pure
array tree (the reference could not checkpoint env state at all).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def save(path: str, state: Any) -> None:
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore(path: str, template: Any) -> Any:
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path, item=template)
