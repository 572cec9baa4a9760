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
    """Save a train-state pytree.

    Multi-process safe for the rank-0-only save pattern the launcher uses
    (train.py, mirroring the reference's rank-0 gating at
    /root/reference/train.py:180-183): PPOTrainState leaves are replicated
    over the global mesh under ``jax.distributed``, which makes them
    non-fully-addressable on any single process — orbax would refuse (or
    deadlock waiting for the other ranks). Fully-replicated leaves carry the
    whole value on every process, so materialize them to host numpy first."""
    import jax
    import numpy as np

    def to_host(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x)  # legal iff fully replicated; else raises
        return x

    state = jax.tree.map(to_host, state)
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore(path: str, template: Any) -> Any:
    """Restore onto the *current* platform regardless of where the checkpoint
    was saved (a TPU-saved checkpoint restores on CPU and vice versa): each
    leaf is given an explicit single-device sharding on the local default
    device, overriding any device metadata stored alongside the arrays."""
    import jax
    import numpy as np

    path = os.path.abspath(path)
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def _args(leaf):
        if isinstance(leaf, (jax.Array, np.ndarray)):
            return ocp.ArrayRestoreArgs(sharding=sharding)
        return ocp.RestoreArgs()

    restore_args = jax.tree_util.tree_map(_args, template)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path, item=template, restore_args=restore_args)
