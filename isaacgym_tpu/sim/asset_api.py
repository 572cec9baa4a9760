"""Asset-introspection API parity layer (SURVEY.md §2 N3/N4 surface).

The reference queries loaded assets through ``gym.get_asset_*`` and resolves
bodies/DOFs through handle lookups (call sites:
/root/reference/tasks/joint_monkey2_new.py:237-316 — dof counts, names,
types, property arrays driving the animation ranges;
/root/reference/tasks/humanoid_interos_edit_pingpong_only_3_actor.py:438-467
— body/joint counts and ``find_asset_rigid_body_index`` for the paddle;
``create_asset_force_sensor`` at :455-460).

Here an "asset" is the compiled :class:`KinematicTree` (models/kinematics.py)
— already a frozen static-array description, so every query below is a pure
O(1)/O(n) numpy read. Handles are plain integer indices into the compiled
layout tables, exactly the contract the (B, num_bodies, 13) state arrays use.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from isaacgym_tpu.models import urdf as U
from isaacgym_tpu.models.kinematics import KinematicTree, fk_dof_frames

# Reference ``gymapi.DofType`` values (joint_monkey2_new.py:302-310 switches
# animation ranges on these).
DOF_INVALID = 0
DOF_ROTATION = 1
DOF_TRANSLATION = 2

_DOF_TYPE_STRINGS = {
    DOF_INVALID: "DOF_INVALID",
    DOF_ROTATION: "DOF_ROTATION",
    DOF_TRANSLATION: "DOF_TRANSLATION",
}


# ---------------------------------------------------------------------------
# get_asset_* family
# ---------------------------------------------------------------------------

def get_asset_rigid_body_count(asset: KinematicTree) -> int:
    return asset.n_bodies


def get_asset_rigid_body_names(asset: KinematicTree) -> List[str]:
    return list(asset.body_names)


def get_asset_rigid_body_name(asset: KinematicTree, index: int) -> str:
    return asset.body_names[index]


def find_asset_rigid_body_index(asset: KinematicTree, name: str) -> int:
    """Reference ``find_asset_rigid_body_index`` (paddle lookup,
    `...only_3_actor.py:438`); -1 when absent, matching gymapi."""
    try:
        return asset.body_index(name)
    except ValueError:
        return -1


def get_asset_dof_count(asset: KinematicTree) -> int:
    return asset.n_dof


def get_asset_dof_names(asset: KinematicTree) -> List[str]:
    return list(asset.dof_names)


def get_asset_dof_name(asset: KinematicTree, index: int) -> str:
    return asset.dof_names[index]


def get_asset_dof_type(asset: KinematicTree, index: int) -> int:
    """DOF_ROTATION for revolute/continuous, DOF_TRANSLATION for prismatic
    (reference switch at joint_monkey2_new.py:302-310)."""
    t = int(asset.dof_type[index])
    if t == U.JOINT_REVOLUTE:
        return DOF_ROTATION
    if t == U.JOINT_PRISMATIC:
        return DOF_TRANSLATION
    return DOF_INVALID


def get_dof_type_string(dof_type: int) -> str:
    """Reference ``gym.get_dof_type_string`` (joint_monkey2_new.py:300)."""
    return _DOF_TYPE_STRINGS.get(int(dof_type), "DOF_INVALID")


def get_asset_joint_count(asset: KinematicTree) -> int:
    """Number of joints incl. fixed ones — every non-root body hangs off one
    joint (reference ``get_asset_joint_count``, `...only_3_actor.py:441`)."""
    return asset.n_bodies - 1


def get_asset_joint_names(asset: KinematicTree) -> List[str]:
    """Joints named by their child body (the URDF compiler folds joint names
    into the depth-first body order; the reference only counts/prints them)."""
    return [asset.body_names[b] for b in range(asset.n_bodies)
            if int(asset.parent[b]) >= 0]


def get_asset_dof_properties(asset: KinematicTree) -> Dict[str, np.ndarray]:
    """Per-DOF property arrays with the gymapi structured-array field names
    (reference ``get_asset_dof_properties``, joint_monkey2_new.py:294 — the
    viewer reads ``lower/upper/hasLimits`` to pick animation ranges, the
    tasks write ``stiffness/damping/driveMode`` back per actor).

    Asset-level defaults: zero gains, ``driveMode`` DOF_MODE_NONE (0) — the
    actor-level drive mode/gains live on :class:`ActorSpec`
    (sim/scene.py) and are read back via
    :func:`tensor_api.get_actor_dof_properties`.
    """
    n = asset.n_dof
    has_limits = np.isfinite(asset.lower) & np.isfinite(asset.upper)
    return {
        "hasLimits": has_limits,
        "lower": np.asarray(asset.lower, np.float32).copy(),
        "upper": np.asarray(asset.upper, np.float32).copy(),
        "driveMode": np.zeros(n, np.int32),
        "velocity": np.asarray(asset.max_velocity, np.float32).copy(),
        "effort": np.asarray(asset.effort, np.float32).copy(),
        "stiffness": np.zeros(n, np.float32),
        "damping": np.asarray(asset.damping, np.float32).copy(),
        "friction": np.asarray(asset.friction, np.float32).copy(),
        "armature": np.asarray(asset.armature, np.float32).copy(),
    }


# ---------------------------------------------------------------------------
# Force sensors (reference ``create_asset_force_sensor`` +
# ``acquire_force_sensor_tensor``; `...only_3_actor.py:455-460` attaches foot
# sensors to the G1 asset before the create_actor loop).
#
# KinematicTree is a frozen compile-time record, so the sensor list rides as
# an attached attribute: every actor instanced from the asset inherits the
# sensors, and the scene-level reader resolves them to env-level body rows.
# ---------------------------------------------------------------------------

def create_asset_force_sensor(asset: KinematicTree, body_index: int,
                              local_pos=(0.0, 0.0, 0.0)) -> int:
    """Register a wrench sensor on ``body_index``; returns the sensor index
    within this asset. The point-contact model reports the body's net contact
    force at the sensor (torque zero — see tensor_api.acquire_force_sensor_
    tensor)."""
    sensors = getattr(asset, "_force_sensors", None)
    if sensors is None:
        sensors = []
        object.__setattr__(asset, "_force_sensors", sensors)
    sensors.append((int(body_index), tuple(float(x) for x in local_pos)))
    return len(sensors) - 1


def get_asset_force_sensor_count(asset: KinematicTree) -> int:
    return len(getattr(asset, "_force_sensors", ()))


def scene_force_sensor_body_indices(scene) -> np.ndarray:
    """Env-level body rows of every force sensor in the scene, in actor order
    (the reference's force-sensor tensor is ordered by actor instancing).
    Feed to :func:`tensor_api.acquire_force_sensor_tensor`."""
    rows: List[int] = []
    body_cursor = 0
    for actor in scene.spec.actors:
        for (bi, _pos) in getattr(actor.tree, "_force_sensors", ()):
            rows.append(body_cursor + bi)
        body_cursor += actor.tree.n_bodies
    return np.asarray(rows, np.int64)


# ---------------------------------------------------------------------------
# Env/actor handle helpers
# ---------------------------------------------------------------------------

def get_env_origin(sim, env_id: int = 0) -> np.ndarray:
    """Reference ``get_env_origin`` (joint_monkey2_new.py env placement).

    The reference tiles envs spatially because they share one PhysX scene;
    here each env is simulated in its own coordinates (envs never interact,
    the batch axis IS the separation), so every env's origin is the world
    origin. Returned as (3,) for call-site parity."""
    return np.zeros(3, np.float64)


def get_actor_dof_handle(sim, actor: Union[str, int], dof_index: int) -> int:
    """Env-level DOF row for ``actor``'s ``dof_index`` (reference
    ``get_actor_dof_handle`` — the handle indexes the (B, num_dofs) arrays)."""
    from isaacgym_tpu.sim.tensor_api import _dof_slice, _scene_of
    sl = _dof_slice(_scene_of(sim), actor)
    if dof_index < 0 or sl.start + dof_index >= sl.stop:
        raise IndexError(f"dof {dof_index} out of range for actor {actor!r}")
    return sl.start + dof_index


def get_dof_frame(sim, state, actor: Union[str, int], dof_index: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """World-frame origin and axis of one DOF at the current state
    (reference ``get_dof_frame``, joint_monkey2_new.py debug-axis draw).

    Returns ``(origin (B,3), axis (B,3))`` batched over envs.
    """
    import jax
    import jax.numpy as jnp
    from isaacgym_tpu.sim.tensor_api import _dof_slice, get_actor_index
    from isaacgym_tpu.utils import rotations as rot

    scene = sim.scene if hasattr(sim, "scene") else sim
    ai = get_actor_index(scene, actor)
    slot = next(s for s in scene.articulations if s.actor_index == ai)
    tree = slot.model.tree
    sl = _dof_slice(scene, actor)
    q = state.dof_pos[:, sl]
    base_pos = state.root[:, ai, 0:3]
    base_quat = state.root[:, ai, 3:7]
    pos, quat = jax.vmap(lambda bp, bq, qq: fk_dof_frames(tree, bp, bq, qq))(
        base_pos, base_quat, q)
    axis_local = jnp.asarray(tree.dof_axis[dof_index])
    axis = rot.quat_rotate(quat[:, dof_index], jnp.broadcast_to(
        axis_local, (quat.shape[0], 3)))
    return np.asarray(pos[:, dof_index]), np.asarray(axis)


# ---------------------------------------------------------------------------
# Ground plane (reference ``gym.add_ground(sim, plane_params)``)
# ---------------------------------------------------------------------------

def add_ground(spec, plane_params=None) -> None:
    """Install the ground plane on a (pre-compile) SceneSpec — the
    functional twin of ``gym.add_ground``; pass ``None`` to remove it."""
    from isaacgym_tpu.sim.scene import PlaneParams
    spec.plane = plane_params if plane_params is not None else PlaneParams()
