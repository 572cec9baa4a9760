"""Tensor-API parity layer (SURVEY.md §2 N2, §1 L1).

The reference exposes simulator state through zero-copy GPU buffers with a
specific acquire/refresh/set surface (``gymtorch`` interop; call sites at
/root/reference/tasks/humanoid_pingpong_3_actor_tilt_no_earlystop.py:127-146,
859-866,988-989). In the functional TPU design the state IS a jnp PyTree, so
"acquire" returns views of the batched arrays, "refresh" is a no-op (the
state is always current), and every indexed setter is a pure functional
update returning a new state. Layout contracts match the reference exactly:

  root state  (B, num_actors, 13) = pos(3)+quat(4,xyzw)+linvel(3)+angvel(3)
  dof state   (B, num_dofs, 2)    = pos, vel
  rigid body  (B, num_bodies, 13)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Union

import jax.numpy as jnp
import numpy as np

from isaacgym_tpu.sim.scene import CompiledScene, SceneSpec
from isaacgym_tpu.sim.simulator import SimState, Simulator


# ---------------------------------------------------------------------------
# acquire_* (views; reference acquire_*_tensor)
# ---------------------------------------------------------------------------

def acquire_actor_root_state_tensor(state: SimState) -> jnp.ndarray:
    """(B, num_actors, 13) root-state view."""
    return state.root


def acquire_dof_state_tensor(state: SimState) -> jnp.ndarray:
    """(B, num_dofs, 2) = stacked (pos, vel), reference layout."""
    return jnp.stack([state.dof_pos, state.dof_vel], axis=-1)


def acquire_rigid_body_state_tensor(sim: Simulator, state: SimState) -> jnp.ndarray:
    """(B, num_bodies, 13) rigid-body states (computed FK view)."""
    return sim.rigid_body_states(state)


def acquire_dof_force_tensor(state: SimState) -> jnp.ndarray:
    """(B, num_dofs) applied joint drive torques
    (``enable_actor_dof_force_sensors`` capability)."""
    return state.dof_force


def acquire_net_contact_force_tensor(state: SimState) -> jnp.ndarray:
    """(B, num_bodies, 3) per-body net contact force over the last step."""
    return state.net_contact_force


def acquire_force_sensor_tensor(sim: Simulator, state: SimState,
                                body_indices=None) -> jnp.ndarray:
    """(B, n_sensors, 6) wrench readings: [force(3), torque(3)] — the torque
    lanes carry the contact-moment sum about the sensor body's frame origin
    (``state.net_contact_torque``; exact on the XLA path and the fused
    single-articulation kernel, zero on the multi/floating fused kernels —
    docs/PARITY.md). ``body_indices`` are env-level body rows; default:
    every sensor registered via ``create_asset_force_sensor``
    (sim/asset_api.py), in actor order — the reference's tensor ordering."""
    if body_indices is None:
        from isaacgym_tpu.sim.asset_api import scene_force_sensor_body_indices
        body_indices = scene_force_sensor_body_indices(sim.scene)
    forces = state.net_contact_force[:, jnp.asarray(body_indices), :]
    torques = state.net_contact_torque[:, jnp.asarray(body_indices), :]
    return jnp.concatenate([forces, torques], axis=-1)


def acquire_camera_image_tensor(camera, sim: Simulator, state: SimState,
                                image_type: str = "depth"):
    """Render a camera sensor over the batched state (reference
    ``gym.get_camera_image`` IMAGE_DEPTH / IMAGE_COLOR / IMAGE_SEGMENTATION;
    cameras exist behind the task yamls' ``enableCameraSensors`` key).
    image_type: "depth" (B,H,W) | "rgb" (B,H,W,3) | "seg" (B,H,W)."""
    return camera.render(sim, state)[image_type]


def refresh_all(state: SimState) -> SimState:
    """``refresh_*_tensor`` family: the functional state is always current."""
    return state


# Named refresh aliases for call-site parity (reference refresh calls at
# `...only_3_actor.py:141-146`): each is the identity — the PyTree state
# never goes stale.
refresh_actor_root_state_tensor = refresh_all
refresh_dof_state_tensor = refresh_all
refresh_rigid_body_state_tensor = refresh_all
refresh_dof_force_tensor = refresh_all
refresh_net_contact_force_tensor = refresh_all
refresh_force_sensor_tensor = refresh_all


# ---------------------------------------------------------------------------
# set_* (functional indexed writers; reference set_*_indexed)
# ---------------------------------------------------------------------------

def set_actor_root_state_tensor_indexed(state: SimState, values, env_ids,
                                        actor_ids=None) -> SimState:
    """Replace root states of ``actor_ids`` (default: all) in ``env_ids``."""
    if actor_ids is None:
        root = state.root.at[jnp.asarray(env_ids)].set(values)
    else:
        root = state.root.at[jnp.ix_(jnp.asarray(env_ids), jnp.asarray(actor_ids))].set(values)
    return state._replace(root=root)


def set_dof_state_tensor_indexed(state: SimState, dof_pos, dof_vel, env_ids) -> SimState:
    ids = jnp.asarray(env_ids)
    return state._replace(
        dof_pos=state.dof_pos.at[ids].set(dof_pos),
        dof_vel=state.dof_vel.at[ids].set(dof_vel),
    )


def set_dof_position_target_tensor(targets) -> jnp.ndarray:
    """PD targets are inputs to ``Simulator.step`` in the functional design;
    returned unchanged for call-site parity."""
    return targets


def set_dof_actuation_force_tensor(efforts) -> jnp.ndarray:
    """Direct torques are inputs to ``Simulator.step`` (DRIVE_EFFORT)."""
    return efforts


def set_rigid_linear_velocity(state: SimState, actor_index: int, velocity) -> SimState:
    """Set a free actor's linear velocity across all envs (reference
    ``set_rigid_linear_velocity`` on the ball)."""
    return state._replace(root=state.root.at[:, actor_index, 7:10].set(jnp.asarray(velocity)))


def set_rigid_angular_velocity(state: SimState, actor_index: int, velocity) -> SimState:
    """Angular twin of the above (reference ``set_rigid_angular_velocity``,
    /root/reference/tasks/joint_monkey2_new.py ball spin-up)."""
    return state._replace(root=state.root.at[:, actor_index, 10:13].set(jnp.asarray(velocity)))


def set_actor_root_state_tensor(state: SimState, values) -> SimState:
    """Non-indexed root-state write: replace ALL actors' roots in all envs
    (reference ``set_actor_root_state_tensor``, 3 call sites)."""
    return state._replace(root=jnp.broadcast_to(jnp.asarray(values), state.root.shape))


# ---------------------------------------------------------------------------
# Handle/introspection surface (reference gymapi handles + DOMAIN_SIM indices;
# call sites e.g. /root/reference/tasks/humanoid_interos_edit_pingpong_only_3_actor.py:
# 520-626 get_actor_index/get_rigid_handle,
# /root/reference/tasks/joint_monkey2_new.py:294-316 dof/shape props).
# Every env shares one compiled layout, so "env handle + actor handle" folds
# to the per-env actor index; DOMAIN_SIM flattening is the caller's
# ``env_id * num_actors + actor_index``.
# ---------------------------------------------------------------------------

def _scene_of(obj: Union[Simulator, CompiledScene]) -> CompiledScene:
    return obj.scene if isinstance(obj, Simulator) else obj


def get_actor_index(sim: Union[Simulator, CompiledScene], actor: Union[str, int]) -> int:
    """Per-env actor index by name (reference ``get_actor_index(env, h,
    DOMAIN_ENV)``; DOMAIN_SIM = ``env_id * num_actors + this``)."""
    scene = _scene_of(sim)
    return actor if isinstance(actor, int) else scene.actor_names.index(actor)


def get_actor_rigid_body_names(sim, actor) -> List[str]:
    scene = _scene_of(sim)
    ai = get_actor_index(scene, actor)
    prefix = scene.actor_names[ai] + "/"
    return [n[len(prefix):] for n in scene.body_names if n.startswith(prefix)]


def get_rigid_handle(sim, actor, body_name: str) -> int:
    """Env-level body index for ``actor/body_name`` (reference
    ``get_rigid_handle`` / ``find_actor_rigid_body_handle`` — both resolve a
    body within one actor; here the handle IS the row into the (B, num_bodies,
    13) rigid-body state / net-contact-force arrays)."""
    scene = _scene_of(sim)
    ai = get_actor_index(scene, actor)
    return scene.body_names.index(scene.actor_names[ai] + "/" + body_name)


find_actor_rigid_body_handle = get_rigid_handle
find_actor_rigid_body_index = get_rigid_handle


def _dof_slice(scene: CompiledScene, actor) -> slice:
    ai = get_actor_index(scene, actor)
    for slot in scene.articulations:
        if slot.actor_index == ai:
            return slice(slot.dof_start, slot.dof_end)
    raise ValueError(f"actor {actor!r} has no DOFs")


def set_actor_dof_states(state: SimState, sim, actor, dof_pos, dof_vel,
                         env_ids=None) -> SimState:
    """Per-actor DOF write (reference ``set_actor_dof_states(env, handle,
    states, STATE_ALL)``, joint_monkey2_new.py:471-472): only the actor's DOF
    slice is touched; other actors' DOFs are preserved."""
    sl = _dof_slice(_scene_of(sim), actor)
    if env_ids is None:
        return state._replace(
            dof_pos=state.dof_pos.at[:, sl].set(dof_pos),
            dof_vel=state.dof_vel.at[:, sl].set(dof_vel),
        )
    ids = jnp.asarray(env_ids)
    return state._replace(
        dof_pos=state.dof_pos.at[ids, sl].set(dof_pos),
        dof_vel=state.dof_vel.at[ids, sl].set(dof_vel),
    )


# ---------------------------------------------------------------------------
# Rigid-shape / DOF property getters + setters.
#
# The reference mutates these through handles inside ``_create_envs`` (setup
# time, before the first ``simulate``; e.g. `...only_3_actor.py:560-626`
# restitution/friction, `joint_monkey2_new.py:294-316` PD gains) and through
# the DR engine at reset. Here the same split is explicit:
#   * setup time  -> mutate the ``ActorSpec`` in the (pre-compile) SceneSpec;
#   * runtime     -> per-env scale factors on the DRParams channel that the
#                    jitted step already consumes (env/randomize.py).
# ---------------------------------------------------------------------------

@dataclass
class RigidShapeProperties:
    """Reference ``gymapi.RigidShapeProperties`` subset the tasks touch."""
    friction: float
    restitution: float


def get_actor_rigid_shape_properties(sim, actor) -> List[RigidShapeProperties]:
    """One entry per collision geom of the actor (reference returns a list of
    shape-property structs of the same length)."""
    scene = _scene_of(sim)
    ai = get_actor_index(scene, actor)
    art = {slot.actor_index: i for i, slot in enumerate(scene.articulations)}
    props: List[RigidShapeProperties] = []
    if ai in art:
        for g in scene.art_geoms:
            if g.art_index == art[ai]:
                props.append(RigidShapeProperties(g.friction, g.restitution))
    for g in scene.static_geoms:
        if g.actor_index == ai:
            props.append(RigidShapeProperties(g.friction, g.restitution))
    for fb in scene.free_bodies:
        if fb.actor_index == ai:
            props.append(RigidShapeProperties(fb.friction, fb.restitution))
    return props


def set_actor_rigid_shape_properties(spec: SceneSpec, actor,
                                     props: List[RigidShapeProperties]) -> None:
    """Setup-time setter on the pre-compile ``SceneSpec`` (the reference's
    call sites all run inside ``_create_envs`` before the sim starts). The
    actor-wide material is uniform across its geoms, so the first entry wins
    (the reference sets every entry to the same value at each call site)."""
    names = [a.name for a in spec.actors]
    ai = actor if isinstance(actor, int) else names.index(actor)
    spec.actors[ai].friction = float(props[0].friction)
    spec.actors[ai].restitution = float(props[0].restitution)


def get_actor_dof_properties(sim, actor) -> Dict[str, np.ndarray]:
    """Reference ``get_actor_dof_properties`` structured array, as a dict of
    per-DOF arrays with the gymapi field names."""
    scene = _scene_of(sim)
    ai = get_actor_index(scene, actor)
    for slot in scene.articulations:
        if slot.actor_index == ai:
            tree = slot.model.tree
            n = tree.n_dof
            return {
                "driveMode": np.full(n, slot.drive_mode, np.int32),
                "stiffness": np.asarray(slot.stiffness, np.float32).copy(),
                "damping": np.asarray(slot.damping, np.float32).copy(),
                "lower": np.asarray(tree.lower, np.float32).copy(),
                "upper": np.asarray(tree.upper, np.float32).copy(),
                "effort": np.asarray(tree.effort, np.float32).copy(),
                "velocity": np.asarray(tree.max_velocity, np.float32).copy(),
                "armature": np.asarray(slot.model.armature[-n:], np.float32).copy(),
            }
    raise ValueError(f"actor {actor!r} has no DOFs")


def set_actor_dof_properties(spec: SceneSpec, actor, props: Dict) -> None:
    """Setup-time setter (reference ``set_actor_dof_properties`` in the
    create loops): installs PD gains / drive mode on the ``ActorSpec``."""
    names = [a.name for a in spec.actors]
    ai = actor if isinstance(actor, int) else names.index(actor)
    a = spec.actors[ai]
    if "stiffness" in props:
        a.stiffness = np.asarray(props["stiffness"], np.float32)
    if "damping" in props:
        a.damping = np.asarray(props["damping"], np.float32)
    if "driveMode" in props:
        a.drive_mode = int(np.asarray(props["driveMode"]).reshape(-1)[0])


def runtime_shape_property_scales(sim: Simulator, dr, actor,
                                  friction=None, restitution=None):
    """Runtime per-env material change for an articulated actor, expressed on
    the DR channel the jitted step consumes (``dr.friction_scale`` /
    ``dr.restitution_scale`` multiply the actor's compiled base values).
    ``friction``/``restitution`` are scalars or (B,) arrays of ABSOLUTE
    values; returns the updated DRParams pytree."""
    base = get_actor_rigid_shape_properties(sim, actor)[0]
    if friction is not None:
        dr = dr._replace(friction_scale=jnp.broadcast_to(
            jnp.asarray(friction, jnp.float32) / max(base.friction, 1e-9),
            dr.friction_scale.shape))
    if restitution is not None:
        dr = dr._replace(restitution_scale=jnp.broadcast_to(
            jnp.asarray(restitution, jnp.float32) / max(base.restitution, 1e-9),
            dr.restitution_scale.shape))
    return dr


def runtime_dof_property_scales(sim: Simulator, dr, actor,
                                stiffness=None, damping=None):
    """Runtime per-env PD-gain change via the DR channel (``dr.kp_scale`` /
    ``dr.kd_scale`` multiply the compiled slot gains). Values are ABSOLUTE
    per-DOF gains, scalar or (B, n_dof); zero base gains stay zero."""
    scene = sim.scene
    sl = _dof_slice(scene, actor)
    ai = get_actor_index(scene, actor)
    slot = next(s for s in scene.articulations if s.actor_index == ai)
    if stiffness is not None:
        base = np.where(slot.stiffness > 0, slot.stiffness, 1.0)
        scale = jnp.asarray(stiffness, jnp.float32) / base
        dr = dr._replace(kp_scale=dr.kp_scale.at[:, sl].set(
            jnp.broadcast_to(scale, dr.kp_scale[:, sl].shape)))
    if damping is not None:
        base = np.where(slot.damping > 0, slot.damping, 1.0)
        scale = jnp.asarray(damping, jnp.float32) / base
        dr = dr._replace(kd_scale=dr.kd_scale.at[:, sl].set(
            jnp.broadcast_to(scale, dr.kd_scale[:, sl].shape)))
    return dr
