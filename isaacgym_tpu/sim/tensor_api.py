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

import jax.numpy as jnp

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


def acquire_force_sensor_tensor(sim: Simulator, state: SimState, body_indices) -> jnp.ndarray:
    """(B, n_sensors, 6) wrench readings at the given env-level body indices:
    [force(3), torque(3)] — torque reported as zero (point-contact model;
    the reference's foot force sensors read forces only in practice)."""
    forces = state.net_contact_force[:, jnp.asarray(body_indices), :]
    return jnp.concatenate([forces, jnp.zeros_like(forces)], axis=-1)


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
