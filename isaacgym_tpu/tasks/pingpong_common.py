"""Shared observation builders + scene helpers for the pingpong family.

Pure single-env jnp ports of the reference TorchScript obs functions
(compute_humanoid_observations / compute_pingpong_observations at
/root/reference/tasks/humanoid_pingpong_3_actor_tilt_no_earlystop.py:1748-1816)
and the common 3-actor scene construction (create_sim/_create_envs,
SURVEY.md §3.1). All functions take unbatched arrays; the env base vmaps.
"""

from __future__ import annotations

import os
import numpy as np
import jax.numpy as jnp

from isaacgym_tpu.models import kinematics as K
from isaacgym_tpu.models.assets import generate
from isaacgym_tpu.sim.scene import ActorSpec, PlaneParams, SceneSpec, DRIVE_POS
from isaacgym_tpu.utils import rotations as rot

ASSET_DIR = generate.ASSET_DIR

_tree_cache = {}


def load_tree(filename: str, floating_base: bool = False) -> K.KinematicTree:
    key = (filename, floating_base)
    if key not in _tree_cache:
        path = os.path.join(ASSET_DIR, filename)
        if not os.path.exists(path):
            generate.generate_all()
        _tree_cache[key] = K.load_asset(path, floating_base=floating_base)
    return _tree_cache[key]


def quat_from_yaw_deg(deg: float):
    half = np.radians(deg) / 2.0
    return (0.0, 0.0, float(np.sin(half)), float(np.cos(half)))


def build_pingpong_scene(env_cfg, sim_cfg, *, humanoids=1, floating_base=False) -> SceneSpec:
    """The 3-actor (or 4-actor) scene: humanoid(s) + table + ball.

    Mirrors the reference per-env create_actor loop
    (/root/reference/tasks/humanoid_pingpong_3_actor_tilt_no_earlystop.py:517-649)
    as a static declaration.
    """
    sc = env_cfg["scene"]
    g1 = load_tree(env_cfg["asset"]["assetFileName"], floating_base=floating_base)
    table = load_tree("pingpong_table.urdf")
    ball = load_tree("small_ball.urdf")
    kp = np.asarray(sc["pdGains"], np.float32)
    kd = kp / 40.0

    actors = []
    for h in range(humanoids):
        pos = sc["humanoidPos"] if h == 0 else sc["humanoid2Pos"]
        yaw = sc.get("humanoidYawDeg", 0.0) if h == 0 else sc.get("humanoid2YawDeg", 180.0)
        actors.append(ActorSpec(
            name=f"humanoid{h + 1}", tree=g1, pos=tuple(pos),
            quat=quat_from_yaw_deg(yaw),
            fixed_base=not floating_base,
            restitution=sc["humanoidRestitution"], friction=sc["humanoidFriction"],
            drive_mode=DRIVE_POS, stiffness=kp, damping=kd,
            # reference: asset_options.max_angular_velocity = 100.0
            # (…tilt_no_earlystop.py:417 and every other task in the family)
            max_angular_velocity=100.0,
        ))
    actors.append(ActorSpec(
        name="pingpong_table", tree=table, pos=tuple(sc["tablePos"]),
        fixed_base=True, restitution=sc["tableRestitution"], friction=sc["tableFriction"],
    ))
    ball_aero = env_cfg.get("ball", {}) or {}
    actors.append(ActorSpec(
        name="pingpong_ball_2", tree=ball, pos=tuple(sc["ballStartPos"]),
        fixed_base=False, restitution=sc["ballRestitution"], friction=sc["ballFriction"],
        # opt-in aero extension (ball.dragCoefficient / magnusCoefficient,
        # default 0 = reference parity; PhysX has no aerodynamics)
        drag_coefficient=float(ball_aero.get("dragCoefficient", 0.0)),
        magnus_coefficient=float(ball_aero.get("magnusCoefficient", 0.0)),
    ))
    plane_cfg = env_cfg.get("plane", {})
    # heightfield terrain from an npy path (reference plane.terrain key +
    # _create_trimesh, .../no_earlystop.py:359-377); self.terrain is None in
    # the reference tasks, so this is opt-in here too
    terrain = None
    terrain_path = plane_cfg.get("terrain")
    if terrain_path and os.path.exists(str(terrain_path)):
        from isaacgym_tpu.models.terrain import Heightfield
        raw = np.load(str(terrain_path)).T
        terrain = Heightfield.from_raw(
            raw,
            horizontal_scale=float(plane_cfg.get("horizontal_scale", 0.015)),
            vertical_scale=0.75 if env_cfg.get("is_g1") else 1.0,
            transform_x=float(plane_cfg.get("transform_x", 0.0)),
            transform_y=float(plane_cfg.get("transform_y", 0.0)),
        )
    return SceneSpec(
        actors=actors,
        # linkCollision stays opt-in: PhysX default collision filtering
        # disables self-collision within an articulation unless the asset
        # asks for it (the reference never does), so OFF is parity.
        link_collision=bool(sc.get("linkCollision",
                                   env_cfg.get("linkCollision", False))),
        # exactLinkSupport defaults ON (round 5): PhysX runs exact convex
        # narrowphase unconditionally (gym.simulate,
        # /root/reference/tasks/joint_monkey2_new.py:626), so bounding-sphere
        # link-vs-static contact was a fidelity gap — the paddle contacted
        # the table through an 80 mm sphere. Opt out per task with
        # scene.exactLinkSupport: false.
        exact_link_support=bool(sc.get("exactLinkSupport",
                                       env_cfg.get("exactLinkSupport", True))),
        terrain=terrain,
        plane=PlaneParams(
            static_friction=plane_cfg.get("staticFriction", 1.0),
            dynamic_friction=plane_cfg.get("dynamicFriction", 1.0),
            restitution=plane_cfg.get("restitution", 0.0),
        ),
        gravity=tuple(sim_cfg.get("gravity", (0.0, 0.0, -9.81))),
        dt=float(sim_cfg["dt"]),
        substeps=int(sim_cfg["substeps"]),
        bounce_threshold_velocity=float(
            sim_cfg.get("physx", {}).get("bounce_threshold_velocity", 0.2)),
        max_depenetration_velocity=float(
            sim_cfg.get("physx", {}).get("max_depenetration_velocity", 10.0)),
    )


def sample_ball_velocity(key, speed_range, tilt_range_deg, tilt_z_range_deg):
    """Batched-RNG replacement for the reference's per-env host loop
    (generate_random_speed_for_ball, .../no_earlystop.py:301-328):
    v = (-s·cosα·cosβ, s·sinα·cosβ, s·sinβ), α=tilt, β=tilt_z."""
    import jax
    k1, k2, k3 = jax.random.split(key, 3)
    s = jax.random.uniform(k1, (), minval=speed_range[0], maxval=speed_range[1])
    a = jnp.radians(jax.random.uniform(k2, (), minval=tilt_range_deg[0], maxval=tilt_range_deg[1]))
    b = jnp.radians(jax.random.uniform(k3, (), minval=tilt_z_range_deg[0], maxval=tilt_z_range_deg[1]))
    return jnp.stack([
        -s * jnp.cos(a) * jnp.cos(b),
        s * jnp.sin(a) * jnp.cos(b),
        s * jnp.sin(b),
    ])


def compute_humanoid_observations(body_states, body_ids, dof_pos, dof_vel):
    """Heading-local body pos/vel + dof state, reference layout
    (.../no_earlystop.py:1777-1816): [local_body_pos (J*3), local_body_vel
    (J*3), dof_pos, dof_vel*0.1]. ``body_ids=None`` means the rows are
    already the selected subset (row 0 = root)."""
    if body_ids is not None:
        body_states = body_states[body_ids]
    body_pos = body_states[:, 0:3]
    body_rot = body_states[:, 3:7]
    body_vel = body_states[:, 7:10]
    root_pos = body_pos[0]
    root_rot = body_rot[0]
    heading_inv = rot.calc_heading_quat_inv(root_rot)
    local_pos = rot.quat_rotate(heading_inv, body_pos - root_pos)
    local_vel = rot.quat_rotate(heading_inv, body_vel)
    return jnp.concatenate([
        local_pos.reshape(-1), local_vel.reshape(-1), dof_pos, dof_vel * 0.1,
    ])


def compute_pingpong_observations(body_states, body_ids, ball_root):
    """Heading-local ball position/velocity relative to the root body
    (.../no_earlystop.py:1748-1774). ``body_ids=None``: rows pre-selected."""
    if body_ids is not None:
        body_states = body_states[body_ids]
    root_pos = body_states[0, 0:3]
    root_rot = body_states[0, 3:7]
    heading_inv = rot.calc_heading_quat_inv(root_rot)
    local_pos = rot.quat_rotate(heading_inv, ball_root[0:3] - root_pos)
    local_vel = rot.quat_rotate(heading_inv, ball_root[7:10])
    return jnp.concatenate([local_pos, local_vel])
