"""Draft 5-actor task — two robots, two balls, force control (SURVEY.md C11;
unregistered in the reference).

TPU-native re-implementation of /root/reference/tasks/humanoid_pingpong.py:
5 actors per env [robot1, robot2, table, ball1, ball2] (:122), two 26-DOF G1s
(waist welded), **effort drive** via the motor-effort-scaled action force
(:583-585), symmetric paddle-ball distance reward (:622-667), global-frame
paddle/ball observations (:776-813), reset on ball1 dropping below z=0.1.

Deviations from the snapshot (handled, not reproduced — SURVEY.md §0): the
draft sets numObservations=108 / numActions=21 while its own obs fn emits 24
values and the force write needs one action per DOF (52). Here the working
dims are used: obs 24, act 52.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.env.vec_task import TpuVecTask
from isaacgym_tpu.sim.scene import ActorSpec, DRIVE_EFFORT, PlaneParams, SceneSpec
from isaacgym_tpu.sim.simulator import SimState
from isaacgym_tpu.tasks import pingpong_common as P


class HumanoidPingpong5Actor(TpuVecTask):

    PADDLE_BODY = 39
    ROBOT1, ROBOT2, TABLE, BALL1, BALL2 = 0, 1, 2, 3, 4
    ball_actor = BALL2  # primary ball for the base-class pre-state capture

    def __init__(self, cfg, seed: int = 42):
        env = cfg["env"]
        env["numObservations"] = 24
        env["numActions"] = 52
        self.power_scale = float(env.get("powerScale", 1.0))
        ball = env["ball"]
        self.initial_speed_range = tuple(ball["initialSpeedRange"])
        self.tilt_angle_range = tuple(ball["tiltAngleRange"])
        super().__init__(cfg, seed=seed)
        tree = self.scene.articulations[0].model.tree
        self._motor_efforts = jnp.asarray(np.concatenate([tree.effort, tree.effort]))

    def create_scene(self) -> SceneSpec:
        sc = self.cfg["env"]["scene"]
        g1 = P.load_tree("g1_26dof_pingpong.urdf")
        table = P.load_tree("pingpong_table.urdf")
        ball = P.load_tree("small_ball.urdf")
        robots = [
            ActorSpec("robot1", g1, pos=(0.0, 0.0, 1.0), fixed_base=True,
                      restitution=0.6, friction=0.5, drive_mode=DRIVE_EFFORT),
            ActorSpec("robot2", g1, pos=(3.5, 0.0, 1.0),
                      quat=P.quat_from_yaw_deg(180.0), fixed_base=True,
                      restitution=0.6, friction=0.5, drive_mode=DRIVE_EFFORT),
        ]
        return SceneSpec(
            actors=robots + [
                ActorSpec("pingpong_table", table, pos=(1.75, 0.0, 0.0), fixed_base=True,
                          restitution=0.6, friction=0.2),
                ActorSpec("pingpong_ball_1", ball, pos=(0.4, 0.28, 1.3), fixed_base=False,
                          restitution=0.9, friction=0.2),
                ActorSpec("pingpong_ball_2", ball, pos=(3.1, -0.28, 1.3), fixed_base=False,
                          restitution=0.9, friction=0.2),
            ],
            plane=PlaneParams(),
            dt=float(self.cfg["sim"]["dt"]),
            substeps=int(self.cfg["sim"]["substeps"]),
        )

    def rb_body_ids(self):
        # robot1 paddle (39), robot2 paddle (40+39=79)
        return np.asarray([self.PADDLE_BODY, 40 + self.PADDLE_BODY])

    def action_to_drive(self, actions):
        # reference :583-585: forces = actions * motor_efforts * power_scale
        return jnp.zeros_like(actions), actions * self._motor_efforts * self.power_scale

    def _sample_both_ball_velocities(self, key):
        """Reference generate_random_speed_for_ball (:250-270): ball1 +x
        toward robot2, ball2 -x toward robot1, planar."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        lo, hi = self.initial_speed_range
        a_lo, a_hi = np.radians(self.tilt_angle_range[0]), np.radians(self.tilt_angle_range[1])
        s1 = jax.random.uniform(k1, (), minval=lo, maxval=hi)
        a1 = jax.random.uniform(k2, (), minval=a_lo, maxval=a_hi)
        s2 = -jax.random.uniform(k3, (), minval=lo, maxval=hi)
        a2 = jax.random.uniform(k4, (), minval=a_lo, maxval=a_hi)
        v1 = jnp.stack([s1 * jnp.cos(a1), s1 * jnp.sin(a1), jnp.zeros(())])
        v2 = jnp.stack([s2 * jnp.cos(a2), s2 * jnp.sin(a2), jnp.zeros(())])
        return v1, v2

    def reset_sim_single(self, key, sim: SimState) -> SimState:
        init_root = jnp.asarray(self.scene.initial_root)
        v1, v2 = self._sample_both_ball_velocities(key)
        root = init_root.at[self.BALL1, 7:10].set(v1)
        root = root.at[self.BALL2, 7:10].set(v2)
        return sim._replace(root=root,
                            dof_pos=jnp.zeros_like(sim.dof_pos),
                            dof_vel=jnp.zeros_like(sim.dof_vel))

    def observe_single(self, sim: SimState, rb_states, flags) -> jnp.ndarray:
        """Global-frame paddle/ball pos+vel (reference :776-813)."""
        p1, p2 = rb_states[0], rb_states[1]
        b1, b2 = sim.root[self.BALL1], sim.root[self.BALL2]
        pick = lambda s: jnp.concatenate([s[0:3], s[7:10]])
        return jnp.concatenate([pick(p1), pick(p2), pick(b1), pick(b2)])

    def reward_single(self, pre_ball_root, sim: SimState, rb_states, flags,
                      progress) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Symmetric distance reward (reference :622-667)."""
        p1, p2 = rb_states[0][0:3], rb_states[1][0:3]
        b1, b2 = sim.root[self.BALL1][0:3], sim.root[self.BALL2][0:3]
        d1 = jnp.sum((p1 - b2) ** 2)
        d2 = jnp.sum((p2 - b1) ** 2)
        reward = 1.0 / (1.0 + d1) + 1.0 / (1.0 + d2)
        die = b1[2] < 0.1
        reset = die | (progress >= self.max_episode_length - 1)
        return reward, reset, flags
