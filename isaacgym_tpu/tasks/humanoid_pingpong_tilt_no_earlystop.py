"""HumanoidPingpongTiltNoEarlyStopG1 — the flagship PPO task (SURVEY.md C7).

TPU-native re-implementation of
/root/reference/tasks/humanoid_pingpong_3_actor_tilt_no_earlystop.py:
3 actors per env (fixed-base 7-DOF G1 + super-elastic table + ball), obs 80,
act 7, Gauss y-z paddle-alignment reward with one-shot hit/miss events and
**no early termination** — episodes end only at ``episodeLength``; a dropped
ball adds -800 instead of resetting (reference reward
``compute_pingpong_reward_only_paddle``, lines 1116-1322). Reset restores
root states + a freshly sampled ball launch but **keeps DOF states**
(reference lines 888-901 comment the dof restore out).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.env.vec_task import TpuVecTask
from isaacgym_tpu.sim.simulator import SimState
from isaacgym_tpu.tasks import pingpong_common as P


class HumanoidPingpongTiltNoEarlyStop(TpuVecTask):

    PADDLE_BODY = 39          # body index within the humanoid (and env: bodies 0-39)
    HUMANOID_ACTOR = 0
    TABLE_ACTOR = 1
    ball_actor = 2

    def __init__(self, cfg, seed: int = 42):
        env = cfg["env"]
        env["numObservations"] = 80   # 30+30+7+7+3+3 (reference :98)
        env["numActions"] = 7
        self.alpha = float(env["alphaVelocityReward"])
        self.power_coefficient = float(env["powerCoefficient"])
        self.penalty = float(env["penalty"])
        ball = env["ball"]
        self.initial_speed_range = tuple(ball["initialSpeedRange"])
        self.tilt_angle_range = tuple(ball["tiltAngleRange"])
        self.tilt_z_angle_range = tuple(ball["tiltZAngleRange"])
        self.body_states_id = np.asarray(env["bodyStatesId"], dtype=np.int64)
        self._paddle_row = int(np.nonzero(self.body_states_id == self.PADDLE_BODY)[0][0])
        super().__init__(cfg, seed=seed)

    def rb_body_ids(self):
        # only the bodyStatesId subset is touched by obs/reward (paddle incl.)
        return self.body_states_id

    # ------------------------------------------------------------------

    def create_scene(self):
        return P.build_pingpong_scene(self.cfg["env"], self.cfg["sim"])

    def init_flags(self) -> Dict[str, jnp.ndarray]:
        return {
            "paddle_condition_calculated": jnp.asarray(False),
            "missed_ball_calculated": jnp.asarray(False),
        }

    def reset_sim_single(self, key, sim: SimState) -> SimState:
        """Reference ``_reset_idx`` (lines 871-917): root states to initial,
        zero velocities, random ball launch; DOF state intentionally kept."""
        init_root = jnp.asarray(self.scene.initial_root)
        vel = P.sample_ball_velocity(key, self.initial_speed_range,
                                     self.tilt_angle_range, self.tilt_z_angle_range)
        root = init_root.at[self.ball_actor, 7:10].set(vel)
        return sim._replace(root=root)

    def observe_single(self, sim: SimState, rb_states, flags) -> jnp.ndarray:
        # rb_states rows follow bodyStatesId (see rb_body_ids)
        hum = P.compute_humanoid_observations(rb_states, None, sim.dof_pos, sim.dof_vel)
        ball = P.compute_pingpong_observations(rb_states, None, sim.root[self.ball_actor])
        return jnp.concatenate([hum, ball])

    def reward_single(self, pre_ball_root, sim: SimState, rb_states, flags,
                      progress) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """``compute_pingpong_reward_only_paddle`` (reference lines 1116-1322)."""
        paddle = rb_states[self._paddle_row]
        ball = sim.root[self.ball_actor]
        humanoid = sim.root[self.HUMANOID_ACTOR]

        paddle_pos = paddle[0:3]
        ball_pos = ball[0:3]
        pre_vx = pre_ball_root[7]
        vx = ball[7]

        paddle_calc = flags["paddle_condition_calculated"]
        missed_calc = flags["missed_ball_calculated"]

        hit_the_paddle = (pre_vx < 0.0) & (vx > 1.0)

        ball_x, paddle_x, humanoid_x = ball_pos[0], paddle_pos[0], humanoid[0]
        missed_ball = (ball_x < humanoid_x - 0.05) | (ball_x < paddle_x - 0.1)

        reward = jnp.where(~missed_calc & missed_ball, self.penalty, 0.0)
        missed_calc = missed_calc | missed_ball

        # Gauss y-z alignment reward until first paddle contact (lines 1188-1195)
        dist = jnp.sqrt((paddle_pos[1] - ball_pos[1]) ** 2 + (paddle_pos[2] - ball_pos[2]) ** 2)
        pos_reward = jnp.where(
            (~paddle_calc) | (ball_x < humanoid_x - 0.05),
            jnp.exp(-20.0 * dist * dist), 0.0)

        velocity_reward = jnp.where(hit_the_paddle & ~paddle_calc,
                                    self.alpha * jnp.abs(vx), 0.0)
        paddle_calc = paddle_calc | hit_the_paddle

        power = jnp.sum(jnp.abs(sim.dof_force * sim.dof_vel))
        power_reward = -self.power_coefficient * power

        reward = reward + pos_reward + power_reward + velocity_reward
        # no early stop: dropped ball costs -800, no reset (lines 1310-1315)
        reward = jnp.where(ball_pos[2] < 0.1, reward - 800.0, reward)

        reset = progress >= self.max_episode_length - 1
        return reward, reset, {
            "paddle_condition_calculated": paddle_calc,
            "missed_ball_calculated": missed_calc,
        }
