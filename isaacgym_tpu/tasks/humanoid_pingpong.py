"""HumanoidPingpongG1 — the original 3-actor task (SURVEY.md C5).

TPU-native re-implementation of
/root/reference/tasks/humanoid_interos_edit_pingpong_only_3_actor.py:
humanoid yawed -30 deg (:506), planar ball launch from (3.1,-0.3,1.3) at
6.5-7.5 m/s (:289-305,602-626), table restitution 0.7 / ball 0.9 (:563,608).
Reward ``compute_pingpong_reward`` (:1081-1173): dense inverse-square
paddle-ball distance + velocity-flip bonus alpha*|vx| + power cost; miss
penalty while the ball is behind the paddle; EARLY RESET on miss or ball
below z=0.1 or timeout; reset restores DOF state (:846).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from isaacgym_tpu.sim.simulator import SimState
from isaacgym_tpu.tasks.base import PingpongFamilyTask


class HumanoidPingpong(PingpongFamilyTask):

    BALL_3D_LAUNCH = False
    RESTORE_DOF_ON_RESET = True

    def __init__(self, cfg, seed: int = 42):
        env = cfg["env"]
        env["numObservations"] = 80
        env["numActions"] = 7
        super().__init__(cfg, seed=seed)

    def reward_single(self, pre_ball_root, sim: SimState, rb_states, flags,
                      progress) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        c = self._common_reward_inputs(pre_ball_root, sim, rb_states)

        dist = jnp.linalg.norm(c["paddle_pos"] - c["ball_pos"])
        pos_reward = 1.0 / (1.0 + 1.5 * dist * dist)

        hit = (c["pre_vx"] < 0.0) & (c["ball_vx"] > 0.0)
        velocity_reward = jnp.where(hit, self.alpha * jnp.abs(c["ball_vx"]), 0.0)

        reward = pos_reward + c["power_reward"] + velocity_reward

        missed_ball = c["ball_pos"][0] < c["paddle_pos"][0] - 1e-3
        reward = jnp.where(missed_ball, reward + self.penalty, reward)

        die = missed_ball | (c["ball_pos"][2] < 0.1)
        reset = die | (progress >= self.max_episode_length - 1)
        return reward, reset, flags
