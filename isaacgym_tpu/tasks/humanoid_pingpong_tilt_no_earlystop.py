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

import jax.numpy as jnp

from isaacgym_tpu.sim.simulator import SimState
from isaacgym_tpu.tasks.base import PingpongFamilyTask


class HumanoidPingpongTiltNoEarlyStop(PingpongFamilyTask):

    BALL_3D_LAUNCH = True
    RESTORE_DOF_ON_RESET = False   # reference keeps the pose (:888-901)

    def __init__(self, cfg, seed: int = 42):
        env = cfg["env"]
        env["numObservations"] = 80   # 30+30+7+7+3+3 (reference :98)
        env["numActions"] = 7
        super().__init__(cfg, seed=seed)

    # per-episode event telemetry (reference event prints :1166-1167)
    event_flag_names = {"paddle_condition_calculated": "hit_paddle",
                        "missed_ball_calculated": "missed_ball"}

    def init_flags(self) -> Dict[str, jnp.ndarray]:
        return {
            "paddle_condition_calculated": jnp.asarray(False),
            "missed_ball_calculated": jnp.asarray(False),
        }

    def reward_single(self, pre_ball_root, sim: SimState, rb_states, flags,
                      progress) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """``compute_pingpong_reward_only_paddle`` (reference lines 1116-1322)."""
        c = self._common_reward_inputs(pre_ball_root, sim, rb_states)
        paddle_pos, ball_pos = c["paddle_pos"], c["ball_pos"]
        vx = c["ball_vx"]

        paddle_calc = flags["paddle_condition_calculated"]
        missed_calc = flags["missed_ball_calculated"]

        hit_the_paddle = (c["pre_vx"] < 0.0) & (vx > 1.0)

        missed_ball = ((ball_pos[0] < c["humanoid_x"] - 0.05)
                       | (ball_pos[0] < paddle_pos[0] - 0.1))
        reward = jnp.where(~missed_calc & missed_ball, self.penalty, 0.0)
        missed_calc = missed_calc | missed_ball

        # Gauss y-z alignment reward until first paddle contact (:1188-1195)
        dist = jnp.sqrt((paddle_pos[1] - ball_pos[1]) ** 2 + (paddle_pos[2] - ball_pos[2]) ** 2)
        pos_reward = jnp.where(
            (~paddle_calc) | (ball_pos[0] < c["humanoid_x"] - 0.05),
            jnp.exp(-20.0 * dist * dist), 0.0)

        velocity_reward = jnp.where(hit_the_paddle & ~paddle_calc,
                                    self.alpha * jnp.abs(vx), 0.0)
        paddle_calc = paddle_calc | hit_the_paddle

        reward = reward + pos_reward + c["power_reward"] + velocity_reward
        # no early stop: dropped ball costs -800, no reset (:1310-1315)
        reward = jnp.where(ball_pos[2] < 0.1, reward - 800.0, reward)

        reset = progress >= self.max_episode_length - 1
        return reward, reset, {
            "paddle_condition_calculated": paddle_calc,
            "missed_ball_calculated": missed_calc,
        }
