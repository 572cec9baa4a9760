"""Alignment-reward variant (SURVEY.md C9; unregistered in the reference).

TPU-native re-implementation of
/root/reference/tasks/humanoid_pingpong_alignment.py: tilt-style 3-actor
scene (ball from (3.15,-0.28,1.1) at 8.0-8.8 m/s, restitution 1.5), reward
``compute_pingpong_reward`` (:1098-1230): dense inverse-square paddle
distance + velocity-flip bonus (NOT one-shot), one-shot hit-opponent-table
reward with bounce detected by the **z-velocity sign flip** (:1167), one-shot
overshoot penalty past x=3.1, per-step miss penalty, power cost; early stop
when the ball drops below z=0.1. Registered here as
``HumanoidPingpongAlignmentG1`` (the reference never registered it and its
class name collides with C6 — SURVEY.md §2 C9).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from isaacgym_tpu.sim.simulator import SimState
from isaacgym_tpu.tasks.base import PingpongFamilyTask


class HumanoidPingpongAlignment(PingpongFamilyTask):

    BALL_3D_LAUNCH = True
    RESTORE_DOF_ON_RESET = True

    def __init__(self, cfg, seed: int = 42):
        env = cfg["env"]
        env["numObservations"] = 80
        env["numActions"] = 7
        self.hit_table_reward = float(env["hitTableReward"])
        self.not_hit_table_penalty = float(env["nothitTablePenalty"])
        super().__init__(cfg, seed=seed)

    def init_flags(self) -> Dict[str, jnp.ndarray]:
        return {"reward_calculated": jnp.asarray(False)}

    def reward_single(self, pre_ball_root, sim: SimState, rb_states, flags,
                      progress) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        c = self._common_reward_inputs(pre_ball_root, sim, rb_states)
        ball_pos, vx = c["ball_pos"], c["ball_vx"]
        pre_vz = pre_ball_root[9]
        vz = sim.root[self.ball_actor][9]
        rew_calc = flags["reward_calculated"]

        dist = jnp.linalg.norm(c["paddle_pos"] - ball_pos)
        pos_reward = 1.0 / (1.0 + 1.5 * dist * dist)

        condition = (c["pre_vx"] < 0.0) & (vx > 0.0)
        velocity_reward = jnp.where(condition, self.alpha * jnp.abs(vx), 0.0)

        in_table_range = (ball_pos[0] > 2.2) & (ball_pos[0] < 3.1)
        bounce_up = (pre_vz < 0.0) & (vz > 0.0)
        # NOTE faithful to the reference (:1171): this same-step conjunction
        # of x<2.2 with in_table_range (x>2.2) can never be true, so the hit
        # reward never fires — a latent bug in the (unregistered) original.
        no_bounce_before_half = (ball_pos[0] < 2.2) & ~bounce_up
        good = in_table_range & bounce_up & no_bounce_before_half & ~rew_calc
        hit_reward = jnp.where(good, self.hit_table_reward, 0.0)
        rew_calc = rew_calc | (in_table_range & bounce_up & no_bounce_before_half)

        over = (ball_pos[0] >= 3.1) & (vx > 0.0) & ~rew_calc
        hit_reward = jnp.where(over, self.not_hit_table_penalty, hit_reward)
        rew_calc = rew_calc | (ball_pos[0] >= 3.1)

        reward = pos_reward + c["power_reward"] + velocity_reward + hit_reward
        missed_ball = ball_pos[0] < c["humanoid_x"] - 0.05
        reward = jnp.where(missed_ball, reward + self.penalty, reward)

        die = ball_pos[2] < 0.1
        reset = die | (progress >= self.max_episode_length - 1)
        return reward, reset, {"reward_calculated": rew_calc}
