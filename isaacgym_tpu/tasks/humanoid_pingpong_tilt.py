"""HumanoidPingpongTiltG1 — 3-D launch + table-event rewards (SURVEY.md C6).

TPU-native re-implementation of
/root/reference/tasks/humanoid_pingpong_3_actor_tilt.py: ball from
(3.15,-0.28,1.1) at 8.0-8.6 m/s with tilt_z 2-10 deg (:114-116,622), table &
ball restitution 1.5 (:580,628), dt 1/120. Reward
``compute_pingpong_reward_nv`` (:1106-1272): dense inverse-square paddle
distance, one-shot velocity-flip bonus, per-step miss penalty, one-shot
hit-opponent-table reward with short-bounce/overshoot penalties (bounce
detection: z<0.83 & vx>0 & |y|<0.6), cross-net reward +400 in the window
x in (1.7,1.8), |y|<0.4, z in (0.98,1.14); EARLY RESET when the ball drops
below z=0.1; DOF state restored at reset (:868,903-905).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from isaacgym_tpu.sim.simulator import SimState
from isaacgym_tpu.tasks.base import PingpongFamilyTask


class HumanoidPingpongTilt(PingpongFamilyTask):

    BALL_3D_LAUNCH = True
    RESTORE_DOF_ON_RESET = True

    def __init__(self, cfg, seed: int = 42):
        env = cfg["env"]
        env["numObservations"] = 80
        env["numActions"] = 7
        self.hit_table_reward = float(env["hitTableReward"])
        self.not_hit_table_penalty = float(env["nothitTablePenalty"])
        # curriculum-only knob (CLI resolver landing_shaping); 0 = reference
        self.landing_shaping_weight = float(env.get("landingShapingWeight", 0.0))
        super().__init__(cfg, seed=seed)

    # per-episode event telemetry (reference event prints :1333-1337).
    # ``hit_table_good``/``crossed_net`` are telemetry-only latches for the
    # TRUE one-shot good-bounce / net-window events (``reward_calculated``
    # also latches on the short-bounce and overshoot PENALTIES, so it cannot
    # serve as a success rate).
    event_flag_names = {"condition_calculated": "hit_paddle",
                        "hit_table_good": "hit_opponent_table",
                        "crossed_net": "cross_net"}

    def init_flags(self) -> Dict[str, jnp.ndarray]:
        return {
            "condition_calculated": jnp.asarray(False),
            "reward_calculated": jnp.asarray(False),
            "no_bounce_before_half_mask": jnp.asarray(True),
            "hit_table_good": jnp.asarray(False),
            "crossed_net": jnp.asarray(False),
        }

    def _tilt_reward_core(self, c, cond_calc, rew_calc, no_bounce):
        """The C6 reward state machine minus the power term, on one
        humanoid's frame-local inputs ``c``. Factored out so the 4-actor
        task (C8) can evaluate the second robot through the table-center
        mirror x' = 3.5 - x, which reproduces the reference's (dead)
        ``compute_humanoid2_pingpong_reward`` windows exactly
        (/root/reference/tasks/humanoid_pingpong_4_actor_tilt.py:1281-1440:
        2.44 -> 1.06, 3.1 -> 0.4, net window self-symmetric).
        Returns (reward, cond_calc, rew_calc, no_bounce, events) with
        ``events`` the telemetry-only dict {good (one-shot good table hit
        this step), over_net (ball inside the net window this step)}."""
        ball_pos = c["ball_pos"]
        vx = c["ball_vx"]
        rew_calc_0 = rew_calc

        dist = jnp.linalg.norm(c["paddle_pos"] - ball_pos)
        pos_reward = 1.0 / (1.0 + 1.5 * dist * dist)

        condition = (c["pre_vx"] < 0.0) & (vx > 0.0)
        velocity_reward = jnp.where(condition & ~cond_calc,
                                    self.alpha * jnp.abs(vx), 0.0)
        cond_calc = cond_calc | condition

        missed_ball = ball_pos[0] < c["humanoid_x"] - 0.05
        reward = jnp.where(missed_ball, self.penalty, 0.0)

        bounce_up = (ball_pos[2] < 0.83) & (vx > 0.0) & (jnp.abs(ball_pos[1]) < 0.6)

        # short bounce (own half, x<2.44): penalty, one shot (:1180-1190)
        short = (ball_pos[0] < 2.44) & bounce_up
        hit_reward = jnp.where(short & ~rew_calc, self.not_hit_table_penalty, 0.0)
        rew_calc = rew_calc | short
        no_bounce = no_bounce & ~short

        # opponent half (2.44-3.1): one-shot reward if first bounce (:1193-1200)
        in_range = (ball_pos[0] > 2.44) & (ball_pos[0] < 3.1)
        good = in_range & bounce_up & no_bounce & ~rew_calc
        hit_reward = jnp.where(good, self.hit_table_reward, hit_reward)
        rew_calc = rew_calc | (in_range & bounce_up & no_bounce)

        # overshoot (x >= 3.1 still moving away): one-shot penalty (:1203-1209)
        over = (ball_pos[0] >= 3.1) & (vx > 0.0) & ~rew_calc
        hit_reward = jnp.where(over, self.not_hit_table_penalty, hit_reward)
        rew_calc = rew_calc | (ball_pos[0] >= 3.1)

        # cross-net reward, +400 per step inside the window (:1236-1259)
        over_net = ((ball_pos[0] > 1.7) & (ball_pos[0] < 1.8) & (vx > 0.0)
                    & (jnp.abs(ball_pos[1]) < 0.4)
                    & (ball_pos[2] > 0.98) & (ball_pos[2] < 1.14))
        cross_net_reward = jnp.where(over_net, 400.0, 0.0)

        reward = (reward + pos_reward + velocity_reward
                  + hit_reward + cross_net_reward)

        # Curriculum-only dense landing shaping (landingShapingWeight,
        # default 0.0 = exact reference reward). Fires once per episode, on
        # the same step the one-shot landing machine latches (short bounce /
        # good bounce / overshoot crossing), with a gaussian on the
        # BALLISTIC PREDICTED landing point — so overshoots of different
        # magnitudes get different credit (the one-shot penalties alone are
        # flat in the overshoot regime, which is why five round-4 training
        # attempts pinned at background; docs/LEARNING.md round-4 section).
        w = getattr(self, "landing_shaping_weight", 0.0)
        if w and c.get("ball_vel") is not None:
            v = c["ball_vel"]
            grav = 9.81
            dz = jnp.maximum(ball_pos[2] - 0.83, 0.0)
            t_fall = jnp.where(
                ball_pos[2] > 0.83,
                (v[2] + jnp.sqrt(v[2] * v[2] + 2.0 * grav * dz)) / grav, 0.0)
            x_land = ball_pos[0] + v[0] * t_fall
            y_land = ball_pos[1] + v[1] * t_fall
            shaping = w * jnp.exp(-((x_land - 2.77) ** 2 + y_land ** 2))
            first_landing = rew_calc & ~rew_calc_0
            reward = reward + jnp.where(first_landing, shaping, 0.0)

        return reward, cond_calc, rew_calc, no_bounce, {
            "good": good, "over_net": over_net}

    def reward_single(self, pre_ball_root, sim: SimState, rb_states, flags,
                      progress) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        c = self._common_reward_inputs(pre_ball_root, sim, rb_states)
        reward, cond_calc, rew_calc, no_bounce, ev = self._tilt_reward_core(
            c, flags["condition_calculated"], flags["reward_calculated"],
            flags["no_bounce_before_half_mask"])
        reward = reward + c["power_reward"]

        die = c["ball_pos"][2] < 0.1
        reset = die | (progress >= self.max_episode_length - 1)
        return reward, reset, {
            "condition_calculated": cond_calc,
            "reward_calculated": rew_calc,
            "no_bounce_before_half_mask": no_bounce,
            "hit_table_good": flags["hit_table_good"] | ev["good"],
            "crossed_net": flags["crossed_net"] | ev["over_net"],
        }
