"""Humanoid12PingpongTiltG1 — the 4-actor, two-humanoid scene (SURVEY.md C8).

TPU-native re-implementation of
/root/reference/tasks/humanoid_pingpong_4_actor_tilt.py: two fixed-base G1s
facing each other (robot2 at (3.5,0,1), yaw 180 deg; :555), table + ball:
4 actors, 14 DOFs, 82 bodies, act 14 (:101,125-126). Only humanoid1's reward
is wired (:743-761), reusing the C6 ``compute_pingpong_reward_nv``.

Deviation from the snapshot (SURVEY.md §0 "handled, not reproduced"): the
reference leaves ``numObservations = 80`` while its own obs functions emit
30+30+14+14+6 = 94 values and overwrite one shared buffer per humanoid
(:774-804,1046-1047) — a shape mismatch at runtime. Here the obs is the
94-dim humanoid1-perspective vector (the humanoid whose reward is wired).

Two-player mode (``env.twoPlayer: true``) finishes what the reference left
dead: its ``compute_humanoid2_pingpong_reward`` (:1281-1440) is defined but
never added to ``rew_buf``, and its "obs_buffer needs doubling" TODO
(:788,804) is unresolved. With the flag on:

* obs = 188 — both 94-dim perspectives concatenated (each humanoid's
  heading-local body/dof/ball block, exactly the reference's per-humanoid
  obs functions, :773-804);
* reward = humanoid1's C6 reward + humanoid2's reward evaluated through the
  table-center mirror x' = 3.5 - x, which reproduces the reference's
  humanoid2 windows verbatim (bounce penalty x>1.06, table window
  0.4..1.06, undershoot x<=0.4 & vx<0, velocity flip pre>0 & now<0, miss
  ball_x > humanoid_x + 0.05; the net window and |y| gates are mirror-
  symmetric already). Each humanoid keeps its own one-shot flag set
  (``*2`` keys) — the reference passed one shared set to both functions,
  but only ever ran one of them.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from isaacgym_tpu.sim.simulator import SimState
from isaacgym_tpu.tasks import pingpong_common as P
from isaacgym_tpu.tasks.base import PingpongFamilyTask
from isaacgym_tpu.tasks.humanoid_pingpong_tilt import HumanoidPingpongTilt


class Humanoid12PingpongTilt(HumanoidPingpongTilt):

    HUMANOIDS = 2

    def __init__(self, cfg, seed: int = 42):
        env = cfg["env"]
        self.two_player = bool(env.get("twoPlayer", False))
        # 94 = 30+30+14+14+3+3 (see module docstring); x2 perspectives when
        # the second player is wired
        env["numObservations"] = 188 if self.two_player else 94
        env["numActions"] = 14
        # grandparent __init__ sets dims itself; bypass HumanoidPingpongTilt's
        self.hit_table_reward = float(env["hitTableReward"])
        self.not_hit_table_penalty = float(env["nothitTablePenalty"])
        # mirror plane: the vertical axis through the table center
        # (tablePos x = 1.75 -> x' = 3.5 - x, reference robot2 at x=3.5)
        self._mirror_2cx = 2.0 * float(env["scene"]["tablePos"][0])
        PingpongFamilyTask.__init__(self, cfg, seed=seed)
        # re-assert obs/action dims the parent ctor chain overwrote
        assert self.num_actions == 14
        assert self.num_obs == (188 if self.two_player else 94)
        if self.two_player:
            self.event_flag_names = dict(HumanoidPingpongTilt.event_flag_names)
            self.event_flag_names.update({
                "condition_calculated2": "hit_paddle2",
                "hit_table_good2": "hit_opponent_table2",
                "crossed_net2": "cross_net2"})

    def rb_body_ids(self):
        ids = self.body_states_id
        if not self.two_player:
            return ids
        # second block of rows: the same body subset on humanoid2
        offset = self.scene.articulations[1].body_start
        return np.concatenate([ids, ids + offset])

    def init_flags(self) -> Dict[str, jnp.ndarray]:
        flags = super().init_flags()
        if self.two_player:
            flags.update({
                "condition_calculated2": jnp.asarray(False),
                "reward_calculated2": jnp.asarray(False),
                "no_bounce_before_half_mask2": jnp.asarray(True),
                "hit_table_good2": jnp.asarray(False),
                "crossed_net2": jnp.asarray(False),
            })
        return flags

    # ------------------------------------------------------------------

    def observe_single(self, sim: SimState, rb_states, flags) -> jnp.ndarray:
        if not self.two_player:
            return super().observe_single(sim, rb_states, flags)
        n = len(self.body_states_id)
        ball = sim.root[self.ball_actor]

        def perspective(rows):
            hum = P.compute_humanoid_observations(rows, None, sim.dof_pos,
                                                  sim.dof_vel)
            return jnp.concatenate(
                [hum, P.compute_pingpong_observations(rows, None, ball)])

        return jnp.concatenate([perspective(rb_states[:n]),
                                perspective(rb_states[n:2 * n])])

    def reward_single(self, pre_ball_root, sim: SimState, rb_states, flags,
                      progress) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        if not self.two_player:
            return super().reward_single(pre_ball_root, sim, rb_states,
                                         flags, progress)
        n = len(self.body_states_id)
        c1 = self._common_reward_inputs(pre_ball_root, sim, rb_states)
        r1, cc1, rc1, nb1, _ev1 = self._tilt_reward_core(
            c1, flags["condition_calculated"], flags["reward_calculated"],
            flags["no_bounce_before_half_mask"])

        # humanoid2 through the mirror: x -> 2*cx - x, vx -> -vx (positions'
        # pairwise distances and the symmetric y/z windows are preserved, so
        # the shared core reproduces the reference humanoid2 windows)
        ball = sim.root[self.ball_actor]
        paddle2 = rb_states[n + self._paddle_row]
        m = self._mirror_2cx
        c2 = dict(
            paddle_pos=jnp.stack([m - paddle2[0], paddle2[1], paddle2[2]]),
            ball_pos=jnp.stack([m - ball[0], ball[1], ball[2]]),
            ball_vx=-ball[7],
            pre_vx=-pre_ball_root[7],
            humanoid_x=m - sim.root[1][0],
        )
        r2, cc2, rc2, nb2, _ev2 = self._tilt_reward_core(
            c2, flags["condition_calculated2"], flags["reward_calculated2"],
            flags["no_bounce_before_half_mask2"])

        # each reference reward fn carries the full power term; the env
        # reward is their sum (one centralized controller drives both arms),
        # so the power cost is counted once
        reward = r1 + r2 + c1["power_reward"]
        die = c1["ball_pos"][2] < 0.1
        reset = die | (progress >= self.max_episode_length - 1)
        return reward, reset, {
            "condition_calculated": cc1, "reward_calculated": rc1,
            "no_bounce_before_half_mask": nb1,
            "hit_table_good": flags["hit_table_good"] | _ev1["good"],
            "crossed_net": flags["crossed_net"] | _ev1["over_net"],
            "condition_calculated2": cc2, "reward_calculated2": rc2,
            "no_bounce_before_half_mask2": nb2,
            "hit_table_good2": flags["hit_table_good2"] | _ev2["good"],
            "crossed_net2": flags["crossed_net2"] | _ev2["over_net"],
        }
