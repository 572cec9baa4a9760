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
"""

from __future__ import annotations

from isaacgym_tpu.tasks.humanoid_pingpong_tilt import HumanoidPingpongTilt


class Humanoid12PingpongTilt(HumanoidPingpongTilt):

    HUMANOIDS = 2

    def __init__(self, cfg, seed: int = 42):
        env = cfg["env"]
        env["numObservations"] = 94   # 30+30+14+14+3+3 (see module docstring)
        env["numActions"] = 14
        # grandparent __init__ sets dims itself; bypass HumanoidPingpongTilt's
        self.hit_table_reward = float(env["hitTableReward"])
        self.not_hit_table_penalty = float(env["nothitTablePenalty"])
        from isaacgym_tpu.tasks.base import PingpongFamilyTask
        PingpongFamilyTask.__init__(self, cfg, seed=seed)
        # re-assert obs/action dims the parent ctor chain overwrote
        assert self.num_actions == 14 and self.num_obs == 94
