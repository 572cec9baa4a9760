"""HumanoidPingpongTiltNESSparse27DOFG1 — whole-body 27-DOF sparse-reward
variant with a FLOATING-BASE humanoid (SURVEY.md C10; cfg exists in the
reference, task unregistered).

TPU-native re-implementation of
/root/reference/tasks/humanoid_pingpong_3_actor_all_dof.py: asset
``g1_27dof`` (27 DOFs: all but right_shoulder_yaw/right_elbow; DOF_Names at
:1303-1310), fix_base_link=False (:462) — the humanoid balances on
foot-ground contact. Act 27; obs 313 = humanoid obs 114 (10 bodies: 30+30 +
dof 27+27) + ball obs 7 (local pos, vel, predicted y-intercept; :1811-1846)
+ imitation obs 192 vs the initial standing pose (23 balance bodies: 69+69 +
27+27; :1893-1927).

Reward (:1441-1690): tiered balance/imitation reward vs the initial pose
(22 non-right-arm DOFs x50 weight; fall = -50 at mean body deviation > 0.32),
paddle-plane alignment circle (r 0.15: +hitPaddleReward inside /
distance-proportional penalty outside, first x-approach only), one-shot hit
bonus (vx>1.5), time penalty while the ball is incoming, gradient
table-landing reward (z crossing [0.82,0.83]: constant reward inside
x in [1.9,3.1], |y|<0.6 else penalty prop. to distance from (2.5,0);
:1246-1301), net-crossing reward with height-graded penalty (:1619-1650),
one-shot ball-drop penalty (z<0.78), humanoid-fall latch, power cost; **no
early termination** (timeout only). Diagnostic event counters (:283-292) are
carried as env flags and surfaced via ``info``.

Asset-dependent deviation (reference URDF absent from the snapshot): the
synthesized G1 stands with its pelvis at ~0.81 m, so the standing pose /
fall threshold constants are taken from config (``pelvisHeightThreshold``)
instead of the reference's hardcoded 0.97 for its taller asset.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.sim.simulator import SimState
from isaacgym_tpu.tasks import pingpong_common as P
from isaacgym_tpu.tasks.base import PingpongFamilyTask
from isaacgym_tpu.utils import rotations as rot


class HumanoidPingpongTiltNESSparse27DOF(PingpongFamilyTask):

    BALL_3D_LAUNCH = True
    RESTORE_DOF_ON_RESET = True

    def __init__(self, cfg, seed: int = 42):
        env = cfg["env"]
        env["numObservations"] = 121 + 192
        env["numActions"] = 27
        env.setdefault("bodyStatesId", env["bodyStatesIdPingpong"])
        self.hit_table_reward = float(env["hitTableReward"])
        self.not_hit_table_penalty = float(env["nothitTablePenalty"])
        self.cross_net_reward_float = float(env["crossNetRewardFloat"])
        self.die_penalty_float = float(env["diePenaltyFloat"])
        self.hit_paddle_reward = float(env["hitPaddleReward"])
        self.miss_paddle_penalty_coefficient = float(env["missPaddlePenaltyCoefficient"])
        self.pelvis_height_threshold = float(env.get("pelvisHeightThreshold", 0.78))
        self.is_train = not bool(env.get("test", False))
        ball = env["ball"]
        self.initial_pos_y_range = tuple(ball.get("initialPosYRange", (-0.5, 0.1)))
        self.initial_pos_z_range = tuple(ball.get("initialPosZRange", (0.96, 1.05)))
        env.setdefault("penalty", 0.0)  # base-class field, unused here (:112)

        self.balance_ids = np.asarray(env["bodyStatesIdBalance"], dtype=np.int64)
        pingpong_ids = np.asarray(env["bodyStatesIdPingpong"], dtype=np.int64)
        # rb subset = union of everything obs/reward touch
        self._all_ids = np.unique(np.concatenate([pingpong_ids, self.balance_ids]))
        self._ping_rows = np.searchsorted(self._all_ids, pingpong_ids)
        self._bal_rows = np.searchsorted(self._all_ids, self.balance_ids)
        self._pelvis_row = int(np.searchsorted(self._all_ids, 0))

        super().__init__(cfg, seed=seed)
        self._paddle_row = int(np.searchsorted(self._all_ids, self.PADDLE_BODY))

        # initial (standing) body states: FK at the spawn pose — the
        # imitation reference (reference initial_body_states, :899-902)
        from isaacgym_tpu.models.kinematics import fk_body_states
        tree = self.scene.articulations[0].model.tree
        init_root = self.scene.initial_root[0]
        init_states = fk_body_states(
            tree, jnp.asarray(init_root[0:3]), jnp.asarray(init_root[3:7]),
            jnp.zeros(tree.n_dof), jnp.zeros(tree.n_dof))
        self._initial_body_states = jnp.asarray(np.asarray(init_states)[self._all_ids])
        self._initial_dof_pos = jnp.zeros(27)
        self._initial_dof_vel = jnp.zeros(27)

    # ------------------------------------------------------------------

    def create_scene(self):
        return P.build_pingpong_scene(self.cfg["env"], self.cfg["sim"],
                                      humanoids=1, floating_base=True)

    def rb_body_ids(self):
        return self._all_ids

    def init_flags(self) -> Dict[str, jnp.ndarray]:
        return {
            "paddle_condition_calculated": jnp.asarray(False),
            "hit_table_calculated": jnp.asarray(False),
            "die_penalty_calculated": jnp.asarray(False),
            "humanoid_die_calculated": jnp.asarray(False),
            # diagnostic event counters (reference :283-292)
            "closer_to_paddle_count": jnp.asarray(False),
            "hit_paddle_count": jnp.asarray(False),
            "cross_net_count": jnp.asarray(False),
            "hit_table_count": jnp.asarray(False),
            "fall_down_count": jnp.asarray(False),
        }

    def reset_sim_single(self, key, sim: SimState) -> SimState:
        """Reference _reset_idx (:965-1000): roots to initial, randomized
        ball start y/z + launch velocity, DOF restore."""
        k1, k2, k3 = jax.random.split(key, 3)
        init_root = jnp.asarray(self.scene.initial_root)
        vel = self.sample_ball_velocity(k1)
        y = jax.random.uniform(k2, (), minval=self.initial_pos_y_range[0],
                               maxval=self.initial_pos_y_range[1])
        z = jax.random.uniform(k3, (), minval=self.initial_pos_z_range[0],
                               maxval=self.initial_pos_z_range[1])
        root = init_root.at[self.ball_actor, 1].set(y)
        root = root.at[self.ball_actor, 2].set(z)
        root = root.at[self.ball_actor, 7:10].set(vel)
        return sim._replace(root=root,
                            dof_pos=jnp.zeros_like(sim.dof_pos),
                            dof_vel=jnp.zeros_like(sim.dof_vel))

    # ------------------------------------------------------------------

    def observe_single(self, sim: SimState, rb_states, flags) -> jnp.ndarray:
        ping = rb_states[jnp.asarray(self._ping_rows)]
        hum = P.compute_humanoid_observations(ping, None, sim.dof_pos, sim.dof_vel)

        # ball obs + predicted y-intercept at the robot plane (:1833-1838)
        root_pos, root_rot = ping[0, 0:3], ping[0, 3:7]
        heading_inv = rot.calc_heading_quat_inv(root_rot)
        ball = sim.root[self.ball_actor]
        lp = rot.quat_rotate(heading_inv, ball[0:3] - root_pos)
        lv = rot.quat_rotate(heading_inv, ball[7:10])
        y_int = lp[1] + (lv[1] / (-lv[0] + 1e-6)) * lp[0]
        ball_obs = jnp.concatenate([lp, lv, y_int[None]])

        # imitation obs vs the initial standing pose (:1893-1927)
        bal = rb_states[jnp.asarray(self._bal_rows)]
        ref = self._initial_body_states[jnp.asarray(self._bal_rows)]
        diff_pos = ref[:, 0:3] - bal[:, 0:3]
        diff_vel = ref[:, 7:10] - bal[:, 7:10]
        d_lp = rot.quat_rotate(heading_inv, diff_pos).reshape(-1) * 10.0
        d_lv = rot.quat_rotate(heading_inv, diff_vel).reshape(-1)
        imi = jnp.concatenate([d_lp, d_lv, self._initial_dof_pos, self._initial_dof_vel])

        return jnp.concatenate([hum, ball_obs, imi])

    # ------------------------------------------------------------------

    def _imitation_reward(self, sim: SimState, rb_states):
        """Reference compute_imitation_reward (:1313-1418), is_g1 path."""
        k_pos, k_vel, k_dof_pos, k_dof_vel = 50.0, 4.0, 5.0, 0.05
        w_pos, w_vel, w_dof_pos, w_dof_vel = 0.4, 0.2, 0.2, 0.2

        bal = rb_states[jnp.asarray(self._bal_rows)]
        ref = self._initial_body_states[jnp.asarray(self._bal_rows)]
        diff_pos = ((ref[:, 0:3] - bal[:, 0:3]) ** 2).mean()
        r_body_pos = jnp.exp(-k_pos * diff_pos)
        diff_vel = ((ref[:, 7:10] - bal[:, 7:10]) ** 2).mean()
        r_body_vel = jnp.exp(-k_vel * diff_vel)

        diff_dof = (self._initial_dof_pos - sim.dof_pos) ** 2
        # tiered: first 22 (non-right-arm) get x50 weight / x500 sharpness
        r_first = jnp.exp(-(k_dof_pos * 500.0) * diff_dof[:22].mean())
        r_last = jnp.exp(-k_dof_pos * diff_dof[22:].mean())
        dof_pos_reward = (w_dof_pos * 50.0) * r_first + w_dof_pos * r_last

        diff_dvel = ((self._initial_dof_vel[:22] - sim.dof_vel[:22]) ** 2).mean()
        r_dof_vel = jnp.exp(-k_dof_vel * diff_dvel)

        reward = (dof_pos_reward + w_dof_vel * r_dof_vel
                  + w_pos * r_body_pos + w_vel * r_body_vel)

        term_dist = 0.32 if self.is_train else 1e6
        mean_dev = jnp.linalg.norm(bal[:, 0:3] - ref[:, 0:3], axis=-1).mean()
        has_fallen = mean_dev > term_dist
        reward = jnp.where(has_fallen, -50.0, reward)
        return reward, has_fallen

    def reward_single(self, pre_ball_root, sim: SimState, rb_states, flags,
                      progress) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        f = dict(flags)
        paddle = rb_states[self._paddle_row]
        pelvis = rb_states[self._pelvis_row]
        ball = sim.root[self.ball_actor]
        ball_pos, vx = ball[0:3], ball[7]
        pre_vx = pre_ball_root[7]

        ref_reward, has_fallen = self._imitation_reward(sim, rb_states)
        f["fall_down_count"] = f["fall_down_count"] | has_fallen

        # paddle-plane alignment circle (first x-approach only; :1546-1570)
        x_close = jnp.abs(ball_pos[0] - paddle[0]) < 0.2
        first_time_close = x_close & ~f["paddle_condition_calculated"]
        yz_dist = jnp.sqrt((ball_pos[1] - paddle[1]) ** 2 + (ball_pos[2] - paddle[2]) ** 2)
        in_circle = yz_dist < 0.15
        pos_reward = jnp.where(
            first_time_close & ~f["humanoid_die_calculated"],
            jnp.where(in_circle, self.hit_paddle_reward,
                      self.miss_paddle_penalty_coefficient * yz_dist),
            0.0)
        f["closer_to_paddle_count"] = f["closer_to_paddle_count"] | (first_time_close & in_circle)

        # one-shot hit bonus, vx > 1.5 (:1576-1596)
        hit_the_paddle = (pre_vx < 0.0) & (vx > 1.5)
        f["hit_paddle_count"] = f["hit_paddle_count"] | hit_the_paddle
        velocity_reward = jnp.where(
            hit_the_paddle & ~f["paddle_condition_calculated"] & ~f["humanoid_die_calculated"],
            self.alpha * jnp.abs(vx), 0.0)
        f["paddle_condition_calculated"] = f["paddle_condition_calculated"] | x_close

        # time penalty while the ball is incoming (:1602-1607)
        humanoid_x = sim.root[0][0]
        time_penalty = jnp.where((ball_pos[0] > humanoid_x) & (vx < 0.0),
                                 -0.01 * progress.astype(jnp.float32), 0.0)

        # gradient table-landing reward (:1246-1301)
        z_in_range = (ball_pos[2] >= 0.82) & (ball_pos[2] <= 0.83) & (vx > 0.0)
        in_square = ((ball_pos[0] >= 1.9) & (ball_pos[0] <= 3.1)
                     & (jnp.abs(ball_pos[1]) <= 0.6))
        distance = jnp.sqrt((ball_pos[0] - 2.5) ** 2 + ball_pos[1] ** 2)
        f["hit_table_count"] = f["hit_table_count"] | (z_in_range & in_square)
        hit_reward = jnp.where(
            z_in_range & ~f["hit_table_calculated"] & ~f["humanoid_die_calculated"],
            jnp.where(in_square, self.hit_table_reward, self.not_hit_table_penalty * distance),
            0.0)
        f["hit_table_calculated"] = f["hit_table_calculated"] | z_in_range

        # net crossing with height-graded penalty (:1619-1650)
        when_over_net = (ball_pos[0] > 1.72) & (ball_pos[0] < 1.78) & (vx > 0.0)
        suitable = (ball_pos[2] > 0.96) & (ball_pos[2] < 1.25)
        over_height = jnp.where(ball_pos[2] > 1.25, ball_pos[2] - 1.25, 0.96 - ball_pos[2])
        net_reward = jnp.where(
            when_over_net & ~f["humanoid_die_calculated"],
            jnp.where(suitable, self.cross_net_reward_float, -400.0 * over_height),
            0.0)
        f["cross_net_count"] = f["cross_net_count"] | (net_reward > 0)

        power = jnp.sum(jnp.abs(sim.dof_force * sim.dof_vel))
        power_reward = -self.power_coefficient * power

        # one-shot ball-drop penalty, z < 0.78, no reset (:1677-1681)
        die_penalty = jnp.where(
            (ball_pos[2] < 0.78) & ~f["die_penalty_calculated"] & ~f["humanoid_die_calculated"],
            self.die_penalty_float, 0.0)
        f["die_penalty_calculated"] = f["die_penalty_calculated"] | (ball_pos[2] < 0.78)

        # humanoid-fall latch (:1683)
        f["humanoid_die_calculated"] = (f["humanoid_die_calculated"]
                                        | (pelvis[2] < self.pelvis_height_threshold))

        reward = (pos_reward + power_reward + velocity_reward + hit_reward
                  + net_reward + die_penalty + time_penalty + ref_reward)
        reset = progress >= self.max_episode_length - 1
        return reward, reset, f
