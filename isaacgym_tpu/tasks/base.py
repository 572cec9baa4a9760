"""Shared base for the pingpong task family (SURVEY.md C5-C8).

Factors the common structure of the reference task classes: 3/4-actor scene,
randomized ball launch at reset, heading-local observations, per-env one-shot
reward flags, PD position drive over the right-arm DOFs.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.env.vec_task import TpuVecTask
from isaacgym_tpu.sim.simulator import SimState
from isaacgym_tpu.tasks import pingpong_common as P


class PingpongFamilyTask(TpuVecTask):
    """Common machinery; subclasses supply the reward and constants."""

    HUMANOIDS = 1
    PADDLE_BODY = 39            # paddle body index within a humanoid
    BALL_3D_LAUNCH = True       # False: C5's planar launch
    RESTORE_DOF_ON_RESET = True # False: C7 keeps the pose

    def __init__(self, cfg, seed: int = 42):
        env = cfg["env"]
        self.alpha = float(env["alphaVelocityReward"])
        self.power_coefficient = float(env["powerCoefficient"])
        self.penalty = float(env["penalty"])
        ball = env["ball"]
        self.initial_speed_range = tuple(ball["initialSpeedRange"])
        self.tilt_angle_range = tuple(ball["tiltAngleRange"])
        self.tilt_z_angle_range = tuple(ball.get("tiltZAngleRange", (0.0, 0.0)))
        self.body_states_id = np.asarray(env["bodyStatesId"], dtype=np.int64)
        self._paddle_row = int(np.nonzero(self.body_states_id == self.PADDLE_BODY)[0][0])
        self.ball_actor = self.HUMANOIDS + 1   # [h1(, h2), table, ball]
        self.table_actor = self.HUMANOIDS
        # config-flagged heading-local heightmap observation block (reference
        # compute_heightmap_observations + _get_meshgrid,
        # …no_earlystop.py:379-390,1905-1937; terrain npy via env.plane.terrain)
        hm = env.get("heightmap") or {}
        self._heightmap_enabled = bool(hm.get("enabled", False))
        if self._heightmap_enabled:
            from isaacgym_tpu.models.terrain import make_meshgrid
            self._hm_grid = make_meshgrid(
                float(hm.get("xRange", 0.6)), float(hm.get("yRange", 0.6)),
                int(hm.get("xSplit", 15)), int(hm.get("ySplit", 15)))
            self._hm_offset = float(hm.get("heightOffset", 0.9))
            env["numObservations"] = (int(env["numObservations"])
                                      + int(self._hm_grid.shape[0]))
        super().__init__(cfg, seed=seed)

    # ------------------------------------------------------------------

    def create_scene(self):
        return P.build_pingpong_scene(self.cfg["env"], self.cfg["sim"],
                                      humanoids=self.HUMANOIDS)

    def rb_body_ids(self):
        return self.body_states_id

    def sample_ball_velocity(self, key):
        if self.BALL_3D_LAUNCH:
            return P.sample_ball_velocity(key, self.initial_speed_range,
                                          self.tilt_angle_range, self.tilt_z_angle_range)
        # C5 planar launch (reference .../only_3_actor.py:289-305):
        # s = -U(range); v = (s cos a, s sin a, 0)
        k1, k2 = jax.random.split(key)
        s = -jax.random.uniform(k1, (), minval=self.initial_speed_range[0],
                                maxval=self.initial_speed_range[1])
        a = jnp.radians(jax.random.uniform(k2, (), minval=self.tilt_angle_range[0],
                                           maxval=self.tilt_angle_range[1]))
        return jnp.stack([s * jnp.cos(a), s * jnp.sin(a), jnp.zeros(())])

    def reset_sim_single(self, key, sim: SimState) -> SimState:
        """Root states to initial + random ball launch; DOF restore per task
        (reference _reset_idx; C7 comments the dof restore out)."""
        init_root = jnp.asarray(self.scene.initial_root)
        vel = self.sample_ball_velocity(key)
        root = init_root.at[self.ball_actor, 7:10].set(vel)
        out = sim._replace(root=root)
        if self.RESTORE_DOF_ON_RESET:
            out = out._replace(dof_pos=jnp.zeros_like(sim.dof_pos),
                               dof_vel=jnp.zeros_like(sim.dof_vel))
        return out

    def observe_single(self, sim: SimState, rb_states, flags) -> jnp.ndarray:
        hum = P.compute_humanoid_observations(rb_states, None, sim.dof_pos, sim.dof_vel)
        ball = P.compute_pingpong_observations(rb_states, None, sim.root[self.ball_actor])
        parts = [hum, ball]
        if self._heightmap_enabled:
            field = self.scene.spec.terrain
            if field is None:
                # flat world: heights are identically 0 -> offset - root z
                hm_obs = (jnp.zeros(self._hm_grid.shape[0])
                          - rb_states[0, 2] + self._hm_offset)
            else:
                from isaacgym_tpu.models.terrain import compute_heightmap_observations
                hm_obs = compute_heightmap_observations(
                    rb_states, None, self._hm_grid, field,
                    height_offset=self._hm_offset)
            parts.append(hm_obs)
        return jnp.concatenate(parts)

    # convenience accessors for reward code -----------------------------

    def _common_reward_inputs(self, pre_ball_root, sim: SimState, rb_states):
        paddle = rb_states[self._paddle_row]
        ball = sim.root[self.ball_actor]
        humanoid = sim.root[0]
        power = jnp.sum(jnp.abs(sim.dof_force * sim.dof_vel))
        return dict(
            paddle_pos=paddle[0:3],
            ball_pos=ball[0:3],
            ball_vx=ball[7],
            ball_vel=ball[7:10],
            pre_vx=pre_ball_root[7],
            humanoid_x=humanoid[0],
            power_reward=-self.power_coefficient * power,
        )
