"""Joint-monkey kinematic exerciser — C4 capability (SURVEY.md §3.5).

Headless re-implementation of /root/reference/tasks/joint_monkey2_new.py:
a 5-actor scene (two G1 robots facing each other, table, two balls;
:396-514), DOF-range animation sweeping each joint between its limits at the
reference speed rule (clamp(2*range, 0.25pi, 3pi); :294-296), per-frame
state readback, and the ball drop/reset check (:136-154). Like the original
(CPU pipeline, animation writes DOF positions directly) the robots are
driven **kinematically** — DOF positions are set each frame and bodies come
from FK; only the balls integrate ballistically with plane/table bounces.
Instead of a GL viewer the trajectory records to ``.npz``; runs are
bit-deterministic under a fixed seed (BASELINE.json "joint_monkey2_new").

Run: ``python -m isaacgym_tpu.viewer.joint_monkey [steps] [out.npz]``
"""

from __future__ import annotations

import math
import sys
from functools import lru_cache
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from isaacgym_tpu.models.kinematics import fk_body_states
from isaacgym_tpu.ops import contacts as C
from isaacgym_tpu.tasks import pingpong_common as P
from isaacgym_tpu.viewer.trajectory import TrajectoryRecorder

ANIM_SEEK_LOWER, ANIM_SEEK_UPPER, ANIM_SEEK_DEFAULT = 0, 1, 2

DT = 1.0 / 60.0
ROBOT1_POS = np.array([0.0, 0.0, 1.0], np.float32)
ROBOT2_POS = np.array([3.5, 0.0, 1.0], np.float32)
TABLE_POS = np.array([1.75, 0.0, 0.0], np.float32)
BALL_STARTS = np.array([[0.4, 0.28, 1.3], [3.1, -0.28, 1.3]], np.float32)
BALL_RESTITUTION = 0.5 * (0.9 + 0.7)   # ball 0.9 vs table 0.7, avg combine
BALL_RADIUS = 0.02


@lru_cache(maxsize=1)
def _compiled():
    """Build trees + the jitted kinematic frame function once per process."""
    g1 = P.load_tree("g1_29dof_pingpong.urdf")
    table = P.load_tree("pingpong_table.urdf")
    yaw180 = jnp.asarray(P.quat_from_yaw_deg(180.0))
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    table_geoms = [(jnp.asarray(table.geom_pos[i]), jnp.asarray(table.geom_quat[i]),
                    jnp.asarray(table.geom_size[i])) for i in range(len(table.geom_kind))]

    def frame(q, ball_pos, ball_vel):
        """One kinematic frame: FK both robots, integrate both balls."""
        r1 = fk_body_states(g1, jnp.asarray(ROBOT1_POS), ident, q[:29], jnp.zeros(29))
        r2 = fk_body_states(g1, jnp.asarray(ROBOT2_POS), yaw180, q[29:], jnp.zeros(29))

        def ball_step(pos, vel):
            vel = vel + jnp.asarray([0.0, 0.0, -9.81]) * DT
            fr = C.sphere_plane(pos, BALL_RADIUS)
            dv, _, active = C.resolve_sphere_impulse(vel, fr, jnp.zeros(3), 0.45, 0.2)
            vel = vel + dv
            pos = C.depenetrate(pos, fr, active)
            for gpos_l, gquat_l, size in table_geoms:
                gp = jnp.asarray(TABLE_POS) + gpos_l
                fr = C.sphere_box(pos, BALL_RADIUS, gp, gquat_l, size)
                dv, _, active = C.resolve_sphere_impulse(
                    vel, fr, jnp.zeros(3), BALL_RESTITUTION, 0.2)
                vel = vel + dv
                pos = C.depenetrate(pos, fr, active)
            return pos + vel * DT, vel

        p1, v1 = ball_step(ball_pos[0], ball_vel[0])
        p2, v2 = ball_step(ball_pos[1], ball_vel[1])
        ident4 = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        table_state = jnp.concatenate([jnp.asarray(TABLE_POS), ident4, jnp.zeros(6)])
        ball_states = jnp.stack([
            jnp.concatenate([p1, ident4, v1, jnp.zeros(3)]),
            jnp.concatenate([p2, ident4, v2, jnp.zeros(3)]),
        ])
        bodies = jnp.concatenate([r1, r2, table_state[None], ball_states], axis=0)
        return bodies, jnp.stack([p1, p2]), jnp.stack([v1, v2])

    body_names = ([f"robot1/{n}" for n in g1.body_names]
                  + [f"robot2/{n}" for n in g1.body_names]
                  + ["pingpong_table"] + ["ball1", "ball2"])
    return g1, jax.jit(frame), body_names


def anim_speeds(tree) -> np.ndarray:
    rng = tree.upper - tree.lower
    return np.clip(2.0 * rng, 0.25 * math.pi, 3.0 * math.pi)


def run(steps: int = 240, out_path: Optional[str] = None, seed: int = 0):
    g1, frame_fn, body_names = _compiled()
    nd = 2 * g1.n_dof
    lower = np.concatenate([g1.lower, g1.lower])
    upper = np.concatenate([g1.upper, g1.upper])
    speeds = np.concatenate([anim_speeds(g1), anim_speeds(g1)])

    anim_state = np.full(nd, ANIM_SEEK_LOWER)
    targets = np.zeros(nd, np.float32)
    current = 0

    ball_pos = jnp.asarray(BALL_STARTS)
    ball_vel = jnp.zeros((2, 3))
    rng = np.random.RandomState(seed)
    rec = TrajectoryRecorder(body_names, max_envs=1)

    for step in range(steps):
        d = current
        if anim_state[d] == ANIM_SEEK_LOWER:
            targets[d] -= speeds[d] * DT
            if targets[d] <= lower[d]:
                targets[d] = lower[d]
                anim_state[d] = ANIM_SEEK_UPPER
        elif anim_state[d] == ANIM_SEEK_UPPER:
            targets[d] += speeds[d] * DT
            if targets[d] >= upper[d]:
                targets[d] = upper[d]
                anim_state[d] = ANIM_SEEK_DEFAULT
        else:
            targets[d] -= speeds[d] * DT
            if targets[d] <= 0.0:
                targets[d] = 0.0
                anim_state[d] = ANIM_SEEK_LOWER
                current = (current + 1) % nd

        bodies, ball_pos, ball_vel = frame_fn(jnp.asarray(targets), ball_pos, ball_vel)

        # ball drop/reset check (reference check_reset/reset_ids :98-154)
        bz = np.asarray(ball_pos[:, 2])
        if bz[0] < 0.05 and bz[1] < 0.05:
            vels = []
            for sign in (1.0, -1.0):
                speed = sign * rng.uniform(6.5, 7.5)
                tilt = math.radians(rng.uniform(-5.0, 5.0))
                vels.append([speed * math.cos(tilt), speed * math.sin(tilt), 0.0])
            ball_pos = jnp.asarray(BALL_STARTS)
            ball_vel = jnp.asarray(vels, dtype=jnp.float32)

        rec.record(bodies[None])

    if out_path:
        rec.save(out_path)
    return rec


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    out = sys.argv[2] if len(sys.argv) > 2 else "joint_monkey_traj.npz"
    rec = run(steps, out)
    arr = rec.stacked()
    print(f"recorded {arr.shape[0]} frames x {arr.shape[2]} bodies -> {out}")
    print("trajectory checksum:", float(np.abs(arr).sum()))
