"""Ball-trajectory probe for physics-bisection (round-3 diagnosis).

Rolls the C7 flagship env with zero actions and reports ball arrival
statistics at the paddle plane — where/when/how fast the ball crosses, the
paddle-ball y-z alignment distance the Gauss reward sees, spin magnitudes,
and ground-drop rates. Running it under different physics knobs
(ISAACGYM_TPU_BALL_KAPPA / ISAACGYM_TPU_CCD / ISAACGYM_TPU_PALLAS) isolates
which round-2 contact change moved the task's reward landscape.

Usage:
  ISAACGYM_TPU_PALLAS=0 python tools/probe_ball.py --envs 512 --device cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--task", default="HumanoidPingpongTiltNoEarlyStopG1")
    ap.add_argument("--envs", type=int, default=512)
    ap.add_argument("--steps", type=int, default=170)
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args(argv)

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from isaacgym_tpu.make import make

    env = make(seed=args.seed, task=args.task, num_envs=args.envs)
    state, obs = env.reset()
    paddle_row = env._paddle_row

    def body(carry, _):
        state = carry
        actions = jnp.zeros((env.num_envs, env.num_actions))
        state, obs, rew, done, info = env.step_fn(state, actions)
        ball = state.sim.root[:, env.ball_actor, :]
        rb = env._rb_fn(state.sim)
        paddle = rb[:, paddle_row, 0:3]
        return state, (ball, paddle, rew)

    _, (balls, paddles, rews) = jax.lax.scan(body, state, None, length=args.steps)
    balls = np.asarray(balls)      # (T, B, 13)
    paddles = np.asarray(paddles)  # (T, B, 3)
    rews = np.asarray(rews)

    T, B = balls.shape[:2]
    pos = balls[..., 0:3]
    vel = balls[..., 7:10]
    omg = balls[..., 10:13]

    # first crossing of the paddle plane while moving toward the robot
    px = paddles[0, :, 0]  # (B,) paddle x at t=0 (zero-action pose)
    crossed = (pos[..., 0] <= px[None, :]) & (vel[..., 0] < 0.0)
    any_cross = crossed.any(axis=0)
    t_cross = np.where(any_cross, crossed.argmax(axis=0), -1)

    idx = np.maximum(t_cross, 0)
    bsel = np.arange(B)
    y_c = pos[idx, bsel, 1]
    z_c = pos[idx, bsel, 2]
    vx_c = vel[idx, bsel, 0]
    spin_c = np.linalg.norm(omg[idx, bsel], axis=-1)
    d_yz = np.sqrt((paddles[idx, bsel, 1] - y_c) ** 2 +
                   (paddles[idx, bsel, 2] - z_c) ** 2)

    dropped = (pos[..., 2] < 0.1).any(axis=0)
    max_spin = np.linalg.norm(omg, axis=-1).max()

    m = any_cross
    def q(a, p):
        return float(np.percentile(a[m], p)) if m.any() else float("nan")

    out = {
        "task": args.task, "envs": B, "steps": T,
        "pallas": os.environ.get("ISAACGYM_TPU_PALLAS", "1"),
        "kappa_override": os.environ.get("ISAACGYM_TPU_BALL_KAPPA"),
        "ccd": os.environ.get("ISAACGYM_TPU_CCD", "1"),
        "cross_rate": float(m.mean()),
        "t_cross_med": q(t_cross.astype(float), 50),
        "y_cross": [q(y_c, 10), q(y_c, 50), q(y_c, 90)],
        "z_cross": [q(z_c, 10), q(z_c, 50), q(z_c, 90)],
        "vx_cross": [q(vx_c, 10), q(vx_c, 50), q(vx_c, 90)],
        "spin_at_cross": [q(spin_c, 10), q(spin_c, 50), q(spin_c, 90)],
        "gauss_d_yz": [q(d_yz, 10), q(d_yz, 50), q(d_yz, 90)],
        "gauss_reward_med": float(np.exp(-20.0 * q(d_yz, 50) ** 2)) if m.any() else 0.0,
        "dropped_rate": float(dropped.mean()),
        "max_spin_rad_s": float(max_spin),
        "reward_mean": float(rews.mean()),
        "paddle_xyz0": [float(v) for v in paddles[0, 0]],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
