"""Record a trained policy rollout to a trajectory npz and render it to video.

Closes the loop the reference covers with its interactive viewer
(/root/reference/tasks/joint_monkey2_new.py:221-224,696-701): here the
trajectory is recorded headless from a restored checkpoint and rendered
offline by ``isaacgym_tpu.viewer.render``.

Usage:
  python tools/record_policy.py --checkpoint runs/c7_ref2e5_r2/ckpt_0013500 \
      [--task HumanoidPingpongTiltNoEarlyStopG1] [--envs 8] [--steps 200] \
      [--out docs/media/c7_policy] [--device cpu] [--fps 30]

Writes <out>.npz and <out>.mp4 (env chosen = first env whose one-shot
paddle-hit flag fired, i.e. the policy actually struck the ball).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--task", default="HumanoidPingpongTiltNoEarlyStopG1")
    ap.add_argument("--envs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default="docs/media/policy")
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--gif", action="store_true", help="also write a .gif")
    args = ap.parse_args(argv)

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ISAACGYM_TPU_CACHE", "/tmp/isaacgym_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np
    import jax.numpy as jnp
    from isaacgym_tpu.utils.config import compose
    from isaacgym_tpu.tasks import task_registry
    from isaacgym_tpu.rl.ppo import PPOConfig, PPOTrainer
    from isaacgym_tpu.rl import checkpoint as ckpt
    from isaacgym_tpu.viewer.trajectory import TrajectoryRecorder
    from isaacgym_tpu.viewer.render import render_trajectory

    cfg = compose(args.task, [f"num_envs={args.envs}"])
    env = task_registry()[args.task](cfg["task"], seed=17)
    trainer = PPOTrainer(env, PPOConfig.from_train_cfg(cfg.get("train", {})), seed=17)
    ts = ckpt.restore(args.checkpoint, trainer.init_state())
    print(f"restored {args.checkpoint} (epoch {int(ts.epoch)})")

    @jax.jit
    def policy_step(env_state, obs):
        mu, _, _ = trainer._policy(ts.params, ts.obs_stats, obs)
        return env.step_fn(env_state, mu)

    state, obs = env.reset()
    B = env.num_envs
    from isaacgym_tpu.rl.player import resolve_hit_flag
    hit_flag = resolve_hit_flag(env, state.flags)
    rec = TrajectoryRecorder(env.scene.body_names, max_envs=B, scene=env.scene)
    returns = np.zeros(B)
    hit = np.zeros(B, bool)
    for t in range(args.steps):
        rb = env.sim.rigid_body_states(state.sim)
        ball = getattr(env, "ball_actor", None)
        marker = (np.asarray(state.sim.root[:, ball, :3])[:, None, :]
                  if ball is not None else None)
        rec.record(np.asarray(rb), markers=marker)
        state, obs, rew, done, info = policy_step(state, obs)
        returns += np.asarray(rew)
        hit |= np.asarray(state.flags.get(hit_flag, jnp.zeros(B, bool)))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    npz = rec.save(args.out + ".npz")
    env_idx = int(np.argmax(hit)) if hit.any() else int(np.argmax(returns))
    print(f"recorded {args.steps} steps x {B} envs -> {npz}; "
          f"hits per env {hit.astype(int).tolist()}, returns "
          f"{[round(r) for r in returns.tolist()]}; rendering env {env_idx}")
    out = render_trajectory(npz, args.out + ".mp4", env=env_idx, fps=args.fps)
    print(out)
    if args.gif:
        print(render_trajectory(npz, args.out + ".gif", env=env_idx,
                                fps=args.fps, size=(480, 270)))


if __name__ == "__main__":
    main()
