"""End-to-end AMP training demonstration (N12 depth).

Pipeline (the rl_games ``amp_continuous`` capability the reference registers
at /root/reference/train.py:96-99,186-193 but never exercises):

1. restore an expert checkpoint (e.g. a converged C7 policy) and record a
   deterministic rollout as a MotionLib clip (dof transitions);
2. train a FRESH policy with :class:`isaacgym_tpu.rl.amp.AMPTrainer` — each
   epoch = discriminator update (expert demos vs fresh agent transitions)
   + a full PPO epoch on style-blended rewards;
3. write per-epoch JSONL metrics (disc logits/loss, style-reward scale,
   task return) to ``<out>/metrics.jsonl``.

Healthy run: ``disc_demo_logit`` climbs toward +1, ``disc_agent_logit``
stays separated (≈ −1) early, and the gap narrows as the policy's motion
distribution moves toward the expert's.

Usage:
  python tools/amp_demo.py --expert runs/c7_ref2e5_r2/ckpt_final \
      [--task HumanoidPingpongTiltNoEarlyStopG1] [--envs 2048]
      [--epochs 600] [--clip-steps 240] [--out runs/amp_demo] [--device cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--expert", required=True)
    ap.add_argument("--task", default="HumanoidPingpongTiltNoEarlyStopG1")
    ap.add_argument("--envs", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--clip-steps", type=int, default=240)
    ap.add_argument("--out", default="runs/amp_demo")
    ap.add_argument("--device", default=None, help="'cpu' to force CPU")
    ap.add_argument("--units", default="512,256",
                    help="policy MLP units for the fresh AMP policy")
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
    import isaacgym_tpu
    from isaacgym_tpu.rl.ppo import PPOConfig, PPOTrainer
    from isaacgym_tpu.rl import checkpoint as ckpt
    from isaacgym_tpu.rl import motion_lib as M
    from isaacgym_tpu.rl import amp as A

    os.makedirs(args.out, exist_ok=True)

    # ---- 1. expert clip --------------------------------------------------
    # small env batch for the recording; env 0's trajectory becomes the clip
    rec_env = isaacgym_tpu.make(seed=7, task=args.task, num_envs=8)
    expert = PPOTrainer(rec_env, PPOConfig(), seed=7)
    ets = ckpt.restore(args.expert, expert.init_state())
    print(f"expert restored: {args.expert} (epoch {int(ets.epoch)})")

    @jax.jit
    def expert_step(state, obs):
        mu, _, _ = expert._policy(ets.params, ets.obs_stats, obs)
        return rec_env.step_fn(state, mu)

    state, obs = rec_env.reset()
    qs, qds = [], []
    for _ in range(args.clip_steps):
        state, obs, _r, _d, _i = expert_step(state, obs)
        qs.append(np.asarray(state.sim.dof_pos[0]))
        qds.append(np.asarray(state.sim.dof_vel[0]))
    T = len(qs)
    fps = 1.0 / float(rec_env.sim.dt)
    clip = os.path.join(args.out, "expert_clip.npz")
    M.save_motion_clip(clip, fps=fps, root_pos=np.zeros((T, 3)),
                       root_rot=np.tile([0, 0, 0, 1.0], (T, 1)),
                       dof_pos=np.stack(qs), dof_vel=np.stack(qds))
    nd = rec_env.num_actions
    lib = M.MotionLib(clip, num_dofs=nd)
    print(f"expert clip: {T} frames @ {fps:.0f} fps -> {clip}")

    # ---- 2. AMP training on a fresh policy -------------------------------
    env = isaacgym_tpu.make(seed=1, task=args.task, num_envs=args.envs)

    # locate the dof_pos slice in the obs vector by matching a live state
    probe_state, probe_obs = env.reset()
    q0 = np.asarray(probe_state.sim.dof_pos[0])
    o0 = np.asarray(probe_obs[0])
    off = next(i for i in range(len(o0) - nd + 1)
               if np.allclose(o0[i:i + nd], q0, atol=1e-4))

    def amp_obs_fn(o, o2):
        feat = lambda x: x[..., off:off + 2 * nd]
        return jnp.concatenate([feat(o), feat(o2)], axis=-1)

    dt = 1.0 / fps

    def demo_sampler(key, n):
        k1, k2 = jax.random.split(key)
        ids = lib.sample_motions(k1, n)
        t0 = lib.sample_time(k2, ids) * 0.8
        s0 = lib.get_motion_state(ids, t0)
        s1 = lib.get_motion_state(ids, t0 + dt)
        # same (dof_pos, 0.1*dof_vel) featureization the obs vector uses
        f = lambda s: jnp.concatenate([s["dof_pos"], s["dof_vel"] * 0.1], -1)
        return jnp.concatenate([f(s0), f(s1)], axis=-1)

    units = tuple(int(u) for u in args.units.split(","))
    cfg = PPOConfig(units=units, horizon_length=32,
                    minibatch_size=min(4096, args.envs * 32 // 4),
                    mini_epochs=5, learning_rate=1e-4)
    trainer = A.AMPTrainer(env, cfg, amp_obs_dim=4 * nd,
                           demo_sampler=demo_sampler, amp_obs_fn=amp_obs_fn,
                           seed=1)
    ppo_state, amp_state = trainer.init_state()
    env_state, obs = trainer.reset(amp_state)
    key = jax.random.PRNGKey(1)

    mpath = os.path.join(args.out, "metrics.jsonl")
    t0 = time.time()
    with open(mpath, "w") as mf:
        for it in range(args.epochs):
            key, k = jax.random.split(key)
            ppo_state, amp_state, env_state, obs, metrics = trainer.train_epoch(
                ppo_state, amp_state, env_state, obs, k)
            if it % 10 == 0 or it == args.epochs - 1:
                row = {"epoch": it, "time": round(time.time() - t0, 1)}
                for name in ("reward_mean", "a_loss", "c_loss", "kl",
                             "disc_loss", "disc_agent_logit",
                             "disc_demo_logit", "disc_grad_penalty",
                             "episode_return_mean"):
                    if name in metrics:
                        row[name] = float(metrics[name])
                mf.write(json.dumps(row) + "\n")
                mf.flush()
                print(f"epoch {it:5d} disc_demo {row.get('disc_demo_logit', 0):+.3f} "
                      f"disc_agent {row.get('disc_agent_logit', 0):+.3f} "
                      f"reward {row.get('reward_mean', 0):+.4f}")
    print(f"done in {time.time()-t0:.0f}s; metrics -> {mpath}")


if __name__ == "__main__":
    main()
