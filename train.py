"""Training/eval launcher — capability of the reference ``train.py``
(/root/reference/train.py:71-219): config composition with CLI dotlist
overrides, task selection by name, seeding (rank-offset on multi-host),
train/play modes, checkpointing, experiment dir with config dump.

Usage (Hydra-style overrides, same surface as the reference):
  python train.py task=HumanoidPingpongTiltNoEarlyStopG1 experiment=G1 \
      num_envs=1024 max_iterations=1000 seed=42
  python train.py task=... test=true checkpoint=runs/G1/ckpt num_envs=2
"""

from __future__ import annotations

import json
import os
import sys
import time


def main(argv):
    overrides = [a for a in argv if "=" in a]
    kv = dict(o.split("=", 1) for o in overrides)
    task_name = kv.get("task", "HumanoidPingpongTiltNoEarlyStopG1")
    overrides = [o for o in overrides if not o.startswith("task=")]

    import jax
    if kv.get("device", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ISAACGYM_TPU_CACHE", "/tmp/isaacgym_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from isaacgym_tpu.parallel.mesh import init_distributed
    init_distributed()

    from isaacgym_tpu.utils.config import compose, preprocess_train_config
    from isaacgym_tpu.tasks import task_registry
    from isaacgym_tpu.rl.ppo import PPOConfig, PPOTrainer
    from isaacgym_tpu.rl import checkpoint as ckpt

    cfg = compose(task_name, overrides)
    preprocess_train_config(cfg)  # PBT model_size_multiplier + launcher fields
    rank = jax.process_index()
    seed = int(cfg.get("seed", 42)) + rank  # rank-offset seeding (reference :120)

    env_cls = task_registry()[task_name]
    env = env_cls(cfg["task"], seed=seed)

    ppo_cfg = PPOConfig.from_train_cfg(cfg.get("train", {}))
    max_iters = cfg.get("max_iterations") or ppo_cfg.max_epochs
    if isinstance(max_iters, str) and not max_iters:
        max_iters = ppo_cfg.max_epochs
    max_iters = int(max_iters)

    experiment = cfg.get("experiment") or f"{task_name}_{time.strftime('%y%m%d-%H%M%S')}"
    run_dir = os.path.join("runs", experiment)
    if rank == 0:
        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(run_dir, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2, default=str)

    from isaacgym_tpu.utils.logging import (
        EpisodeStatsObserver, JsonlObserver, MultiObserver, PbtObserver, WandbObserver,
    )
    observers = [JsonlObserver()]
    if str(cfg.get("wandb_activate", "false")).lower() in ("1", "true"):
        observers.append(WandbObserver(
            project=str(cfg.get("wandb_project", "isaacgym_tpu")),
            name=str(cfg.get("wandb_name", experiment)),
            entity=str(cfg.get("wandb_entity", "")),
            group=str(cfg.get("wandb_group", "")), rank=rank))
    if cfg.get("pbt", {}).get("enabled"):
        observers.append(PbtObserver())
    observer = MultiObserver(observers)
    if rank == 0:
        observer.after_init(run_dir, cfg)

    trainer = PPOTrainer(env, ppo_cfg, seed=seed)
    ts = trainer.init_state()
    checkpoint_path = str(cfg.get("checkpoint") or "")
    start_epoch = 0
    if checkpoint_path:
        ts = ckpt.restore(checkpoint_path, ts)
        # resume epoch numbering where the checkpoint left off (reference
        # rl_games restores epoch_num the same way, a2c_common.restore)
        start_epoch = int(ts.epoch)
        print(f"restored checkpoint from {checkpoint_path} (epoch {start_epoch})")

    env_state, obs = env.reset()

    if str(cfg.get("test", "false")).lower() in ("1", "true"):
        from isaacgym_tpu.rl.player import play
        stats = play(env, trainer, ts, episodes=int(kv.get("episodes", 4)),
                     sigma=float(cfg.get("sigma") or 0.0) or None)
        print(json.dumps(stats))
        return

    save_freq = int(cfg.get("train", {}).get("params", {}).get("config", {})
                    .get("save_frequency", 1500))
    print(f"training {task_name}: {env.num_envs} envs, horizon "
          f"{ppo_cfg.horizon_length}, {max_iters} epochs, seed {seed}", flush=True)
    t_start = time.time()
    steps_per_epoch = env.num_envs * ppo_cfg.horizon_length
    t_last, it_last = time.time(), start_epoch
    # episode stats accumulate across the logging stride: with episodeLength
    # an exact multiple of the horizon (C10: 160 = 5x32) episode boundaries
    # land only in fixed epoch phases, so a strided logger that reads one
    # epoch's sums would alias to zero forever. Device arrays are futures —
    # appending per-epoch does not block the training pipeline.
    ep_keys = ("episode_count", "episode_return_sum", "episode_length_sum")
    pending = []
    LOG_EVERY = int(cfg.get("log_every", 10))
    for it in range(start_epoch, max_iters):
        ts, env_state, obs, metrics = trainer.train_epoch(ts, env_state, obs)
        if rank == 0:
            pending.append({k: v for k, v in metrics.items()
                            if k in ep_keys
                            or (k.startswith("event_") and k.endswith("_sum"))})
        if rank == 0 and (it < 3 or it % LOG_EVERY == 0):
            rm = float(metrics["reward_mean"])  # blocks: epoch really done
            now = time.time()
            rate = steps_per_epoch * (it - it_last + 1) / max(now - t_last, 1e-9)
            t_last, it_last = now, it + 1
            scalar = {k: float(v) for k, v in metrics.items()}
            for k in pending[0]:
                scalar[k] = float(sum(p[k] for p in pending))
            pending = []
            n_ep = max(scalar.get("episode_count", 0.0), 1e-9)
            scalar["episode_return_mean"] = scalar.pop("episode_return_sum", 0.0) / n_ep
            scalar["episode_length_mean"] = scalar.pop("episode_length_sum", 0.0) / n_ep
            for k in [k for k in scalar if k.startswith("event_") and k.endswith("_sum")]:
                scalar[k[:-4] + "_rate"] = scalar.pop(k) / n_ep
            scalar["env_steps_per_s"] = rate
            observer.after_epoch(it, scalar)
            ev = "  ".join(f"{k[len('event_'):-len('_rate')]} {v:.2f}"
                           for k, v in sorted(scalar.items())
                           if k.startswith("event_") and k.endswith("_rate"))
            print(f"epoch {it:6d}  reward_mean {rm:9.3f}  "
                  f"ep_ret {scalar['episode_return_mean']:9.1f}  "
                  f"a_loss {scalar['a_loss']:.4f}  c_loss {scalar['c_loss']:.4f}  "
                  f"kl {scalar['kl']:.4f}  {rate:,.0f} steps/s"
                  + (f"  [{ev}]" if ev else ""), flush=True)
        # checkpoint saves are COLLECTIVE under jax.distributed (orbax
        # syncs processes and lets the primary write); logs stay rank-0-only
        if save_freq and (it + 1) % save_freq == 0:
            ckpt.save(os.path.join(run_dir, f"ckpt_{it + 1:07d}"), ts)
    ckpt.save(os.path.join(run_dir, "ckpt_final"), ts)
    if rank == 0:
        observer.close()
        print(f"done in {time.time() - t_start:.0f}s; checkpoints in {run_dir}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
