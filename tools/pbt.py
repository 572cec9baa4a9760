"""Population-based training driver — the working scheduler behind the
reference's PBT surface (its ``PbtAlgoObserver``/``initial_pbt_check`` come
from the external isaacgymenvs.pbt package: population members periodically
compare objectives, and underperformers restart from a top performer's
checkpoint with mutated hyperparameters; /root/reference/train.py:80,88-89,
174-176).

TPU-native shape: the whole population shares ONE compiled train-epoch (the
member-specific hyperparameter — the learning rate — is an
``optax.inject_hyperparams`` state leaf, not a compile-time constant), so
P members cost one compile and run round-robin on the same chip:

  for each round: every member trains K epochs on its own env/train state;
  then the bottom quartile EXPLOITS (copies a random top-quartile member's
  full train state) and EXPLORES (lr x 0.8 or x 1.25, clamped).

Objective = mean finished-episode return over the member's round (the same
quantity ``PbtObserver`` exports to pbt_objective.json).

Usage (dotlist overrides like train.py):
  python tools/pbt.py task=HumanoidPingpongTiltNoEarlyStopG1 population=4 \
      rounds=5 epochs_per_round=50 num_envs=1024 experiment=pbt_demo
  # CPU smoke: add device=cpu and shrink the net, e.g.
  #   train.params.network.mlp.units=[32,32]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    overrides = [a for a in argv if "=" in a]
    kv = dict(o.split("=", 1) for o in overrides)
    task_name = kv.get("task", "HumanoidPingpongTiltNoEarlyStopG1")
    population = int(kv.get("population", 4))
    rounds = int(kv.get("rounds", 3))
    epochs_per_round = int(kv.get("epochs_per_round", 20))
    pbt_keys = ("population", "rounds", "epochs_per_round", "task")
    overrides = [o for o in overrides
                 if o.split("=", 1)[0] not in pbt_keys]

    import jax
    if kv.get("device", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ISAACGYM_TPU_CACHE", "/tmp/isaacgym_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from isaacgym_tpu.utils.config import compose, preprocess_train_config
    from isaacgym_tpu.tasks import task_registry
    from isaacgym_tpu.rl.ppo import PPOConfig, PPOTrainer

    cfg = compose(task_name, overrides)
    preprocess_train_config(cfg)
    seed = int(cfg.get("seed", 42))
    env = task_registry()[task_name](cfg["task"], seed=seed)
    ppo_cfg = PPOConfig.from_train_cfg(cfg.get("train", {}))
    if ppo_cfg.lr_schedule != "constant":
        # the mutated lr must persist; adaptive/linear would overwrite it
        ppo_cfg = type(ppo_cfg)(**{**ppo_cfg.__dict__, "lr_schedule": "constant"})

    experiment = cfg.get("experiment") or f"pbt_{task_name}_{time.strftime('%y%m%d-%H%M%S')}"
    run_dir = os.path.join("runs", experiment)
    os.makedirs(run_dir, exist_ok=True)

    trainer = PPOTrainer(env, ppo_cfg, seed=seed)  # ONE compile for all members
    rng = random.Random(seed)

    members = []
    for m in range(population):
        mt = PPOTrainer(env, ppo_cfg, seed=seed + 1000 * (m + 1))
        ts = mt.init_state()
        # spread the initial lr across half an order of magnitude
        lr = ppo_cfg.learning_rate * rng.choice([0.5, 0.8, 1.0, 1.25, 2.0])
        ts = ts._replace(last_lr=jnp.asarray(lr, jnp.float32))
        env_state, obs = env.reset()
        members.append(dict(ts=ts, env_state=env_state, obs=obs,
                            lr=lr, objective=float("-inf")))

    n_exploit = max(1, population // 4)
    log_path = os.path.join(run_dir, "pbt_history.jsonl")
    t0 = time.time()
    for rnd in range(rounds):
        for mi, mem in enumerate(members):
            ret_sum = cnt = 0.0
            ts, env_state, obs = mem["ts"], mem["env_state"], mem["obs"]
            for _ in range(epochs_per_round):
                ts, env_state, obs, metrics = trainer.train_epoch(ts, env_state, obs)
                ret_sum += float(metrics["episode_return_sum"])
                cnt += float(metrics["episode_count"])
            mem.update(ts=ts, env_state=env_state, obs=obs,
                       objective=ret_sum / max(cnt, 1.0))

        order = sorted(range(population), key=lambda i: members[i]["objective"],
                       reverse=True)
        top, bottom = order[:n_exploit], order[-n_exploit:]
        for bi in bottom:
            if bi in top:
                continue  # degenerate tiny populations
            src = members[rng.choice(top)]
            dst = members[bi]
            new_lr = max(1e-6, min(1e-2, src["lr"] * rng.choice([0.8, 1.25])))
            # exploit: full train state (params/opt/normalizers) from the
            # source; keep the member's own env state + rng stream. Deep-copy
            # the buffers — train_epoch donates its arguments, so an aliased
            # state would be invalidated under the donor when the clone runs.
            src_ts = jax.tree.map(jnp.copy, src["ts"])
            dst["ts"] = src_ts._replace(
                rng=dst["ts"].rng,
                last_lr=jnp.asarray(new_lr, jnp.float32))
            dst["lr"] = new_lr

        row = dict(round=rnd,
                   objectives=[round(m["objective"], 3) for m in members],
                   lrs=[m["lr"] for m in members],
                   exploited=[int(b) for b in bottom if b not in top],
                   elapsed_s=round(time.time() - t0, 1))
        with open(log_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    best = max(members, key=lambda m: m["objective"])
    from isaacgym_tpu.rl import checkpoint as ckpt
    ckpt.save(os.path.join(run_dir, "ckpt_best"), best["ts"])
    print(json.dumps(dict(best_objective=round(best["objective"], 3),
                          best_lr=best["lr"], run_dir=run_dir)))


if __name__ == "__main__":
    main(sys.argv[1:])
