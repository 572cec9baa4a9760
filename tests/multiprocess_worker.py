"""Worker for the true multi-process ``jax.distributed`` test.

Launched as a subprocess (one per rank) by tests/test_multiprocess.py:

    python tests/multiprocess_worker.py <rank> <nproc> <port> <outdir>

Each process owns ONE virtual CPU device; ``jax.distributed.initialize``
joins them into one multi-controller program whose global device list spans
both ranks. The worker then runs the REAL PPO train epoch (rl/ppo.py) over a
global ``dp`` mesh: env state sharded across processes (per-process env
shards), params replicated, gradients/normalizer stats psum'd across
processes by XLA — the TPU-native equivalent of the reference's torchrun +
NCCL allreduce data parallelism (/root/reference/train.py:116-120,
tasks/pingpong_note.txt:163).

Writes per-rank result JSON + a rank-0-only checkpoint for the parent test
to verify.
"""

from __future__ import annotations

import json
import os
import sys


def main():
    rank, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/isaacgym_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=rank)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc, jax.devices()

    import numpy as np
    import isaacgym_tpu
    from jax.sharding import NamedSharding, PartitionSpec as P
    from isaacgym_tpu.parallel import mesh as M
    from isaacgym_tpu.rl import checkpoint as ckpt
    from isaacgym_tpu.rl.ppo import PPOConfig, PPOTrainer

    # identical construction on every rank (and in the parent's baseline):
    # reset/init are deterministic in the seeds, so each rank computes the
    # same full-batch host values and contributes its dp shard below.
    env = isaacgym_tpu.make(seed=5, task="HumanoidPingpongTiltNoEarlyStopG1",
                            num_envs=8, episodeLength=8)
    cfg = PPOConfig(units=(64, 64), horizon_length=4, minibatch_size=16,
                    mini_epochs=2)
    trainer = PPOTrainer(env, cfg, seed=0)
    ts = trainer.init_state()
    env_state, obs = env.reset()

    mesh = M.make_mesh()  # all global devices -> {'dp': nproc}
    B = env.num_envs

    def globalize(tree, batch_spec):
        """Host-replicated local tree -> global jax.Arrays over ``mesh``."""
        def leaf(x):
            if x is None:
                return None
            xh = np.asarray(x)
            spec = batch_spec if (xh.ndim >= 1 and xh.shape[0] == B) else P()
            sh = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(xh.shape, sh,
                                                lambda idx: xh[idx])
        return jax.tree.map(leaf, tree)

    env_state = globalize(env_state, P("dp"))
    obs = globalize(obs, P("dp"))
    ts = globalize(ts, P())  # params/opt/normalizers/rng replicated

    for _ in range(2):
        ts, env_state, obs, metrics = trainer.train_epoch(ts, env_state, obs)
    jax.block_until_ready(metrics)

    flat = np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree.leaves(ts.params)])
    result = {
        "rank": rank,
        "process_count": jax.process_count(),
        "mesh": dict(mesh.shape),
        "a_loss": float(metrics["a_loss"]),
        "reward_mean": float(metrics["reward_mean"]),
        "param_norm": float(np.linalg.norm(flat)),
        "param_head": [float(v) for v in flat[:8]],
    }
    np.save(os.path.join(outdir, f"params_rank{rank}.npy"), flat)
    with open(os.path.join(outdir, f"result_rank{rank}.json"), "w") as f:
        json.dump(result, f)

    # checkpoint saves are collective (orbax coordinates processes and the
    # primary writes once — train.py calls save from every rank the same
    # way); metrics/log writes stay rank-0-only
    ckpt.save(os.path.join(outdir, "ckpt_collective"), ts)
    if jax.process_index() == 0:
        with open(os.path.join(outdir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps({"a_loss": result["a_loss"]}) + "\n")

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
