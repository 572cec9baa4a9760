"""True multi-process ``jax.distributed`` data parallelism (SURVEY.md §5.8).

The reference's production mode was torchrun multi-rank PPO with NCCL
allreduce (/root/reference/train.py:116-120, tasks/pingpong_note.txt:163).
These tests launch TWO separate Python processes, join them with
``jax.distributed.initialize`` over a localhost coordinator, run the real
PPO train epoch with per-process env shards, and assert:

  * both ranks finish and agree bit-for-bit on the (replicated) params;
  * the 2-process result matches a single-process run of the same global
    batch (gradient psum across processes == local reduction);
  * checkpoint/metrics files are written by rank 0 only, through the real
    ``rl.checkpoint.save`` (which must cope with process-replicated leaves).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_process_run(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mp"))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker pins its own single-device flag
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(rank), "2", str(port), outdir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for rank in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return outdir


def test_two_process_epoch_agrees_across_ranks(two_process_run):
    outdir = two_process_run
    results = []
    for rank in range(2):
        with open(os.path.join(outdir, f"result_rank{rank}.json")) as f:
            results.append(json.load(f))
    assert all(r["process_count"] == 2 for r in results)
    assert all(r["mesh"] == {"dp": 2, "mdl": 1} for r in results)
    assert all(np.isfinite(r["a_loss"]) for r in results)
    p0 = np.load(os.path.join(outdir, "params_rank0.npy"))
    p1 = np.load(os.path.join(outdir, "params_rank1.npy"))
    # params are replicated: the psum'd update must leave every rank with
    # the identical copy
    np.testing.assert_array_equal(p0, p1)


def test_two_process_matches_single_process(two_process_run):
    """Grad-psum equivalence: 2 procs x 4-env shards == 1 proc x 8 envs."""
    import isaacgym_tpu
    from isaacgym_tpu.rl.ppo import PPOConfig, PPOTrainer

    env = isaacgym_tpu.make(seed=5, task="HumanoidPingpongTiltNoEarlyStopG1",
                            num_envs=8, episodeLength=8)
    cfg = PPOConfig(units=(64, 64), horizon_length=4, minibatch_size=16,
                    mini_epochs=2)
    trainer = PPOTrainer(env, cfg, seed=0)
    ts = trainer.init_state()
    env_state, obs = env.reset()
    for _ in range(2):
        ts, env_state, obs, metrics = trainer.train_epoch(ts, env_state, obs)
    import jax
    baseline = np.concatenate([np.asarray(x).ravel()
                               for x in jax.tree.leaves(ts.params)])

    dist = np.load(os.path.join(two_process_run, "params_rank0.npy"))
    assert dist.shape == baseline.shape
    # tolerance: cross-process psum may use a different reduction order
    np.testing.assert_allclose(dist, baseline, atol=2e-5, rtol=2e-4)


def test_checkpoint_and_rank0_side_effects(two_process_run):
    outdir = two_process_run
    # collective orbax save completed (primary wrote, both ranks synced)
    assert os.path.isdir(os.path.join(outdir, "ckpt_collective"))
    with open(os.path.join(outdir, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    assert len(rows) == 1  # exactly one writer: rank 0
