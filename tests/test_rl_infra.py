"""Checkpoint round-trip, player, observers, and scripted reward-event
parity tests (SURVEY.md §4, §5.4, §5.5)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import isaacgym_tpu
from isaacgym_tpu.rl import checkpoint as ckpt
from isaacgym_tpu.rl.player import play
from isaacgym_tpu.rl.ppo import PPOConfig, PPOTrainer
from isaacgym_tpu.utils import logging as L


@pytest.fixture(scope="module")
def small_env():
    return isaacgym_tpu.make(seed=0, task="HumanoidPingpongTiltNoEarlyStopG1",
                             num_envs=4, episodeLength=10)


@pytest.fixture(scope="module")
def trainer(small_env):
    cfg = PPOConfig(units=(32, 32), horizon_length=4, minibatch_size=8, mini_epochs=1)
    return PPOTrainer(small_env, cfg, seed=0)


def test_checkpoint_roundtrip(tmp_path, trainer):
    ts = trainer.init_state()
    path = str(tmp_path / "ckpt")
    ckpt.save(path, ts)
    ts2 = ckpt.restore(path, trainer.init_state())
    a = jax.tree.leaves(ts.params)
    b = jax.tree.leaves(ts2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    np.testing.assert_array_equal(np.asarray(ts.obs_stats.mean),
                                  np.asarray(ts2.obs_stats.mean))


def test_player_runs_episodes(small_env, trainer):
    ts = trainer.init_state()
    stats = play(small_env, trainer, ts, episodes=1)
    assert stats["episodes"] >= small_env.num_envs
    assert np.isfinite(stats["return_mean"])


def test_player_hit_flag_resolution():
    """The player's hit counter must track the task's actual hit event:
    C7 latches it as ``paddle_condition_calculated`` (mapped by
    event_flag_names), C10's flag of that name is a proximity window and
    its hit event is ``hit_paddle_count`` (default ``*_count`` map)."""
    from isaacgym_tpu.rl.player import resolve_hit_flag

    class C7Like:
        event_flag_names = {"paddle_condition_calculated": "hit_paddle",
                            "ball_missed": "miss"}

    class C10Like:
        event_flag_names = None

    c10_flags = {"paddle_condition_calculated": None,
                 "hit_paddle_count": None, "fall_down_count": None}
    assert resolve_hit_flag(C7Like(), {"paddle_condition_calculated": None}) \
        == "paddle_condition_calculated"
    assert resolve_hit_flag(C10Like(), c10_flags) == "hit_paddle_count"


def test_observers(tmp_path):
    run_dir = str(tmp_path / "run")
    obs = L.MultiObserver([L.EpisodeStatsObserver(), L.JsonlObserver(), L.PbtObserver(interval=1)])
    obs.after_init(run_dir, {"cfg": 1})
    obs.process_infos({
        "episode_done": np.asarray([True, False, True]),
        "episode_return": np.asarray([10.0, 0.0, 20.0]),
        "episode_length": np.asarray([5, 0, 7]),
    })
    metrics = {"a_loss": 0.1}
    obs.after_epoch(0, metrics)
    assert metrics["episode_return_mean"] == 15.0
    assert metrics["episode_length_mean"] == 6.0
    obs.close()
    lines = open(os.path.join(run_dir, "metrics.jsonl")).read().strip().splitlines()
    assert json.loads(lines[0])["a_loss"] == 0.1
    assert json.loads(open(os.path.join(run_dir, "pbt_objective.json")).read())["epoch"] == 0


def _inject_ball(env, state, pos, vel):
    root = state.sim.root
    root = root.at[:, env.ball_actor, 0:3].set(jnp.asarray(pos))
    root = root.at[:, env.ball_actor, 7:10].set(jnp.asarray(vel))
    return state._replace(sim=state.sim._replace(root=root))


def test_c6_hit_table_reward_fires_once():
    """Scripted trajectory parity (SURVEY.md §4): place the ball in the C6
    hit-table window moving +x after a paddle hit; the one-shot reward fires
    exactly once, then the flag suppresses it."""
    env = isaacgym_tpu.make(seed=0, task="HumanoidPingpongTiltG1",
                            num_envs=2, episodeLength=50)
    state, obs = env.reset()
    rb = env._rb_fn(state.sim)

    # ball bouncing up inside the opponent-half window (x in (2.44,3.1), z<0.83)
    sim1 = state.sim._replace(root=state.sim.root
                              .at[:, 2, 0:3].set(jnp.asarray([2.8, 0.0, 0.80]))
                              .at[:, 2, 7:10].set(jnp.asarray([3.0, 0.0, 1.0])))
    pre_ball = sim1.root[:, 2, :]
    rb1 = env._rb_fn(sim1)
    rew1, reset1, flags1 = jax.vmap(env.reward_single)(
        pre_ball, sim1, rb1, state.flags, state.progress + 1)
    assert float(rew1[0]) > 900.0  # hitTableReward 1000 dominates
    assert bool(flags1["reward_calculated"][0])

    # same condition again: flag suppresses the reward
    rew2, reset2, flags2 = jax.vmap(env.reward_single)(
        pre_ball, sim1, rb1, flags1, state.progress + 2)
    assert float(rew2[0]) < 500.0


def test_c7_velocity_reward_scripted():
    """C7 one-shot velocity-flip bonus: pre_vx < 0, vx > 1 -> alpha*|vx| once."""
    env = isaacgym_tpu.make(seed=0, task="HumanoidPingpongTiltNoEarlyStopG1",
                            num_envs=2, episodeLength=50)
    state, obs = env.reset()
    sim1 = state.sim._replace(root=state.sim.root
                              .at[:, 2, 0:3].set(jnp.asarray([0.5, -0.1, 1.1]))
                              .at[:, 2, 7:10].set(jnp.asarray([4.0, 0.0, 1.0])))
    pre_ball = sim1.root[:, 2, :].at[:, 7].set(-4.0)  # incoming before the hit
    rb1 = env._rb_fn(sim1)
    rew1, _, flags1 = jax.vmap(env.reward_single)(
        pre_ball, sim1, rb1, state.flags, state.progress + 1)
    # alpha=1000, |vx|=4 -> ~4000 (plus small pos/power terms)
    assert float(rew1[0]) > 3500.0
    assert bool(flags1["paddle_condition_calculated"][0])
    rew2, _, _ = jax.vmap(env.reward_single)(
        pre_ball, sim1, rb1, flags1, state.progress + 2)
    assert float(rew2[0]) < 100.0


def test_train_cli_end_to_end(tmp_path):
    """Launcher smoke: the full train.py CLI surface (Hydra-style overrides,
    config dump, checkpoint save) on CPU with a tiny config."""
    import subprocess, sys
    env_vars = dict(os.environ)
    env_vars["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, "train.py",
         "task=HumanoidPingpongTiltNoEarlyStopG1", "experiment=pytest_cli",
         "num_envs=2", "max_iterations=2", "device=cpu",
         "train.params.network.mlp.units=[8,8]",
         "train.params.config.minibatch_size=8",
         "train.params.config.horizon_length=4",
         "task.env.episodeLength=6"],
        capture_output=True, text=True, timeout=500, cwd=".", env=env_vars)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "done in" in out.stdout
    assert os.path.exists("runs/pytest_cli/config.json")
    assert os.path.exists("runs/pytest_cli/metrics.jsonl")
    assert os.path.isdir("runs/pytest_cli/ckpt_final")


def test_train_cli_episode_stats_accumulate_across_log_stride(tmp_path):
    """Regression: with episodeLength an exact multiple of horizon, episode
    boundaries land only in fixed epoch phases (C10: 160 = 5x32). The logger
    must accumulate episode sums across its stride, not read one epoch's —
    pre-fix the strided row aliased to zero episodes forever."""
    import json, shutil, subprocess, sys
    shutil.rmtree("runs/pytest_cli_acc", ignore_errors=True)
    env_vars = dict(os.environ)
    env_vars["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, "train.py",
         "task=HumanoidPingpongTiltNoEarlyStopG1", "experiment=pytest_cli_acc",
         "num_envs=2", "max_iterations=12", "device=cpu",
         "train.params.network.mlp.units=[8,8]",
         "train.params.config.minibatch_size=8",
         "train.params.config.horizon_length=4",
         # episodes last episodeLength-1 = 8 steps (reference reset
         # semantics) -> boundary every 2nd epoch, odd epochs only; logged
         # epoch 10 is even, so only the accumulator can see them
         "task.env.episodeLength=9"],
        capture_output=True, text=True, timeout=500, cwd=".", env=env_vars)
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in open("runs/pytest_cli_acc/metrics.jsonl")]
    row10 = [r for r in rows if r.get("epoch") == 10]
    assert row10, rows
    assert row10[0]["episode_count"] > 0
    assert row10[0]["episode_length_mean"] == pytest.approx(8.0)


def test_pbt_cli_exploit_explore(tmp_path):
    """PBT driver smoke (tools/pbt.py): population trains round-robin on one
    compiled epoch; the bottom member exploits a top member's state and
    explores its lr each round; history + best checkpoint written."""
    import json, shutil, subprocess, sys
    shutil.rmtree("runs/pytest_pbt", ignore_errors=True)
    env_vars = dict(os.environ)
    env_vars["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, "tools/pbt.py",
         "task=HumanoidPingpongTiltNoEarlyStopG1", "experiment=pytest_pbt",
         "population=3", "rounds=2", "epochs_per_round=2",
         "num_envs=2", "device=cpu", "seed=3",
         "train.params.network.mlp.units=[8,8]",
         "train.params.config.minibatch_size=8",
         "train.params.config.horizon_length=4",
         "task.env.episodeLength=6"],
        capture_output=True, text=True, timeout=500, cwd=".", env=env_vars)
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in
            open("runs/pytest_pbt/pbt_history.jsonl")]
    assert len(rows) == 2
    assert len(rows[0]["objectives"]) == 3
    # each round one member exploited; its lr explored off the donor's
    assert all(len(r["exploited"]) == 1 for r in rows)
    assert os.path.isdir("runs/pytest_pbt/ckpt_best")
    best = json.loads(out.stdout.strip().splitlines()[-1])
    assert best["best_objective"] >= max(rows[-1]["objectives"]) - 1e6
