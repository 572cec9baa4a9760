"""Distributed/sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4: env-shard equivalence; §5.8 mesh design)."""

import numpy as np
import jax.numpy as jnp

import isaacgym_tpu
from isaacgym_tpu.parallel import mesh as M


def test_mesh_shapes():
    mesh = M.make_mesh(8, model_parallel=2)
    assert dict(mesh.shape) == {"dp": 4, "mdl": 2}
    mesh = M.make_mesh(8)
    assert dict(mesh.shape) == {"dp": 8, "mdl": 1}


def test_env_shard_equivalence():
    """Sharding the env batch over 8 devices must not change trajectories:
    physics is env-local (zero cross-chip communication, SURVEY.md §5.8)."""
    env = isaacgym_tpu.make(seed=5, task="HumanoidPingpongTiltNoEarlyStopG1",
                            num_envs=16, episodeLength=12)
    mesh = M.make_mesh(8)

    def roll(shard: bool):
        state, obs = env.reset()
        if shard:
            state = M.shard_env_tree(state, mesh)
            obs = M.shard_env_tree(obs, mesh)
        out = []
        for _ in range(6):
            state, obs, rew, done, info = env.step(state, jnp.zeros((16, 7)))
            out.append(np.asarray(rew))
        return np.stack(out), np.asarray(obs)

    rew_a, obs_a = roll(False)
    rew_b, obs_b = roll(True)
    np.testing.assert_allclose(rew_a, rew_b, atol=1e-5)
    np.testing.assert_allclose(obs_a, obs_b, atol=1e-5)


def test_sharded_train_epoch_runs():
    """Full PPO epoch with dp-sharded env state + tp-sharded MLP trunks."""
    from isaacgym_tpu.rl.ppo import PPOConfig, PPOTrainer

    env = isaacgym_tpu.make(seed=1, task="HumanoidPingpongTiltNoEarlyStopG1",
                            num_envs=16, episodeLength=8)
    cfg = PPOConfig(units=(64, 64), horizon_length=4, minibatch_size=16, mini_epochs=2)
    trainer = PPOTrainer(env, cfg, seed=0)
    ts = trainer.init_state()
    env_state, obs = env.reset()

    mesh = M.make_mesh(8, model_parallel=2)
    env_state = M.shard_env_tree(env_state, mesh)
    obs = M.shard_env_tree(obs, mesh)
    ts = ts._replace(params=M.shard_params_tp(ts.params, mesh))

    ts, env_state, obs, metrics = trainer.train_epoch(ts, env_state, obs)
    assert np.isfinite(float(metrics["a_loss"]))
    assert np.isfinite(float(metrics["reward_mean"]))
    # tp placement survived the update (params still sharded over mdl)
    kernel = ts.params["params"]["actor_mlp"]["Dense_0"]["kernel"]
    assert not kernel.sharding.is_fully_replicated


def test_dryrun_multichip_entry():
    """The driver-facing entry must run on the virtual mesh."""
    import importlib.util
    spec = importlib.util.spec_from_file_location("graft_entry", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
