"""PPO trainer smoke + learning tests (small net on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import isaacgym_tpu
from isaacgym_tpu.rl.ppo import PPOConfig, PPOTrainer
from isaacgym_tpu.rl import normalizer as N
from isaacgym_tpu.rl.networks import ActorCritic, gaussian_logp


def test_running_stats_matches_numpy():
    rng = np.random.RandomState(0)
    data = rng.randn(1000, 3).astype(np.float32) * 2.5 + 1.0
    stats = N.init_stats((3,))
    for chunk in np.split(data, 10):
        stats = N.update_stats(stats, jnp.asarray(chunk))
    np.testing.assert_allclose(np.asarray(stats.mean), data.mean(0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(stats.var), data.var(0), rtol=1e-2)


def test_network_shapes_and_sigma():
    net = ActorCritic(num_actions=7, units=(32, 32))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((5, 80)))
    mu, log_sig, v = net.apply(params, jnp.zeros((5, 80)))
    assert mu.shape == (5, 7) and v.shape == (5,)
    np.testing.assert_allclose(np.asarray(log_sig), -2.0)


def test_gaussian_logp():
    mu = jnp.zeros((4, 2))
    log_sig = jnp.zeros((4, 2))
    lp = gaussian_logp(mu, log_sig, jnp.zeros((4, 2)))
    np.testing.assert_allclose(np.asarray(lp), 2 * -0.5 * np.log(2 * np.pi), rtol=1e-5)


def test_ppo_config_from_reference_yaml():
    from isaacgym_tpu.utils.config import compose
    cfg = compose("HumanoidPingpongTiltNoEarlyStopG1")
    ppo = PPOConfig.from_train_cfg(cfg["train"])
    assert ppo.gamma == 0.99 and ppo.tau == 0.95
    assert ppo.learning_rate == 2e-5
    assert ppo.horizon_length == 32
    assert ppo.critic_coef == 4.0
    assert ppo.units == (2048, 1536, 1024, 1024, 512, 512)
    assert ppo.sigma_init == -2.0
    assert ppo.reward_scale == 0.01


@pytest.mark.slow
def test_ppo_epoch_runs_on_c7():
    env = isaacgym_tpu.make(seed=0, task="HumanoidPingpongTiltNoEarlyStopG1", num_envs=4)
    cfg = PPOConfig(units=(32, 32), horizon_length=4, minibatch_size=8, mini_epochs=2)
    trainer = PPOTrainer(env, cfg, seed=0)
    ts = trainer.init_state()
    env_state, obs = env.reset()
    ts, env_state, obs, metrics = trainer.train_epoch(ts, env_state, obs)
    assert np.isfinite(float(metrics["reward_mean"]))
    assert np.isfinite(float(metrics["a_loss"]))
    assert int(ts.epoch) == 1
    # second epoch reuses the compiled function
    ts, env_state, obs, metrics = trainer.train_epoch(ts, env_state, obs)
    assert int(ts.epoch) == 2
