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


def test_preprocess_train_config_model_size_multiplier():
    """PBT network-mutation surface (/root/reference/train.py:38-68)."""
    from isaacgym_tpu.utils.config import compose, preprocess_train_config
    cfg = compose("HumanoidPingpongTiltNoEarlyStopG1",
                  ["train.params.network.mlp.model_size_multiplier=2",
                   "pbt.enabled=true", "pbt.policy_idx=3"])
    train = preprocess_train_config(cfg)
    ppo = PPOConfig.from_train_cfg(train)
    assert ppo.units == (4096, 3072, 2048, 2048, 1024, 1024)
    tc = train["params"]["config"]
    assert tc["population_based_training"] is True and tc["pbt_idx"] == 3
    # multiplier 1 / absent key are no-ops
    cfg2 = compose("HumanoidPingpongTiltNoEarlyStopG1")
    ppo2 = PPOConfig.from_train_cfg(preprocess_train_config(cfg2))
    assert ppo2.units == (2048, 1536, 1024, 1024, 512, 512)
    assert cfg2["train"]["params"]["config"]["pbt_idx"] is None


def test_ppo_config_reads_lr_schedule():
    from isaacgym_tpu.utils.config import compose
    cfg = compose("HumanoidPingpongTiltNoEarlyStopG1")
    ppo = PPOConfig.from_train_cfg(cfg["train"])
    assert ppo.lr_schedule == "constant"
    assert ppo.kl_threshold == 0.008


def test_gaussian_kl_identities():
    from isaacgym_tpu.rl.ppo import gaussian_kl
    mu = jnp.array([[0.3, -0.2]])
    ls = jnp.array([[-1.0, 0.5]])
    # KL(p || p) == 0
    np.testing.assert_allclose(float(gaussian_kl(mu, ls, mu, ls)), 0.0, atol=1e-6)
    # mean shift of Δ at σ=1: KL = Δ²/2 per dim
    z = jnp.zeros((1, 2))
    kl = float(gaussian_kl(z, z, z + 2.0, z))
    np.testing.assert_allclose(kl, 2 * (2.0 ** 2) / 2.0, rtol=1e-5)


class _ToyEnv:
    """Minimal stateless env: reward = -sum(action²); fixed obs noise."""

    num_envs = 16
    num_obs = 6
    num_actions = 3

    def __init__(self):
        def step(state, action):
            key, t = state
            key, k = jax.random.split(key)
            obs = jax.random.normal(k, (self.num_envs, self.num_obs))
            rew = -jnp.sum(action ** 2, axis=-1)
            done = jnp.zeros(self.num_envs, jnp.bool_)
            info = dict(time_outs=done, episode_return=rew,
                        episode_length=jnp.zeros(self.num_envs, jnp.int32),
                        episode_done=done)
            return (key, t + 1), obs, rew, done, info
        self.step_fn = step

    def reset(self):
        key = jax.random.PRNGKey(0)
        return (key, jnp.asarray(0)), jnp.zeros((self.num_envs, self.num_obs))


def test_adaptive_lr_schedule_moves_lr():
    """With a tiny KL (tiny lr → policy barely moves) adaptive must RAISE lr;
    rl_games AdaptiveScheduler semantics (×1.5 per minibatch, cap 1e-2)."""
    env = _ToyEnv()
    cfg = PPOConfig(units=(16, 16), horizon_length=4, minibatch_size=16,
                    mini_epochs=2, learning_rate=1e-7, lr_schedule="adaptive",
                    kl_threshold=0.008)
    trainer = PPOTrainer(env, cfg, seed=0)
    ts = trainer.init_state()
    env_state, obs = env.reset()
    ts, env_state, obs, metrics = trainer.train_epoch(ts, env_state, obs)
    assert float(ts.last_lr) > 1e-7  # KL ≈ 0 < 0.5·thr → lr grew
    assert float(ts.last_lr) <= 1e-2
    assert np.isfinite(float(metrics["last_lr"]))


def test_constant_lr_schedule_keeps_lr():
    env = _ToyEnv()
    cfg = PPOConfig(units=(16, 16), horizon_length=4, minibatch_size=16,
                    mini_epochs=1, learning_rate=3e-4, lr_schedule="constant")
    trainer = PPOTrainer(env, cfg, seed=0)
    ts = trainer.init_state()
    env_state, obs = env.reset()
    ts, *_ = trainer.train_epoch(ts, env_state, obs)
    np.testing.assert_allclose(float(ts.last_lr), 3e-4, rtol=1e-6)


def test_linear_lr_schedule_decays():
    env = _ToyEnv()
    cfg = PPOConfig(units=(16, 16), horizon_length=4, minibatch_size=16,
                    mini_epochs=1, learning_rate=1e-3, lr_schedule="linear",
                    max_epochs=10)
    trainer = PPOTrainer(env, cfg, seed=0)
    ts = trainer.init_state()
    env_state, obs = env.reset()
    for _ in range(3):
        ts, env_state, obs, metrics = trainer.train_epoch(ts, env_state, obs)
    # epoch index 2 used frac 1 - 2/10
    np.testing.assert_allclose(float(ts.last_lr), 1e-3 * 0.8, rtol=1e-5)


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
