"""Adversarial Motion Prior (AMP) plumbing (SURVEY.md §2 N12).

The reference registers AMP builders into rl_games
(/root/reference/train.py:96-99,186-193: ``amp_continuous.AMPAgent``,
``amp_players``, ``ModelAMPContinuous``, ``amp_network_builder``) but no
pingpong task uses them. This module provides the working TPU-native
equivalent: a flax discriminator over (s, s') transition features, the
LSGAN-style discriminator loss with gradient penalty, the style-reward
transform, and an :class:`AMPTrainer` that composes the discriminator update
with the base PPO epoch (task reward blended with style reward).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from isaacgym_tpu.rl.ppo import PPOConfig, PPOTrainer, PPOTrainState


class AMPDiscriminator(nn.Module):
    """MLP discriminator over AMP observation pairs (rl_games units default)."""
    units: Sequence[int] = (1024, 512)

    @nn.compact
    def __call__(self, amp_obs):
        x = amp_obs
        for w in self.units:
            x = nn.relu(nn.Dense(w)(x))
        return nn.Dense(1)(x)[..., 0]


class AMPState(NamedTuple):
    disc_params: Any
    disc_opt: Any


def disc_loss(apply_fn, params, agent_obs, demo_obs, grad_penalty: float = 5.0):
    """LSGAN discriminator loss with R1-style gradient penalty on demos
    (the AMP paper / rl_games amp_continuous formulation)."""
    agent_logits = apply_fn(params, agent_obs)
    demo_logits = apply_fn(params, demo_obs)
    loss_agent = jnp.mean((agent_logits + 1.0) ** 2)
    loss_demo = jnp.mean((demo_logits - 1.0) ** 2)
    grads = jax.grad(lambda o: jnp.sum(apply_fn(params, o)))(demo_obs)
    gp = jnp.mean(jnp.sum(grads ** 2, axis=-1))
    total = 0.5 * (loss_agent + loss_demo) + grad_penalty * gp
    return total, {"disc_agent_logit": agent_logits.mean(),
                   "disc_demo_logit": demo_logits.mean(), "disc_grad_penalty": gp}


def style_reward(apply_fn, params, amp_obs, scale: float = 2.0):
    """AMP style reward (Peng et al. 2021): r = max(0, 1 - 0.25*(d-1)^2)."""
    d = apply_fn(params, amp_obs)
    return scale * jnp.maximum(1.0 - 0.25 * (d - 1.0) ** 2, 0.0)


class _BlendedEnv:
    """Env wrapper whose ``step_fn`` blends the AMP style reward into the
    task reward. The wrapper state is ``(inner_state, prev_obs, disc_params)``
    so the discriminator weights flow through the jitted PPO epoch as data
    (re-injected each epoch by :meth:`AMPTrainer.train_epoch`)."""

    def __init__(self, env, amp: "AMPTrainer"):
        self._env = env
        self._amp = amp
        self.num_envs = env.num_envs
        self.num_obs = env.num_obs
        self.num_actions = env.num_actions
        self.max_episode_length = getattr(env, "max_episode_length", 1000)

        def step(state, action):
            inner, prev_obs, params = state
            inner, obs2, rew, done, info = env.step_fn(inner, action)
            amp_obs = amp.amp_obs_fn(prev_obs, obs2)
            style = style_reward(amp._apply, params, amp_obs)
            rew = amp.task_w * rew + amp.style_w * style
            return (inner, obs2, params), obs2, rew, done, info

        self.step_fn = step

    def reset(self, disc_params):
        inner, obs = self._env.reset()
        return (inner, obs, disc_params), obs


class AMPTrainer:
    """PPO + AMP discriminator; style reward blended into the task reward.

    ``demo_sampler(key, n) -> (n, amp_obs_dim)`` supplies reference-motion
    transitions (e.g. from :class:`isaacgym_tpu.rl.motion_lib.MotionLib`).
    ``amp_obs_fn(prev_obs, next_obs) -> (B, amp_obs_dim)`` extracts the
    transition features the discriminator judges (defaults to the
    concatenated observation pair).
    """

    def __init__(self, env, cfg: PPOConfig, amp_obs_dim: int, demo_sampler,
                 task_reward_weight: float = 0.5, style_reward_weight: float = 0.5,
                 disc_lr: float = 1e-4, seed: int = 42, amp_obs_fn=None,
                 disc_rollout_steps: int = 4):
        self.env = env
        self.demo_sampler = demo_sampler
        self.task_w = task_reward_weight
        self.style_w = style_reward_weight
        self.amp_obs_dim = amp_obs_dim
        self.amp_obs_fn = amp_obs_fn or (
            lambda o, o2: jnp.concatenate([o, o2], axis=-1))
        self.disc = AMPDiscriminator()
        self.disc_optimizer = optax.adam(disc_lr)
        self._apply = lambda p, x: self.disc.apply(p, x)
        self.seed = seed
        self.disc_rollout_steps = disc_rollout_steps
        self.wrapped = _BlendedEnv(env, self)
        self.ppo = PPOTrainer(self.wrapped, cfg, seed=seed)
        self._collect = jax.jit(self._collect_amp_obs)

    def init_state(self) -> Tuple[PPOTrainState, AMPState]:
        ppo_state = self.ppo.init_state()
        params = self.disc.init(jax.random.PRNGKey(self.seed + 1),
                                jnp.zeros((1, self.amp_obs_dim)))
        return ppo_state, AMPState(disc_params=params,
                                   disc_opt=self.disc_optimizer.init(params))

    def reset(self, amp_state: AMPState):
        return self.wrapped.reset(amp_state.disc_params)

    def disc_update(self, amp_state: AMPState, agent_obs, demo_obs):
        grad_fn = jax.value_and_grad(
            lambda p: disc_loss(self._apply, p, agent_obs, demo_obs), has_aux=True)
        (loss, aux), grads = grad_fn(amp_state.disc_params)
        updates, opt = self.disc_optimizer.update(grads, amp_state.disc_opt)
        params = optax.apply_updates(amp_state.disc_params, updates)
        return AMPState(disc_params=params, disc_opt=opt), {"disc_loss": loss, **aux}

    def blended_reward(self, amp_state: AMPState, task_reward, amp_obs):
        style = style_reward(self._apply, amp_state.disc_params, amp_obs)
        return self.task_w * task_reward + self.style_w * style

    # ------------------------------------------------------------------

    def _collect_amp_obs(self, ppo_state: PPOTrainState, inner_state, obs):
        """Short deterministic rollout of the raw env collecting agent
        transition features for the discriminator."""
        def body(carry, _):
            s, o = carry
            mu, _, _ = self.ppo._policy(ppo_state.params, ppo_state.obs_stats, o)
            s, o2, _r, _d, _info = self.env.step_fn(s, mu)
            return (s, o2), self.amp_obs_fn(o, o2)

        (inner_state, obs), pairs = jax.lax.scan(
            body, (inner_state, obs), None, length=self.disc_rollout_steps)
        return inner_state, obs, pairs.reshape(-1, pairs.shape[-1])

    def train_epoch(self, ppo_state: PPOTrainState, amp_state: AMPState,
                    env_state, obs, key):
        """One AMP iteration (the rl_games amp_continuous epoch shape):
        discriminator update on fresh agent transitions vs a demo batch,
        then a full PPO epoch on style-blended rewards."""
        inner, _prev_obs, _ = env_state
        inner, obs, agent_obs = self._collect(ppo_state, inner, obs)
        demo_obs = self.demo_sampler(key, agent_obs.shape[0])
        amp_state, disc_metrics = self.disc_update(amp_state, agent_obs, demo_obs)
        # the PPO epoch donates env_state; copy the leaves that are also
        # referenced outside it (prev_obs == obs arg, disc params in amp_state)
        env_state = (inner, jnp.copy(obs),
                     jax.tree.map(jnp.copy, amp_state.disc_params))
        ppo_state, env_state, obs, metrics = self.ppo.train_epoch(
            ppo_state, env_state, obs)
        return ppo_state, amp_state, env_state, obs, {**metrics, **disc_metrics}
