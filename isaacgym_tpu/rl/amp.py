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

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import numpy as np
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


class AMPTrainer:
    """PPO + AMP discriminator; style reward blended into the task reward.

    ``demo_sampler(key, n) -> (n, amp_obs_dim)`` supplies reference-motion
    transitions (e.g. from :class:`isaacgym_tpu.rl.motion_lib.MotionLib`).
    """

    def __init__(self, env, cfg: PPOConfig, amp_obs_dim: int, demo_sampler,
                 task_reward_weight: float = 0.5, style_reward_weight: float = 0.5,
                 disc_lr: float = 1e-4, seed: int = 42):
        self.ppo = PPOTrainer(env, cfg, seed=seed)
        self.disc = AMPDiscriminator()
        self.demo_sampler = demo_sampler
        self.task_w = task_reward_weight
        self.style_w = style_reward_weight
        self.amp_obs_dim = amp_obs_dim
        self.disc_optimizer = optax.adam(disc_lr)
        self._apply = lambda p, x: self.disc.apply(p, x)
        self.seed = seed

    def init_state(self) -> Tuple[PPOTrainState, AMPState]:
        ppo_state = self.ppo.init_state()
        params = self.disc.init(jax.random.PRNGKey(self.seed + 1),
                                jnp.zeros((1, self.amp_obs_dim)))
        return ppo_state, AMPState(disc_params=params,
                                   disc_opt=self.disc_optimizer.init(params))

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
