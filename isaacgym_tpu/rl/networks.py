"""Actor-critic networks (rl_games ``actor_critic`` builder parity, N9).

Architecture from the reference train config
(/root/reference/cfg/train/HumanoidPingpongTiltNoEarlyStopG1PPO.yaml:10-40):
separate actor/critic MLPs ``[2048, 1536, 1024, 1024, 512, 512]`` with ELU,
state-independent learnable log-std initialized to -2.0 (``fixed_sigma``),
linear mu/value heads.

TPU notes: hidden matmuls run in bfloat16 (MXU) with float32 params and
float32 heads — matches rl_games ``mixed_precision: True`` in spirit while
keeping the log-prob math exact.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

_ACTIVATIONS = {
    "elu": nn.elu,
    "relu": nn.relu,
    "selu": nn.selu,
    "silu": nn.silu,
    "tanh": nn.tanh,
}


class MLP(nn.Module):
    units: Sequence[int]
    activation: str = "elu"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        act = _ACTIVATIONS[self.activation]
        x = x.astype(self.compute_dtype)
        for width in self.units:
            x = nn.Dense(width, dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
            x = act(x)
        return x


class ActorCritic(nn.Module):
    num_actions: int
    units: Sequence[int] = (2048, 1536, 1024, 1024, 512, 512)
    activation: str = "elu"
    sigma_init: float = -2.0
    separate: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs):
        actor_trunk = MLP(self.units, self.activation, self.compute_dtype, name="actor_mlp")(obs)
        mu = nn.Dense(self.num_actions, dtype=jnp.float32, param_dtype=jnp.float32,
                      name="mu")(actor_trunk.astype(jnp.float32))
        if self.separate:
            critic_trunk = MLP(self.units, self.activation, self.compute_dtype, name="critic_mlp")(obs)
        else:
            critic_trunk = actor_trunk
        value = nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="value")(critic_trunk.astype(jnp.float32))[..., 0]
        log_sigma = self.param(
            "log_sigma", lambda key, shape: jnp.full(shape, self.sigma_init, jnp.float32),
            (self.num_actions,))
        return mu, jnp.broadcast_to(log_sigma, mu.shape), value


def gaussian_logp(mu, log_sigma, actions):
    """Diagonal-Gaussian log prob (summed over action dims)."""
    inv_var = jnp.exp(-2.0 * log_sigma)
    return jnp.sum(
        -0.5 * ((actions - mu) ** 2) * inv_var - log_sigma - 0.5 * jnp.log(2.0 * jnp.pi),
        axis=-1)


def gaussian_entropy(log_sigma):
    return jnp.sum(log_sigma + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)
