"""Running mean/std normalizers (rl_games ``RunningMeanStd`` parity).

The reference trains with ``normalize_input: True`` and ``normalize_value:
True`` (/root/reference/cfg/train/HumanoidPingpongTiltNoEarlyStopG1PPO.yaml:50-51).
Pure-functional: the state is a pytree, updates use Chan's parallel variance
merge, safe to ``psum`` across data-parallel shards.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RunningStats(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray   # scalar


def init_stats(shape) -> RunningStats:
    return RunningStats(
        mean=jnp.zeros(shape, jnp.float32),
        var=jnp.ones(shape, jnp.float32),
        count=jnp.asarray(1e-4, jnp.float32),
    )


def update_stats(stats: RunningStats, batch: jnp.ndarray, axis=(0,)) -> RunningStats:
    """Merge a batch (reduced over ``axis``) into the running stats."""
    b_mean = jnp.mean(batch, axis=axis)
    b_var = jnp.var(batch, axis=axis)
    n = 1
    for a in axis:
        n *= batch.shape[a]
    b_count = jnp.asarray(float(n), jnp.float32)

    delta = b_mean - stats.mean
    tot = stats.count + b_count
    new_mean = stats.mean + delta * (b_count / tot)
    m_a = stats.var * stats.count
    m_b = b_var * b_count
    m2 = m_a + m_b + (delta ** 2) * (stats.count * b_count / tot)
    return RunningStats(mean=new_mean, var=m2 / tot, count=tot)


def normalize(stats: RunningStats, x: jnp.ndarray, clip: float = 5.0) -> jnp.ndarray:
    out = (x - stats.mean) / jnp.sqrt(stats.var + 1e-5)
    return jnp.clip(out, -clip, clip)


def denormalize(stats: RunningStats, x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.sqrt(stats.var + 1e-5) + stats.mean
