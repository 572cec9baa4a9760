"""Deterministic play/eval — the rl_games player capability
(reference §3.4: ``runner.run({'play': True, 'checkpoint': ...})``,
/root/reference/train.py:210-214, command at pingpong_note.txt:165).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp



def resolve_hit_flag(env, flags) -> str:
    """Name of the env-state flag that latches an actual paddle hit.

    Uses the same event-name map ``vec_task`` uses for episode stats
    (C7 latches the hit as ``paddle_condition_calculated``; C10's
    proximity flag of that name is NOT a hit — its hit event is
    ``hit_paddle_count``).
    """
    ev_map = (env.event_flag_names if getattr(env, "event_flag_names", None)
              else {k: k[: -len("_count")] for k in flags
                    if k.endswith("_count")})
    return next((fl for fl, name in ev_map.items() if name == "hit_paddle"),
                "paddle_condition_calculated")


def play(env, trainer, train_state, episodes: int = 4, sigma: Optional[float] = None):
    """Run deterministic (or σ-override) episodes; returns aggregate stats."""
    ts = train_state

    @jax.jit
    def policy_step(env_state, obs, key):
        mu, log_sig, _ = trainer._policy(ts.params, ts.obs_stats, obs)
        if sigma is None:
            action = mu
        else:
            action = mu + sigma * jax.random.normal(key, mu.shape)
        return env.step_fn(env_state, action)

    env_state, obs = env.reset()
    B = env.num_envs
    key = jax.random.PRNGKey(0)
    ep_returns = np.zeros(B)
    done_returns = []
    hits = 0
    steps = 0
    prev_hit = np.zeros(B, bool)
    hit_flag = resolve_hit_flag(env, getattr(env_state, "flags", {}) or {})
    while len(done_returns) < episodes * B and steps < env.max_episode_length * (episodes + 1):
        key, k = jax.random.split(key)
        env_state, obs, rew, done, info = policy_step(env_state, obs, k)
        ep_returns += np.asarray(rew)
        steps += 1
        # paddle-hit flag is one-shot per episode: count rising edges only
        cur_hit = np.asarray(env_state.flags.get(
            hit_flag, jnp.zeros(B, bool)))
        hits += int((cur_hit & ~prev_hit).sum())
        prev_hit = cur_hit
        d = np.asarray(done)
        if d.any():
            done_returns.extend(ep_returns[d].tolist())
            ep_returns[d] = 0.0
            prev_hit = prev_hit & ~d
    n_ep = len(done_returns)
    return {
        "episodes": n_ep,
        "return_mean": float(np.mean(done_returns)) if done_returns else 0.0,
        "return_std": float(np.std(done_returns)) if done_returns else 0.0,
        "hits": hits,
        "hit_rate": float(hits) / max(n_ep, 1),
        "steps": steps,
    }
