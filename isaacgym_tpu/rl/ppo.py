"""PPO trainer — rl_games ``a2c_continuous`` capability, TPU-native (N9).

Hyperparameter surface and loss details follow the reference train config
(/root/reference/cfg/train/HumanoidPingpongTiltNoEarlyStopG1PPO.yaml): GAE
(γ, τ), constant lr, e_clip with value clipping, critic_coef, grad-norm
truncation, σ-entropy, mu bounds loss, reward scaling, value bootstrap on
timeout, input/value running normalization.

The whole epoch — ``lax.scan`` rollout over the fused env step, GAE,
mini-epoch/minibatch updates — is ONE jitted function; nothing touches the
host (reference hot loop §3.2 required a device->host sync per step).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from isaacgym_tpu.rl import normalizer as N
from isaacgym_tpu.rl.networks import ActorCritic, gaussian_entropy, gaussian_logp


@dataclass(frozen=True)
class PPOConfig:
    gamma: float = 0.99
    tau: float = 0.95
    learning_rate: float = 2e-5
    lr_schedule: str = "constant"  # constant | linear | adaptive (rl_games)
    kl_threshold: float = 0.008
    e_clip: float = 0.2
    horizon_length: int = 32
    minibatch_size: int = 4096
    mini_epochs: int = 5
    critic_coef: float = 4.0
    entropy_coef: float = 0.0
    bounds_loss_coef: float = 0.0001
    grad_norm: float = 10.0
    truncate_grads: bool = True
    clip_value: bool = True
    normalize_input: bool = True
    normalize_value: bool = True
    normalize_advantage: bool = True
    value_bootstrap: bool = True
    reward_scale: float = 0.01
    max_epochs: int = 200000
    units: Tuple[int, ...] = (2048, 1536, 1024, 1024, 512, 512)
    activation: str = "elu"
    sigma_init: float = -2.0
    separate: bool = True
    #: run the optimizer on one flattened parameter vector (optax.flatten):
    #: collapses the per-tensor Adam/global-norm kernel launches (16 tensors
    #: for the separate actor/critic) into single fused passes. Changes the
    #: opt_state checkpoint layout, so it is opt-in (train yaml
    #: ``flatten_optimizer: true``).
    flatten_optimizer: bool = False

    @staticmethod
    def from_train_cfg(train_cfg: Dict[str, Any]) -> "PPOConfig":
        """Build from a reference-format train YAML dict (params.*)."""
        p = train_cfg.get("params", train_cfg)
        c = p.get("config", {})
        net = p.get("network", {})
        mlp = net.get("mlp", {})
        sigma = (net.get("space", {}).get("continuous", {})
                 .get("sigma_init", {}).get("val", -2.0))
        return PPOConfig(
            gamma=float(c.get("gamma", 0.99)),
            tau=float(c.get("tau", 0.95)),
            learning_rate=float(c.get("learning_rate", 2e-5)),
            lr_schedule=str(c.get("lr_schedule", "constant") or "constant").lower(),
            kl_threshold=float(c.get("kl_threshold", 0.008)),
            e_clip=float(c.get("e_clip", 0.2)),
            horizon_length=int(c.get("horizon_length", 32)),
            minibatch_size=int(c.get("minibatch_size", 4096)),
            mini_epochs=int(c.get("mini_epochs", 5)),
            critic_coef=float(c.get("critic_coef", 4.0)),
            entropy_coef=float(c.get("entropy_coef", 0.0)),
            bounds_loss_coef=float(c.get("bounds_loss_coef", 1e-4) or 0.0),
            grad_norm=float(c.get("grad_norm", 10.0)),
            truncate_grads=bool(c.get("truncate_grads", True)),
            clip_value=bool(c.get("clip_value", True)),
            normalize_input=bool(c.get("normalize_input", True)),
            normalize_value=bool(c.get("normalize_value", True)),
            normalize_advantage=bool(c.get("normalize_advantage", True)),
            value_bootstrap=bool(c.get("value_bootstrap", True)),
            reward_scale=float(c.get("reward_shaper", {}).get("scale_value", 1.0)),
            max_epochs=int(c.get("max_epochs", 200000)),
            units=tuple(mlp.get("units", (2048, 1536, 1024, 1024, 512, 512))),
            activation=str(mlp.get("activation", "elu")),
            sigma_init=float(sigma),
            separate=bool(net.get("separate", True)),
            flatten_optimizer=bool(c.get("flatten_optimizer", False)),
        )


class PPOTrainState(NamedTuple):
    params: Any
    opt_state: Any
    obs_stats: N.RunningStats
    value_stats: N.RunningStats
    rng: jnp.ndarray
    epoch: jnp.ndarray
    last_lr: jnp.ndarray


def gaussian_kl(mu0, log_sig0, mu1, log_sig1):
    """Analytic KL(N0 || N1) summed over action dims, mean over batch.

    Mirrors rl_games ``torch_ext.policy_kl`` (the quantity the adaptive lr
    scheduler thresholds on): called with (new, old) exactly as
    rl_games ``calc_gradients`` does.
    """
    kl = (log_sig1 - log_sig0
          + (jnp.exp(2.0 * log_sig0) + (mu0 - mu1) ** 2)
          / (2.0 * jnp.exp(2.0 * log_sig1) + 1e-10) - 0.5)
    return jnp.sum(kl, axis=-1).mean()


class PPOTrainer:
    """Owns the network + jitted train-epoch over a TpuVecTask env."""

    def __init__(self, env, cfg: PPOConfig, seed: int = 42):
        self.env = env
        self.cfg = cfg
        self.net = ActorCritic(
            num_actions=env.num_actions, units=cfg.units,
            activation=cfg.activation, sigma_init=cfg.sigma_init,
            separate=cfg.separate)
        def make_tx(learning_rate):
            tx = [optax.clip_by_global_norm(cfg.grad_norm)] if cfg.truncate_grads else []
            tx.append(optax.adam(learning_rate, eps=1e-8))
            chain = optax.chain(*tx)
            return optax.flatten(chain) if cfg.flatten_optimizer else chain

        # inject_hyperparams lets the lr schedule (rl_games constant/linear/
        # adaptive, cfg.lr_schedule) retune the lr inside the jitted epoch.
        self.optimizer = optax.inject_hyperparams(make_tx)(
            learning_rate=cfg.learning_rate)
        self.seed = seed
        self.train_epoch = jax.jit(self._train_epoch, donate_argnums=(0, 1))

    # ------------------------------------------------------------------

    def init_state(self) -> PPOTrainState:
        rng = jax.random.PRNGKey(self.seed)
        rng, k = jax.random.split(rng)
        params = self.net.init(k, jnp.zeros((1, self.env.num_obs)))
        return PPOTrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            obs_stats=N.init_stats((self.env.num_obs,)),
            value_stats=N.init_stats(()),
            rng=rng,
            epoch=jnp.asarray(0, jnp.int32),
            last_lr=jnp.asarray(self.cfg.learning_rate, jnp.float32),
        )

    def _policy(self, params, obs_stats, obs):
        obs_n = N.normalize(obs_stats, obs) if self.cfg.normalize_input else obs
        return self.net.apply(params, obs_n)

    # ------------------------------------------------------------------

    def _train_epoch(self, ts: PPOTrainState, env_state, obs):
        """One full PPO epoch = rollout+GAE then minibatch updates.

        Factored into ``_rollout_and_gae`` / ``_update`` so a profiler can
        jit and time each phase separately (docs/PERF.md); ``train_epoch``
        still jits the composition as one graph.
        """
        env_state, last_obs, rng, batch, obs_stats, value_stats, roll_metrics = \
            self._rollout_and_gae(ts, env_state, obs)
        rng, k = jax.random.split(rng)
        params, opt_state, last_lr, aux = self._update(ts, batch, obs_stats, k)

        metrics = {**roll_metrics,
                   **{k_: v[-1] for k_, v in aux.items()},
                   "last_lr": last_lr}
        new_ts = PPOTrainState(
            params=params, opt_state=opt_state, obs_stats=obs_stats,
            value_stats=value_stats, rng=rng, epoch=ts.epoch + 1,
            last_lr=last_lr)
        return new_ts, env_state, last_obs, metrics

    def _rollout_and_gae(self, ts: PPOTrainState, env_state, obs):
        cfg = self.cfg
        env_step = self.env.step_fn
        B = self.env.num_envs
        H = cfg.horizon_length

        # ---------------- rollout (lax.scan over the fused env step) -------
        def rollout_step(carry, _):
            env_state, obs, rng = carry
            rng, k = jax.random.split(rng)
            mu, log_sig, value_n = self._policy(ts.params, ts.obs_stats, obs)
            value = (N.denormalize(ts.value_stats, value_n)
                     if cfg.normalize_value else value_n)
            noise = jax.random.normal(k, mu.shape)
            action = mu + jnp.exp(log_sig) * noise
            logp = gaussian_logp(mu, log_sig, action)
            env_state, next_obs, rew, done, info = env_step(env_state, action)
            out = dict(obs=obs, action=action, logp=logp, value=value,
                       reward=rew, done=done, time_out=info["time_outs"],
                       mu=mu, sigma=log_sig,
                       ep_return=info.get("episode_return", rew * 0.0),
                       ep_len=info.get("episode_length", done * 0),
                       ep_done=info.get("episode_done", done),
                       ep_events={k: v.astype(jnp.float32) for k, v in
                                  info.get("episode_events", {}).items()})
            return (env_state, next_obs, rng), out

        (env_state, last_obs, rng), traj = jax.lax.scan(
            rollout_step, (env_state, obs, ts.rng), None, length=H)

        # bootstrap value for the final state
        _, _, last_value_n = self._policy(ts.params, ts.obs_stats, last_obs)
        last_value = (N.denormalize(ts.value_stats, last_value_n)
                      if cfg.normalize_value else last_value_n)

        rewards = traj["reward"] * cfg.reward_scale
        if cfg.value_bootstrap:
            # rl_games: add γ·V(s) on truncation-only terminations
            rewards = rewards + cfg.gamma * traj["value"] * traj["time_out"].astype(jnp.float32)

        # ---------------- GAE ----------------------------------------------
        not_done = 1.0 - traj["done"].astype(jnp.float32)

        def gae_step(gae_and_next_value, inp):
            gae, next_value = gae_and_next_value
            rew, value, nd = inp
            delta = rew + cfg.gamma * next_value * nd - value
            gae = delta + cfg.gamma * cfg.tau * nd * gae
            return (gae, value), gae

        (_, _), adv = jax.lax.scan(
            gae_step, (jnp.zeros(B), last_value),
            (rewards, traj["value"], not_done), reverse=True)
        returns = adv + traj["value"]

        # ---------------- normalizer updates --------------------------------
        obs_stats = (N.update_stats(ts.obs_stats, traj["obs"].reshape(-1, self.env.num_obs))
                     if cfg.normalize_input else ts.obs_stats)
        value_stats = (N.update_stats(ts.value_stats, returns.reshape(-1))
                       if cfg.normalize_value else ts.value_stats)
        returns_n = N.normalize(value_stats, returns, clip=jnp.inf) if cfg.normalize_value else returns
        values_n = N.normalize(value_stats, traj["value"], clip=jnp.inf) if cfg.normalize_value else traj["value"]

        if cfg.normalize_advantage:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        # ---------------- flatten + minibatch updates -----------------------
        T = H * B
        batch = dict(
            obs=traj["obs"].reshape(T, -1),
            action=traj["action"].reshape(T, -1),
            logp=traj["logp"].reshape(T),
            mu=traj["mu"].reshape(T, -1),
            sigma=traj["sigma"].reshape(T, -1),
            value_n=values_n.reshape(T),
            adv=adv.reshape(T),
            returns_n=returns_n.reshape(T),
        )
        ep_done_f = traj["ep_done"].astype(jnp.float32)
        # episode stats as SUMS (multi-host safe: psum sums, not means;
        # SURVEY.md §7 hard part 6)
        roll_metrics = {
            "episode_return_sum": jnp.sum(traj["ep_return"]),
            "episode_length_sum": jnp.sum(traj["ep_len"].astype(jnp.float32)),
            "episode_count": jnp.sum(ep_done_f),
            "reward_mean": traj["reward"].mean(),
            # outlier telemetry: a single exploding reward step poisons value
            # targets long before it moves the mean
            "reward_min": traj["reward"].min(),
            "reward_max": traj["reward"].max(),
            "episode_reward_scale": rewards.mean(),
            "value_mean": traj["value"].mean(),
            "adv_std": adv.std(),
        }
        # per-episode event sums (reference C10 event-counter telemetry);
        # sums, not rates, so multi-host reduction stays a psum
        for k, v in traj["ep_events"].items():
            roll_metrics[f"event_{k}_sum"] = jnp.sum(v)
        return env_state, last_obs, rng, batch, obs_stats, value_stats, roll_metrics

    def _update(self, ts: PPOTrainState, batch, obs_stats, rng):
        cfg = self.cfg
        T = batch["logp"].shape[0]
        mb = min(cfg.minibatch_size, T)
        num_mb = T // mb

        def loss_fn(params, mbatch):
            obs_n = (N.normalize(obs_stats, mbatch["obs"])
                     if cfg.normalize_input else mbatch["obs"])
            mu, log_sig, value = self.net.apply(params, obs_n)
            logp = gaussian_logp(mu, log_sig, mbatch["action"])
            ratio = jnp.exp(logp - mbatch["logp"])
            surr1 = mbatch["adv"] * ratio
            surr2 = mbatch["adv"] * jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip)
            a_loss = -jnp.minimum(surr1, surr2).mean()

            if cfg.clip_value:
                v_clipped = mbatch["value_n"] + jnp.clip(
                    value - mbatch["value_n"], -cfg.e_clip, cfg.e_clip)
                c_loss = jnp.maximum((value - mbatch["returns_n"]) ** 2,
                                     (v_clipped - mbatch["returns_n"]) ** 2).mean()
            else:
                c_loss = ((value - mbatch["returns_n"]) ** 2).mean()

            entropy = gaussian_entropy(log_sig[..., 0, :] if log_sig.ndim > 2 else log_sig).mean()
            b_loss = jnp.sum(
                jnp.maximum(mu - 1.1, 0.0) ** 2 + jnp.maximum(-1.1 - mu, 0.0) ** 2,
                axis=-1).mean()

            total = (a_loss + 0.5 * cfg.critic_coef * c_loss
                     - cfg.entropy_coef * entropy + cfg.bounds_loss_coef * b_loss)
            # analytic gaussian KL(new || old), the rl_games scheduler signal
            kl = gaussian_kl(jax.lax.stop_gradient(mu),
                             jax.lax.stop_gradient(log_sig),
                             mbatch["mu"], mbatch["sigma"])
            return total, dict(a_loss=a_loss, c_loss=c_loss, entropy=entropy,
                               b_loss=b_loss, kl=kl)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        # epoch-level lr schedules (rl_games LinearScheduler: linear decay to
        # 0 over max_epochs, floored at min_lr; constant: identity)
        if cfg.lr_schedule == "linear":
            frac = 1.0 - ts.epoch.astype(jnp.float32) / float(cfg.max_epochs)
            lr0 = jnp.maximum(cfg.learning_rate * jnp.clip(frac, 0.0, 1.0), 1e-6)
        else:
            lr0 = ts.last_lr

        def minibatch_step(carry, idx):
            params, opt_state, lr = carry
            mbatch = jax.tree.map(lambda x: x[idx], batch)
            (_, aux), grads = grad_fn(params, mbatch)
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if cfg.lr_schedule == "adaptive":
                # rl_games AdaptiveScheduler: ×/÷1.5 on the per-minibatch KL,
                # clamped to [1e-6, 1e-2]; takes effect next minibatch
                # (schedule_type 'legacy' in a2c_common.train_epoch).
                kl = aux["kl"]
                lr = jnp.where(kl > 2.0 * cfg.kl_threshold,
                               jnp.maximum(lr / 1.5, 1e-6), lr)
                lr = jnp.where(kl < 0.5 * cfg.kl_threshold,
                               jnp.minimum(lr * 1.5, 1e-2), lr)
            aux = dict(aux, last_lr=lr)
            return (params, opt_state, lr), aux

        def epoch_step(carry, k):
            params, opt_state, lr = carry
            perm = jax.random.permutation(k, T)[: num_mb * mb].reshape(num_mb, mb)
            (params, opt_state, lr), aux = jax.lax.scan(
                minibatch_step, (params, opt_state, lr), perm)
            return (params, opt_state, lr), jax.tree.map(jnp.mean, aux)

        epoch_keys = jax.random.split(rng, cfg.mini_epochs)
        (params, opt_state, last_lr), aux = jax.lax.scan(
            epoch_step, (ts.params, ts.opt_state, lr0), epoch_keys)
        return params, opt_state, last_lr, aux
