"""PPO train-epoch profiler: rollout-vs-update split, FLOP count, MFU.

VERDICT r1 item 2: the end-to-end trainer (~250k env-steps/s) — not the sim
(~11M) — bounds wall-clock, and nobody had measured what fraction of the
chip's MXU the update path achieves. This tool answers that:

  * times the full jitted ``train_epoch`` plus its two halves separately
    (``PPOTrainer._rollout_and_gae`` / ``PPOTrainer._update``, same code the
    composed epoch runs);
  * counts matmul FLOPs analytically from the actual param shapes
    (fwd = 2*sum(in*out) per sample; bwd = 2x fwd) and cross-checks with
    XLA's own ``cost_analysis()`` on the compiled executables;
  * reports MFU against the chip's bf16 peak (the trunks are bf16 MXU
    matmuls, networks.py).

Usage:
  python tools/profile_ppo.py [num_envs] [task] [--trace [dir]]

``--trace`` additionally wraps one epoch in ``jax.profiler.trace`` so the
result can be opened in TensorBoard/XProf.

Reference context: cfg/train/HumanoidPingpongG1PPO.yaml (rl_games) defines
the [2048,1536,1024,1024,512,512] separate actor/critic, minibatch 4096,
5 mini-epochs surface being profiled.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# chip peak dense-matmul throughput, FLOP/s
_PEAKS = {
    "TPU v5 lite": {"bf16": 197e12, "f32": 197e12 / 4},   # v5e MXU
    "TPU v5": {"bf16": 459e12, "f32": 459e12 / 4},        # v5p
    "TPU v4": {"bf16": 275e12, "f32": 275e12 / 4},
}


def _flops_cost(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0)) if ca else 0.0


def _mlp_fwd_flops_per_sample(params) -> float:
    """2 * sum(in*out) over every Dense kernel in the actor-critic."""
    import jax
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = jax.tree_util.keystr(path)
        if "kernel" in name and leaf.ndim == 2:
            total += 2.0 * leaf.shape[0] * leaf.shape[1]
    return total


def _time(fn, *args, repeats=5, **kw):
    import jax
    out = fn(*args, **kw)   # warmup/compile
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times), out


def main(argv):
    overrides = [a for a in argv if "=" in a and not a.startswith("--")]
    args = [a for a in argv if not a.startswith("--") and "=" not in a]
    num_envs = int(args[0]) if args else 4096
    task = args[1] if len(args) > 1 else "HumanoidPingpongTiltNoEarlyStopG1"
    trace_dir = None
    if "--trace" in argv:
        i = argv.index("--trace")
        trace_dir = (argv[i + 1] if i + 1 < len(argv) and not argv[i + 1].isdigit()
                     else "/tmp/isaacgym_tpu_trace")

    import jax
    if "--cpu" in argv:  # the axon plugin overrides JAX_PLATFORMS; force here
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/isaacgym_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from isaacgym_tpu.utils.config import compose
    from isaacgym_tpu.tasks import task_registry
    from isaacgym_tpu.rl.ppo import PPOConfig, PPOTrainer

    cfg = compose(task, [f"num_envs={num_envs}"] + overrides)
    env = task_registry()[task](cfg["task"], seed=0)
    pcfg = PPOConfig.from_train_cfg(cfg.get("train", {}))
    trainer = PPOTrainer(env, pcfg, seed=0)
    ts = trainer.init_state()
    env_state, obs = env.reset()

    B, H = env.num_envs, pcfg.horizon_length
    T = B * H
    mb = min(pcfg.minibatch_size, T)
    num_mb = T // mb

    rollout_jit = jax.jit(trainer._rollout_and_gae)
    update_jit = jax.jit(trainer._update)

    # --- phase timings (jitted separately; same code the epoch composes) ---
    t_roll, roll_out = _time(rollout_jit, ts, env_state, obs)
    _env_state, _last_obs, rng, batch, obs_stats, _vs, _m = roll_out
    t_upd, _ = _time(update_jit, ts, batch, obs_stats, rng)

    # XLA's own FLOP count of the compiled executables (before any donation
    # invalidates the buffers)
    xla_roll = _flops_cost(rollout_jit.lower(ts, env_state, obs).compile())
    xla_upd = _flops_cost(update_jit.lower(ts, batch, obs_stats, rng).compile())

    # train_epoch donates (ts, env_state): chain outputs through the repeats
    ts2, es2, obs2, _m = trainer.train_epoch(ts, env_state, obs)  # compile
    jax.block_until_ready(ts2)
    epoch_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        ts2, es2, obs2, _m = trainer.train_epoch(ts2, es2, obs2)
        jax.block_until_ready(ts2)
        epoch_times.append(time.perf_counter() - t0)
    t_epoch = min(epoch_times)

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            ts2, es2, obs2, _m = trainer.train_epoch(ts2, es2, obs2)
            jax.block_until_ready(ts2)

    # --- FLOP accounting ---------------------------------------------------
    fwd = _mlp_fwd_flops_per_sample(ts.params)       # both trunks + heads
    flops_rollout = T * fwd                          # inference each step
    flops_update = pcfg.mini_epochs * num_mb * mb * 3.0 * fwd  # fwd+bwd=3x
    dev = jax.devices()[0]
    peak = None
    # most-specific kind first ("TPU v5 lite" also contains "TPU v5")
    for k in sorted(_PEAKS, key=len, reverse=True):
        if k in dev.device_kind:
            peak = _PEAKS[k]["bf16"]
            break
    report = {
        "task": task, "num_envs": B, "horizon": H, "samples_per_epoch": T,
        "minibatch": mb, "num_minibatches": num_mb, "mini_epochs": pcfg.mini_epochs,
        "device": dev.device_kind,
        "t_rollout_s": round(t_roll, 4), "t_update_s": round(t_upd, 4),
        "t_epoch_s": round(t_epoch, 4),
        "update_frac_of_epoch": round(t_upd / t_epoch, 3),
        "env_steps_per_s": round(T / t_epoch, 1),
        "net_fwd_flops_per_sample": fwd,
        "flops_analytic_rollout": flops_rollout,
        "flops_analytic_update": flops_update,
        "flops_xla_rollout": xla_roll, "flops_xla_update": xla_upd,
        "tflops_per_s_update_analytic": round(flops_update / t_upd / 1e12, 2),
        "tflops_per_s_update_xla": round(xla_upd / t_upd / 1e12, 2),
        "tflops_per_s_epoch_xla": round((xla_roll + xla_upd) / t_epoch / 1e12, 2),
    }
    if peak:
        report["peak_bf16_tflops"] = peak / 1e12
        report["mfu_update_analytic"] = round(flops_update / t_upd / peak, 4)
        report["mfu_update_xla"] = round(xla_upd / t_upd / peak, 4)
        report["mfu_epoch_xla"] = round((xla_roll + xla_upd) / t_epoch / peak, 4)
    if trace_dir:
        report["trace_dir"] = trace_dir
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
