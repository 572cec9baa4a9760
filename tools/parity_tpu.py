"""Fused-Pallas vs pure-XLA single-step parity on the real chip.

The CPU test suite checks kernel parity in Pallas interpret mode, which is
too slow to compile for the big scenes (nv=33 C10, 26-DOF C11); this tool
runs the SAME check compiled on the TPU, where both paths are fast:

1. roll the fused env for `steps` steps with seeded random actions, saving
   the env state every `stride` steps (a spread of contact-rich states);
2. from each saved state, take ONE step under the fused path and under the
   pure-XLA path (``ISAACGYM_TPU_PALLAS=0``) with the same action;
3. report max/mean absolute deviation of dof_pos / dof_vel / root states /
   obs / reward.

Single-step comparison isolates kernel accuracy from chaotic trajectory
divergence (contact dynamics amplify f32 reassociation noise exponentially
over a rollout; one step bounds it).

Usage:
  python tools/parity_tpu.py [task] [num_envs] [steps] [stride] [seed]
Defaults: HumanoidPingpongTiltNESSparse27DOFG1 256 160 10 0
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    task = argv[0] if argv else "HumanoidPingpongTiltNESSparse27DOFG1"
    num_envs = int(argv[1]) if len(argv) > 1 else 256
    steps = int(argv[2]) if len(argv) > 2 else 160
    stride = int(argv[3]) if len(argv) > 3 else 10
    seed = int(argv[4]) if len(argv) > 4 else 0

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ISAACGYM_TPU_CACHE", "/tmp/isaacgym_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np
    import isaacgym_tpu

    os.environ["ISAACGYM_TPU_PALLAS"] = "1"
    env_fused = isaacgym_tpu.make(seed=seed, task=task, num_envs=num_envs)
    os.environ["ISAACGYM_TPU_PALLAS"] = "0"
    env_xla = isaacgym_tpu.make(seed=seed, task=task, num_envs=num_envs)
    fused_on = any(getattr(env_fused.sim, a, None) is not None
                   for a in ("_fused", "_fused_multi", "_fused_floating", "_fused_dr"))
    xla_clean = all(getattr(env_xla.sim, a, None) is None
                    for a in ("_fused", "_fused_multi", "_fused_floating", "_fused_dr"))
    print(f"task={task} envs={num_envs} fused engaged: {fused_on}, "
          f"xla reference clean: {xla_clean}")

    state, _obs = env_fused.reset()
    key = jax.random.PRNGKey(seed)
    act_dim = env_fused.num_actions

    @jax.jit
    def roll_and_sample(state, key):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (num_envs, act_dim), minval=-1.0, maxval=1.0)
            s2, _o, _r, _d, _i = env_fused.step_fn(s, a)
            return (s2, k), (s, a)
        (_fs, _fk), (saved, acts) = jax.lax.scan(body, (state, key), None, length=steps)
        return saved, acts

    saved, acts = roll_and_sample(state, key)
    idx = jnp.arange(0, steps, stride)
    saved = jax.tree.map(lambda x: x[idx], saved)
    acts = acts[idx]
    n_samples = int(idx.shape[0])

    step_fused = jax.jit(env_fused.step_fn)
    step_xla = jax.jit(env_xla.step_fn)

    def d(a, b, keep):
        """Max abs diff over envs where BOTH paths agree on reset: a done
        flag flipping at an f32-noise margin teleports that env in one path
        only — an amplification of kernel noise through the reset
        discontinuity, not kernel error. Flipped envs are counted
        separately (reset_flips)."""
        diff = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
        keep = keep.reshape(keep.shape + (1,) * (diff.ndim - 1))
        return float(jnp.max(jnp.where(keep, diff, 0.0)))

    def per_env_max(a, b, keep):
        diff = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
        diff = diff.reshape(diff.shape[0], -1).max(axis=1)
        return jnp.where(keep, diff, 0.0)

    # plain loop over the S samples (each call is the full B-env batch);
    # vmap over the pallas_call grid is deliberately avoided
    diffs = {k: [] for k in ("dof_pos", "dof_vel", "root", "ncf", "obs", "reward")}
    reset_flips = 0
    contact_flips = 0       # envs where a contact/event branch flipped at an
    clean_root_max = 0.0    # f32 margin (one-step root delta > 0.1): discrete
    for i in range(n_samples):  # amplification, reported separately
        s = jax.tree.map(lambda x: x[i], saved)
        a = acts[i]
        sf, of, rf, df_, _if = step_fused(s, a)
        sx, ox, rx, dx_, _ix = step_xla(s, a)
        keep = df_.astype(bool) == dx_.astype(bool)
        reset_flips += int(jnp.sum(~keep))
        env_root = per_env_max(sf.sim.root, sx.sim.root, keep)
        flipped = env_root > 0.1
        contact_flips += int(jnp.sum(flipped))
        clean_root_max = max(clean_root_max,
                             float(jnp.max(jnp.where(flipped, 0.0, env_root))))
        diffs["dof_pos"].append(d(sf.sim.dof_pos, sx.sim.dof_pos, keep))
        diffs["dof_vel"].append(d(sf.sim.dof_vel, sx.sim.dof_vel, keep))
        diffs["root"].append(d(sf.sim.root, sx.sim.root, keep))
        diffs["ncf"].append(d(sf.sim.net_contact_force, sx.sim.net_contact_force, keep))
        diffs["obs"].append(d(of, ox, keep))
        diffs["reward"].append(d(rf, rx, keep))
    diffs = {k: np.asarray(v) for k, v in diffs.items()}
    # velocity-scale context for judging dof_vel deviations
    vel_scale = float(np.max(np.abs(np.asarray(saved.sim.dof_vel))))
    out = {"task": task, "num_envs": num_envs, "samples": n_samples,
           "dof_vel_scale": round(vel_scale, 3),
           "reset_flips": reset_flips,
           "contact_flips": contact_flips,
           "max_root_no_flip": clean_root_max,
           "env_steps_compared": n_samples * num_envs}
    for k, v in diffs.items():
        out[f"max_{k}"] = float(np.max(v))
        out[f"mean_{k}"] = float(np.mean(v))
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
