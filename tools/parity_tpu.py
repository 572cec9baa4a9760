"""Fused-Pallas vs pure-XLA single-step parity on the real chip — as a GATE.

The CPU test suite checks kernel parity in Pallas interpret mode, which is
too slow to compile for the big scenes (nv=33 C10, 26-DOF C11); this tool
runs the SAME check compiled on the TPU, where both paths are fast:

1. roll the fused env for `steps` steps with seeded random actions, saving
   the env state every `stride` steps (a spread of contact-rich states);
2. from each saved state, take ONE step under the fused path and under the
   pure-XLA path (``ISAACGYM_TPU_PALLAS=0``) with the same action;
3. report max/mean absolute deviation of dof_pos / dof_vel / root states /
   ncf / obs / reward — each BOTH raw and with flip-amplified envs excluded —
   and PASS/FAIL the no-flip deviations against per-task thresholds.

Single-step comparison isolates kernel accuracy from chaotic trajectory
divergence (contact dynamics amplify f32 reassociation noise exponentially
over a rollout; one step bounds it). Two amplification channels are counted
and excluded from the gated metrics, because both turn last-ulp noise into
O(1) state deltas through a discrete branch, which no finite tolerance on
the continuous fields could distinguish from real kernel error:

- reset_flips: the done flag differs, so one path teleports the env;
- contact_flips: a contact/event activation predicate flipped at an f32
  margin (detected as a one-step root delta > 0.1 in a non-reset env).

The flip RATES themselves are part of the gate (``max_flip_rate``): a kernel
bug that systematically changes activation would blow the rate far past the
f32-margin baseline measured per task.

Usage:
  python tools/parity_tpu.py [task] [num_envs] [steps] [stride] [seed]
      [--out runs/parity.jsonl] [--all]
Defaults: HumanoidPingpongTiltNESSparse27DOFG1 256 160 10 0
``--all`` runs the whole gated-task table and exits nonzero on any failure.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Per-task parity gates for the no-flip single-step deviations. Scale
# context: dof_vel is O(30) rad/s (C10 O(100) — random-action ragdolls),
# root mixes meters and m/s, obs are normalized O(1), reward O(100).
# Bounds = the round-4 measurement (docs/runs/parity_r4.jsonl) x ~3 margin.
# Context for the magnitudes (docs/PARITY.md "kernel parity" note): the
# round-4 kernels step CCD sweeps in the geom's local frame and constant-
# fold quaternion algebra, so their f32 rounding differs from the XLA
# path's world-frame math; at a contact margin that can select a different
# swept sample (different entry normal) WITHOUT flipping the done flag or
# the 0.1-root cutoff — bounded "soft flip" deviations, not kernel error.
# The gate exists to catch REGRESSIONS from this characterized baseline.
GATES = {
    "HumanoidPingpongTiltNoEarlyStopG1": dict(
        max_dof_pos=0.01, max_dof_vel=1.5, max_root=0.2, max_ncf=10.0,
        max_obs=0.2, max_reward=40.0, max_flip_rate=0.002),
    "HumanoidPingpongTiltG1": dict(
        max_dof_pos=0.01, max_dof_vel=1.5, max_root=0.25, max_ncf=20.0,
        max_obs=0.25, max_reward=10.0, max_flip_rate=0.005),
    "Humanoid12PingpongTiltG1": dict(
        max_dof_pos=0.01, max_dof_vel=1.5, max_root=0.2, max_ncf=20.0,
        max_obs=0.2, max_reward=10.0, max_flip_rate=0.005),
    # C10 random-action ragdolls hold ~20 RESTING contacts per step, each
    # sitting at the activation margin (dist ~ -5 mm, vn ~ 0) — the flip
    # rate is per-env-step over ~20 marginal contacts, hence ~0.13 (round 5:
    # the 2 mm resting smoothing band cut the dist-margin channel,
    # 12.8 % -> 12.0 %; the remaining channels are the vn<0.1 velocity
    # margin and CCD swept-sample selection).
    # max_obs context: C10's obs carries the reference-VERBATIM unclamped
    # y-intercept lane  y + vy/(-vx + 1e-6) * x  (:1833-1838) — near
    # lv_x ~ 0 it amplifies last-ulp velocity noise unboundedly, so the obs
    # deviation is not a kernel-accuracy signal for this task; the
    # continuous state fields (dof/root/ncf/reward) stay tightly gated
    # (r5 measurement: dof_pos 0.006, dof_vel 4.6, root 0.0998, ncf 143,
    # reward 0.87).
    "HumanoidPingpongTiltNESSparse27DOFG1": dict(
        max_dof_pos=0.05, max_dof_vel=20.0, max_root=0.3, max_ncf=1.5e5,
        max_obs=1500.0, max_reward=5.0, max_flip_rate=0.25),
    "HumanoidPingpong5ActorG1": dict(
        max_dof_pos=0.4, max_dof_vel=60.0, max_root=0.25, max_ncf=1.2e4,
        max_obs=7.0, max_reward=0.1, max_flip_rate=0.02),
}
GATED_FIELDS = ("dof_pos", "dof_vel", "root", "ncf", "obs", "reward")
DEFAULT_SIZES = {  # envs per gated task (reference numEnvs class, CCD-heavy)
    "HumanoidPingpongTiltNoEarlyStopG1": 1024,
    "HumanoidPingpongTiltG1": 1024,
    "Humanoid12PingpongTiltG1": 512,
    "HumanoidPingpongTiltNESSparse27DOFG1": 256,
    "HumanoidPingpong5ActorG1": 256,
}


def run_task(task, num_envs, steps, stride, seed):
    import jax
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
        """Max abs diff over envs in the ``keep`` mask."""
        diff = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
        keep = keep.reshape(keep.shape + (1,) * (diff.ndim - 1))
        return float(jnp.max(jnp.where(keep, diff, 0.0)))

    def per_env_max(a, b, keep):
        diff = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
        diff = diff.reshape(diff.shape[0], -1).max(axis=1)
        return jnp.where(keep, diff, 0.0)

    # plain loop over the S samples (each call is the full B-env batch);
    # vmap over the pallas_call grid is deliberately avoided
    raw = {k: [] for k in GATED_FIELDS}       # reset-flip-excluded (legacy)
    noflip = {k: [] for k in GATED_FIELDS}    # contact-flip-excluded (gated)
    reset_flips = 0
    contact_flips = 0
    for i in range(n_samples):
        s = jax.tree.map(lambda x: x[i], saved)
        a = acts[i]
        sf, of, rf, df_, _if = step_fused(s, a)
        sx, ox, rx, dx_, _ix = step_xla(s, a)
        keep = df_.astype(bool) == dx_.astype(bool)
        reset_flips += int(jnp.sum(~keep))
        env_root = per_env_max(sf.sim.root, sx.sim.root, keep)
        flipped = env_root > 0.1
        contact_flips += int(jnp.sum(flipped))
        clean = keep & ~flipped
        pairs = dict(dof_pos=(sf.sim.dof_pos, sx.sim.dof_pos),
                     dof_vel=(sf.sim.dof_vel, sx.sim.dof_vel),
                     root=(sf.sim.root, sx.sim.root),
                     ncf=(sf.sim.net_contact_force, sx.sim.net_contact_force),
                     obs=(of, ox), reward=(rf, rx))
        for k, (va, vb) in pairs.items():
            raw[k].append(d(va, vb, keep))
            noflip[k].append(d(va, vb, clean))

    import numpy as np
    vel_scale = float(np.max(np.abs(np.asarray(saved.sim.dof_vel))))
    compared = n_samples * num_envs
    flip_rate = contact_flips / max(compared, 1)
    out = {"task": task, "num_envs": num_envs, "samples": n_samples,
           "dof_vel_scale": round(vel_scale, 3),
           "reset_flips": reset_flips,
           "contact_flips": contact_flips,
           "flip_rate": round(flip_rate, 5),
           "env_steps_compared": compared}
    for k in GATED_FIELDS:
        out[f"max_{k}"] = float(np.max(raw[k]))
        out[f"max_{k}_no_flip"] = float(np.max(noflip[k]))
        out[f"mean_{k}"] = float(np.mean(raw[k]))

    gate = GATES.get(task)
    if gate is not None:
        failures = []
        for k in GATED_FIELDS:
            if out[f"max_{k}_no_flip"] > gate[f"max_{k}"]:
                failures.append(f"{k}: {out[f'max_{k}_no_flip']:.3e} "
                                f"> {gate[f'max_{k}']:.3e}")
        if flip_rate > gate["max_flip_rate"]:
            failures.append(f"flip_rate: {flip_rate:.4f} > {gate['max_flip_rate']}")
        out["gate"] = "PASS" if not failures else "FAIL"
        out["gate_failures"] = failures
    print(json.dumps(out))
    return out


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i:i + 2]
    run_all = "--all" in argv
    if run_all:
        argv.remove("--all")

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ISAACGYM_TPU_CACHE", "/tmp/isaacgym_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    steps = int(argv[2]) if len(argv) > 2 else 160
    stride = int(argv[3]) if len(argv) > 3 else 10
    seed = int(argv[4]) if len(argv) > 4 else 0

    results = []
    if run_all:
        for task, envs in DEFAULT_SIZES.items():
            results.append(run_task(task, envs, steps, stride, seed))
    else:
        task = argv[0] if argv else "HumanoidPingpongTiltNESSparse27DOFG1"
        num_envs = int(argv[1]) if len(argv) > 1 else DEFAULT_SIZES.get(task, 256)
        results.append(run_task(task, num_envs, steps, stride, seed))

    if out_path:
        with open(out_path, "a") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")
    failed = [r["task"] for r in results if r.get("gate") == "FAIL"]
    if failed:
        print(f"PARITY GATE FAILED: {failed}", file=sys.stderr)
        sys.exit(1)
    return results


if __name__ == "__main__":
    main()
